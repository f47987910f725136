package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines, each designed as a
  * shuffle-conscious Spark plan:
  *
  *  - exact / normalized: one hash-groupBy (the 100 TB shape — group on a
  *    16-byte digest, never on the text itself);
  *  - MinHash + LSH: explode→min aggregation for signatures, banding join
  *    for candidates — quadratic blowup confined to same-band buckets;
  *  - SimHash: one agg per doc (64 conditional sums), near-dup pairs via
  *    4x16-bit band join + bit_count hamming verify;
  *  - n-gram Jaccard: inverted-index self-join (exact, for verification /
  *    small candidate sets).
  */
object Dedup {

  /** Exact duplicates by content digest: emit (kept_id, dup_id) pairs —
    * min id per digest group is kept, the rest are the dup set.
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String,
      normalize: Boolean = false): DataFrame = {
    val key = if (normalize) TextAnalysis.fingerprint(col(textCol))
      else md5(col(textCol))
    val w = Window.partitionBy(col("__digest"))
    df.select(col(idCol), key.as("__digest"))
      .withColumn("kept_id", min(col(idCol)).over(w))
      .where(col(idCol) =!= col("kept_id"))
      .select(col("kept_id"), col(idCol).as("dup_id"), col("__digest").as("digest"))
  }

  /** MinHash signatures: `numHashes` permutations approximated by seeded
    * xxhash64 re-hashes of the shingle hash. ONE explode + ONE groupBy with
    * numHashes `min` aggregates (map-side combined, skew-free: signature
    * state is O(numHashes) per doc regardless of doc length).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64): DataFrame = {
    val shingles = df.select(col(idCol),
      explode(TextAnalysis.shingleHashes(col(textCol), shingleK)).as("sh"))
    val aggs = (0 until numHashes).map(s =>
      min(xxhash64(col("sh"), lit(s))).as(s"mh_$s"))
    shingles.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(s => col(s"mh_$s")): _*)
        .as("signature"))
  }

  /** LSH banding over minhash signatures → candidate pairs with estimated
    * Jaccard (= fraction of agreeing signature positions). `bands` ×
    * `rowsPerBand` must equal the signature length. Same-band-equal docs
    * join within hash buckets only; dedupe of pairs found in several bands
    * via distinct on (a, b).
    */
  def minhashLshCandidates(signatures: DataFrame, idCol: String,
      bands: Int, estJaccardMin: Double = 0.5): DataFrame = {
    val banded = signatures.select(col(idCol).as("a_id"), col("signature"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_",
          slice(col("signature"), b * (size(col("signature")) / bands) + 1,
            size(col("signature")) / bands))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val l = banded.select(col("a_id"), col("band"), col("band_hash"),
      col("signature").as("sig_a"))
    val r = banded.select(col("a_id").as("b_id"), col("band"), col("band_hash"),
      col("signature").as("sig_b"))
    val matches = aggregate(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
    l.join(r, Seq("band", "band_hash"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (matches.cast("double") / size(col("sig_a"))).as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= estJaccardMin)
  }

  /** SimHash (64-bit) per document: per-bit weighted majority of token
    * hashes. One explode + one agg of 64 conditional sums; the packed
    * signature is assembled from the sums in a final projection.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val sums = (0 until 64).map(b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1))
        .as(s"b_$b"))
    val agged = toks.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val packed = (0 until 64).map(b =>
      when(col(s"b_$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ bitwiseOR _)
    agged.select(col(idCol), packed.as("simhash"))
  }

  /** SimHash near-dup pairs: candidates share one of four 16-bit chunks
    * (any pair within hamming distance 3 must agree on ≥1 chunk), verified
    * with bit_count(xor) <= maxHamming.
    */
  def simhashNearDups(sims: DataFrame, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val chunked = sims.select(col(idCol).as("a_id"), col("simhash").as("sim_a"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val r = chunked.select(col("a_id").as("b_id"), col("sim_a").as("sim_b"),
      col("chunk"), col("chunk_val"))
    chunked.join(r, Seq("chunk", "chunk_val"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard over candidate generation by inverted index:
    * docs sharing ≥1 shingle are candidates; Jaccard from intersection
    * counts vs distinct-shingle sizes. Exact but quadratic within hot
    * shingles — cap fan-out with `maxDocsPerShingle` (drop
    * stop-shingles, standard practice).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.7,
      maxDocsPerShingle: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol),
      explode(array_distinct(TextAnalysis.shingleHashes(col(textCol), shingleK)))
        .as("sh"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val filtered = sh.withColumn("docs_with",
        count(lit(1)).over(Window.partitionBy(col("sh"))))
      .where(col("docs_with") <= maxDocsPerShingle)
    val l = filtered.select(col(idCol).as("a_id"), col("sh"))
    val r = filtered.select(col(idCol).as("b_id"), col("sh"))
    l.join(r, Seq("sh")).where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("a_id"), col("sz").as("sz_a")), Seq("a_id"))
      .join(sizes.select(col(idCol).as("b_id"), col("sz").as("sz_b")), Seq("b_id"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }
}
