package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  *  - [[cosine]]: pure zip_with/aggregate expression (codegen'd, no UDF);
  *  - [[bruteForceTopK]]: broadcast the (small) query set against the full
  *    corpus — the exact baseline; one scan of the corpus, no shuffle of
  *    the corpus side;
  *  - [[lshBuckets]] / [[annTopK]]: random-hyperplane LSH (hyperplane
  *    components are deterministic hash functions — no RNG state, any
  *    executor regenerates them identically), bucket-equi-join → the
  *    scale path: candidates confined to matching buckets.
  */
object Similarity {

  /** Dot product of two double arrays (composable HOF form). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either side has zero norm. Uses the
    * single-pass codegen'd [[CosineSimilarity]] expression (the zip_with/
    * aggregate chain is interpreted per element — 3 passes with boxing).
    */
  def cosine(a: Column, b: Column): Column = CosineSimilarity(a, b)

  /** Composable-functions variant (kept as the no-custom-expression
    * fallback and as the differential oracle for the custom expression).
    */
  def cosineComposable(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val d = dot(ad, bd) / (norm(ad) * norm(bd))
    when(norm(ad) > 0 && norm(bd) > 0, d)
  }

  /** Exact top-k cosine neighbors for each query vector. Queries are
    * broadcast (must be small — e.g. the dedup probe set); corpus streams
    * through one projection + per-query top-k (TakeOrderedAndProject
    * shape via window row_number).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, qVec: String, cVec: String, k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .where(col(qId) =!= col(cId))
      .withColumn("cos", cosine(col(qVec), col(cVec)))
      .where(col("cos").isNotNull)
    val w = Window.partitionBy(col(qId)).orderBy(desc("cos"), col(cId))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId).as("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * a pure function of (plane, dim) — regenerated identically anywhere.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit("plane"), lit(plane), dim), lit(2000001L)).cast("double")
      - 1000000.0) / 1000000.0

  /** Sign-random-projection bucket id from `planes` hyperplanes. */
  def lshBuckets(vec: Column, planes: Int): Column = {
    val vd = transform(vec, x => x.cast("double"))
    (0 until planes).map { p =>
      val proj = aggregate(zip_with(vd,
        sequence(lit(0), size(vd) - 1),
        (x, i) => x * planeComponent(p, i)), lit(0.0), _ + _)
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ bitwiseOR _)
  }

  /** ANN top-k: join query and corpus on LSH bucket, rank by cosine within
    * candidates. Recall grows with fewer planes (bigger buckets) or by
    * probing `tables` independent hash tables (plane sets offset by
    * table index).
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
      qVec: String, cVec: String, k: Int, planes: Int = 12,
      tables: Int = 4): DataFrame = {
    val qb = queries.select(col(qId), col(qVec),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          lshBuckets(col(qVec), planes + t).as("b"))): _*)).as("tb"))
      .select(col(qId), col(qVec), col("tb.t").as("t"), col("tb.b").as("b"))
    val cb = corpus.select(col(cId), col(cVec),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          lshBuckets(col(cVec), planes + t).as("b"))): _*)).as("tb"))
      .select(col(cId), col(cVec), col("tb.t").as("t"), col("tb.b").as("b"))
    val cand = qb.join(cb, Seq("t", "b"))
      .where(col(qId) =!= col(cId))
      .select(col(qId), col(cId), col(qVec), col(cVec))
      .distinct()
      .withColumn("cos", cosine(col(qVec), col(cVec)))
      .where(col("cos").isNotNull)
    val w = Window.partitionBy(col(qId)).orderBy(desc("cos"), col(cId))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId).as("neighbor_id"), col("cos"), col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold among LSH-bucket
    * candidates (the embedding-space analog of minhash dedup).
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 10, tables: Int = 4): DataFrame = {
    val b = df.select(col(idCol), col(vecCol),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          lshBuckets(col(vecCol), planes + t).as("b"))): _*)).as("tb"))
      .select(col(idCol), col(vecCol), col("tb.t").as("t"), col("tb.b").as("b"))
    val l = b.select(col(idCol).as("a_id"), col(vecCol).as("va"), col("t"), col("b"))
    val r = b.select(col(idCol).as("b_id"), col(vecCol).as("vb"), col("t"), col("b"))
    l.join(r, Seq("t", "b")).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("va"), col("vb")).distinct()
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }
}
