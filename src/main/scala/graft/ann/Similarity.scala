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

  /** Deterministic pseudo-random hyperplane component in [-1, 1]: a pure
    * function of (table, plane, dim) derived from md5, computed ONCE at
    * plan time and embedded as a literal — zero per-row hashing, and any
    * engine (including the DuckDB oracle) regenerates the identical
    * matrix from the same md5 recipe. The table index is part of the hash
    * input so each hash table draws an INDEPENDENT set of hyperplanes;
    * without it, table t's plane set would overlap table t-1's and extra
    * tables would add zero recall while multiplying the explode/join cost.
    */
  def planeComponent(table: Int, plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane_${table}_${plane}_$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2000001L - 1000000L) /
      1000000.0
  }

  /** Sign-random-projection bucket id from `planes` hyperplanes of hash
    * table `table`, for vectors of width `dims` (single-table convenience
    * form of [[HyperplaneBuckets]]; identical projection arithmetic —
    * left-to-right adds — so the external SQL twin reproduces it).
    */
  def lshBuckets(vec: Column, planes: Int, table: Int, dims: Int): Column =
    HyperplaneBuckets(vec, planes, table + 1, dims).getItem(table)

  /** Bucket ids for one vector across `tables` independent hash tables
    * (array position = table index), ready to posexplode. ONE codegen'd
    * loop nest ([[HyperplaneBuckets]]) — a literal-coefficient expression
    * tree at tables×planes×dims terms took Janino minutes to compile.
    */
  private def tableBuckets(vec: Column, planes: Int, tables: Int,
      dims: Int): Column =
    HyperplaneBuckets(vec, planes, tables, dims)

  /** ANN top-k: join query and corpus on LSH bucket, rank by cosine within
    * candidates. Recall grows with fewer planes (bigger buckets) or by
    * probing `tables` independent hash tables.
    *
    * Scale shape: the band join and the candidate-dedup shuffle carry IDs
    * only — embedding payloads never ride the ×tables-replicated explode
    * or key a shuffle. Vectors are joined back exactly once per surviving
    * (query, candidate) pair: the query side by broadcast (query sets are
    * small by contract), the corpus side by one equi-join on the id.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
      qVec: String, cVec: String, k: Int, planes: Int = 12,
      tables: Int = 4, dims: Int = 64): DataFrame = {
    val qb = queries.select(col(qId),
      posexplode(tableBuckets(col(qVec), planes, tables, dims)))
      .select(col(qId), col("pos").as("t"), col("col").as("b"))
    val cb = corpus.select(col(cId),
      posexplode(tableBuckets(col(cVec), planes, tables, dims)))
      .select(col(cId), col("pos").as("t"), col("col").as("b"))
    val pairs = qb.join(cb, Seq("t", "b"))
      .where(col(qId) =!= col(cId))
      .select(col(qId), col(cId))
      .distinct()
    val cand = pairs
      .join(broadcast(queries.select(col(qId), col(qVec))), Seq(qId))
      .join(corpus.select(col(cId), col(cVec)), Seq(cId))
      .withColumn("cos", cosine(col(qVec), col(cVec)))
      .where(col("cos").isNotNull)
    val w = Window.partitionBy(col(qId)).orderBy(desc("cos"), col(cId))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId).as("neighbor_id"), col("cos"), col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold among LSH-bucket
    * candidates (the embedding-space analog of minhash dedup).
    *
    * Same payload discipline as [[annTopK]]: the ×tables explode, band
    * join, and pair dedup are id-only; vectors rejoin once per surviving
    * pair via two equi-joins on the id (shuffle keys are scalar ids, never
    * float arrays).
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 10, tables: Int = 4,
      dims: Int = 64): DataFrame = {
    val b = df.select(col(idCol),
      posexplode(tableBuckets(col(vecCol), planes, tables, dims)))
      .select(col(idCol), col("pos").as("t"), col("col").as("b"))
    val l = b.select(col(idCol).as("a_id"), col("t"), col("b"))
    val r = b.select(col(idCol).as("b_id"), col("t"), col("b"))
    val pairs = l.join(r, Seq("t", "b")).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    pairs
      .join(df.select(col(idCol).as("a_id"), col(vecCol).as("va")), Seq("a_id"))
      .join(df.select(col(idCol).as("b_id"), col(vecCol).as("vb")), Seq("b_id"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }
}
