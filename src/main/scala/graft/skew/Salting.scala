package graft.skew

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for mega-conversations (heavy-tail turn counts).
  *
  * The reference loops per monitor point in the driver
  * (src/geological_anomaly_detector.py:241-259) — a mega-point dominates
  * wall-clock. In Spark the equivalent failure is one reducer owning the
  * mega-conversation's turns. Mergeable aggregation states (counters,
  * min/max, sketches) make salting safe: aggregate on (conv_id, salt)
  * first (stage 1, spreads a hot key over `salts` reducers), then merge
  * the partials per conv_id (stage 2, tiny input).
  */
object Salting {

  def saltCol(orderCol: String, salts: Int): Column =
    pmod(xxhash64(col(orderCol)), lit(salts)).as("_salt")

  /** Spread rows of hot keys across `salts`×keys reducers. */
  def saltedRepartition(df: DataFrame, keyCol: String, orderCol: String,
      salts: Int, numPartitions: Int): DataFrame =
    df.withColumn("_salt", saltCol(orderCol, salts))
      .repartition(numPartitions, col(keyCol), col("_salt"))

  /** Two-stage salted count/sum per key: partial on (key, salt), final on
    * key. Both stages are hash aggregations with map-side combine; no
    * single reducer ever sees a whole mega-conversation.
    */
  def saltedCounts(df: DataFrame, keyCol: String, orderCol: String,
      salts: Int): DataFrame =
    df.withColumn("_salt", saltCol(orderCol, salts))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial_n"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial_n")).as("n"))

  /** Heavy-key census (A1): conversations whose turn count exceeds
    * `factor` × mean — the mega-thread detection heuristic that decides
    * whether drift kernels need the salted path.
    */
  def megaKeys(df: DataFrame, keyCol: String, factor: Double = 10.0): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val meanN = counts.agg(avg(col("n")).as("mean_n"))
    counts.crossJoin(broadcast(meanN))
      .where(col("n") > col("mean_n") * factor)
      .select(col(keyCol), col("n"), col("mean_n"))
  }
}
