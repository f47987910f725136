package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-RUN metric history + anomaly detection — the longitudinal axis the
  * per-run suite can't see. A single validation answers "is this snapshot
  * healthy?"; the history answers "is this snapshot healthy FOR THIS
  * PIPELINE?" — a violation count that doubles run-over-run can pass every
  * static bound and still be the first sign of an upstream break (the
  * reference keeps per-region history for exactly this reason,
  * `src/main_analysis.py` persists per-run summaries it re-reads).
  *
  * Storage is an append-only parquet directory of per-run metric rows
  * (run_id, run_ts, constraint, metric, value) — tiny (runs × constraints ×
  * 4), so every read is a broadcast-class frame; the append is one job over
  * a frame that is already driver-small. The anomaly checks are expressed
  * as keyed windows anyway (partitioned by (constraint, metric)), so they
  * hold up even if someone points them at a million-run history.
  */
object MetricHistory {

  /** Global per-constraint metrics from a verdicts frame: total rows,
    * total violations, the violation rate, and how many partition verdicts
    * failed. Long format, ready to append.
    *
    * A family emitting per-key rows AND a '(global)' total row under ONE
    * name (MaxKeyShare: hot-key rows plus the census total) contributes
    * its global row's counts, not the sum of both — summing them mixes
    * units (census rows + per-key rows) and a hot key merely GROWING
    * would fire a rate-of-change anomaly with no qualitative change.
    * failed_partitions still counts every failing verdict row (per-key
    * FAIL rows are exactly the partition-level signal that metric
    * tracks).
    */
  def fromVerdicts(verdicts: DataFrame): DataFrame = {
    val isGlobal = col("partition_key") === "(global)"
    val hasGlobal = max(when(isGlobal, 1).otherwise(0)) === 1
    val g = verdicts.groupBy(col("constraint")).agg(
      coalesce(when(hasGlobal, sum(when(isGlobal, col("rows")))),
        sum(col("rows"))).cast("double").as("rows"),
      coalesce(when(hasGlobal, sum(when(isGlobal, col("violations")))),
        sum(col("violations"))).cast("double").as("violations"),
      sum(when(!col("pass"), 1).otherwise(0)).cast("double")
        .as("failed_partitions"))
      .withColumn("violation_rate",
        when(col("rows") > 0, col("violations") / col("rows"))
          .otherwise(lit(0.0)))
    g.select(col("constraint"), explode(map(
      lit("rows"), col("rows"),
      lit("violations"), col("violations"),
      lit("failed_partitions"), col("failed_partitions"),
      lit("violation_rate"), col("violation_rate")
    )).as(Seq("metric", "value")))
  }

  /** Append one run's metrics (any frame with (constraint, metric, value))
    * under a run id + timestamp.
    */
  def append(dir: String, runId: String, runTs: java.sql.Timestamp,
      metrics: DataFrame): Unit =
    metrics.select(
      lit(runId).as("run_id"), lit(runTs).as("run_ts"),
      col("constraint"), col("metric"), col("value").cast("double"))
      .write.mode("append").parquet(dir)

  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Rate-of-change anomalies: per (constraint, metric) series ordered by
    * (run_ts, run_id), flag runs where |v − prev| > maxRel·|prev| — or
    * where prev was exactly 0 and v isn't (an infinite relative jump).
    * The first run of a series has no baseline and never flags. Null/NaN
    * guards mirror Windows.rollingZ (Spark treats NaN > t as true).
    * Returns the flagged rows with value, prev, and rel_change observed.
    */
  def rateOfChange(history: DataFrame, maxRel: Double): DataFrame = {
    val w = Window.partitionBy("constraint", "metric")
      .orderBy(col("run_ts"), col("run_id"))
    val prev = col("prev")
    // window columns materialize first — a window expression can't sit in
    // a WHERE clause
    val flagged = when(prev.isNull || isnan(prev) || isnan(col("value")),
      lit(false))
      .when(abs(prev) > 0,
        coalesce(!isnan(col("rel_change")) && col("rel_change") > maxRel,
          lit(false)))
      .otherwise(col("value") =!= 0.0)
    history
      .withColumn("prev", lag(col("value"), 1).over(w))
      .withColumn("rel_change",
        when(abs(prev) > 0, abs(col("value") - prev) / abs(prev)))
      .where(flagged)
  }

  /** Trailing z-score anomalies: per series, flag runs whose value sits
    * more than `threshold` sample standard deviations from the mean of the
    * PREVIOUS `window` runs (the run under test is excluded from its own
    * baseline — a level shift must not mask itself). Needs a full trailing
    * window; earlier runs never flag. Degenerate baselines (std 0 or NaN)
    * never flag — constancy is rateOfChange's finding.
    */
  def trailingZ(history: DataFrame, window: Int, threshold: Double)
      : DataFrame = {
    require(window >= 2, s"trailing window must be >= 2, got $window")
    val w = Window.partitionBy("constraint", "metric")
      .orderBy(col("run_ts"), col("run_id"))
      .rowsBetween(-window, -1)
    history
      .withColumn("__n", count(col("value")).over(w))
      .withColumn("baseline_mean", avg(col("value")).over(w))
      .withColumn("__sd", stddev_samp(col("value")).over(w))
      .withColumn("z", when(!isnan(col("__sd")) && col("__sd") > 0,
        (col("value") - col("baseline_mean")) / col("__sd")))
      .where(coalesce(col("__n") >= window && !isnan(col("z")) &&
        abs(col("z")) > threshold, lit(false)))
      .drop("__n", "__sd")
  }
}
