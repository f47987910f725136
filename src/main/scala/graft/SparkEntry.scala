package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with an exact DuckDB oracle over the same parquet.
  *
  * Column names are aliased identically on both sides (driver hash-compares
  * after sorting columns by name). Double aggregates whose value depends on
  * accumulation order are rounded identically on both sides.
  */
object SparkEntry {

  /** Flagship: per-conversation hourly turn-rate series (T1) over the
    * transcripts view on sf0.001 — the base series of the drift family.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_turn_rate_bucketing")(spark, "/root/testdata/sf0.001")

  // ---- shared helpers -----------------------------------------------------

  /** Cross-join a 1-row scalar-aggregate frame onto df (broadcast — the agg
    * side is one row; this is the Spark analog of pandas' scalar broadcast).
    */
  private def withScalars(df: DataFrame, scalars: DataFrame): DataFrame =
    df.crossJoin(broadcast(scalars))

  // ---- queries ------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2/P1-P6: canonical projection scan — project + IS NOT NULL + range +
    // IN-list predicates, all pushed to the parquet scan.
    // (reference: sql/get_di.sql:1-19, src/hive_data_loader.py:269-308)
    "q01_scan_project_filter" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
        .where(col("value").isNotNull &&
          col("event_type").isin("click", "view", "purchase") &&
          col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-22 00:00:00").cast("timestamp"))
    }),

    // A1/A8: grouped multi-agg summary per entity
    // (reference: src/hive_data_loader.py:528-533)
    "q02_summary_agg" -> ((s, dir) => {
      Tables.events(s, dir).groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        countDistinct(col("event_type")).as("n_types"),
        round(sum(col("value")), 4).as("sum_value"))
    }),

    // A2/A3/A7/A16: fused global column stats in ONE aggregation pass
    // (reference: src/decomposition.py:374-399, src/preprocessing.py:55)
    "q03_column_stats" -> ((s, dir) => {
      Tables.events(s, dir).agg(
        count(lit(1)).as("rows"),
        (count(lit(1)) - count(col("value"))).as("nulls"),
        round(avg(col("value")), 6).as("mean"),
        round(stddev_samp(col("value")), 6).as("stddev"),
        round(var_pop(col("value")), 6).as("var_pop_v"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))
    }),

    // A4/A5: exact quantiles (linear interpolation) + IQR
    // (reference: src/decomposition.py:161-162, src/geological_anomaly_detector.py:130-131)
    "q04_quantiles" -> ((s, dir) => {
      Tables.events(s, dir).agg(
        round(expr("percentile(value, 0.25)"), 6).as("q1"),
        round(expr("percentile(value, 0.5)"), 6).as("med"),
        round(expr("percentile(value, 0.75)"), 6).as("q3"),
        round(expr("percentile(value, 0.75) - percentile(value, 0.25)"), 6).as("iqr"))
    }),

    // A6: MAD / modified z-score outliers (robust z)
    // (reference: src/anomaly_detection.py:253-257, src/preprocessing.py:199-203)
    "q05_robust_z_outliers" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val med = e.agg(expr("percentile(value, 0.5)").as("med"))
      val withMed = withScalars(e, med)
      val mad = withMed.agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      withScalars(withMed, mad)
        .withColumn("rz", lit(0.6745) * (col("value") - col("med")) / col("mad"))
        .where(abs(col("rz")) > 3.5)
        .select(col("event_id"), col("value"), round(col("rz"), 4).as("rz"))
    }),

    // T5 (IQR rule): residual-style IQR outliers, k=1.5
    // (reference: src/decomposition.py:140-181 with k from caller)
    "q06_iqr_outliers" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val q = e.agg(
        expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"))
      withScalars(e, q)
        .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
        .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
        .where(col("value") < col("lo") || col("value") > col("hi"))
        .select(col("event_id"), col("value"), round(col("lo"), 6).as("lo"),
          round(col("hi"), 6).as("hi"))
    }),

    // Uniqueness constraint: duplicate-key census on
    // (user_id, event_type, hour); violations = groups with n > 1
    "q07_uniqueness_violations" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"),
          date_trunc("hour", col("ts")).as("bucket_ts"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") > 1)
    }),

    // J2: referential integrity of transcripts.role against role_dim via
    // broadcast left-anti join → violation rows
    "q08_referential_violations" -> ((s, dir) => {
      Tables.transcripts(s, dir)
        .join(broadcast(Tables.roleDim(s)), Seq("role"), "left_anti")
        .select(col("conv_id"), col("turn_idx"), col("role"))
    }),

    // W1/W2: per-conversation trailing rolling mean/std (window=24,
    // min_periods=24 — pandas NaN-head parity) + |z|>3 flag rows
    // (reference: src/geological_anomaly_detector.py:249-259)
    "q09_rolling_z_violations" -> ((s, dir) => {
      val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
        .rowsBetween(-23, 0)
      Tables.transcripts(s, dir)
        .withColumn("n_win", count(col("value")).over(w))
        .withColumn("roll_mean", avg(col("value")).over(w))
        .withColumn("roll_std", stddev_samp(col("value")).over(w))
        .withColumn("z", (col("value") - col("roll_mean")) / col("roll_std"))
        .where(col("n_win") >= 24 && abs(col("z")) > 3)
        .select(col("conv_id"), col("turn_idx"), col("value"),
          round(col("z"), 4).as("z"))
    }),

    // T1: ts-bucketed turn-rate series (the north-star drift input)
    // (reference resample: src/preprocessing.py:254-288)
    "q10_turn_rate_bucketing" -> ((s, dir) => {
      Tables.transcripts(s, dir)
        .groupBy(col("conv_id"), date_trunc("hour", col("ts")).as("bucket_ts"))
        .agg(count(lit(1)).as("n_turns"), round(avg(col("value")), 6).as("mean_value"))
    })
  )

  // ---- DuckDB oracles -----------------------------------------------------

  private val T = Tables.transcriptsSql

  def oracleSql: Map[String, String] = Map(
    "q01_scan_project_filter" ->
      """SELECT event_id, user_id, event_type, value, ts FROM events
        |WHERE value IS NOT NULL AND event_type IN ('click','view','purchase')
        |  AND ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-22 00:00:00'""".stripMargin,

    "q02_summary_agg" ->
      """SELECT user_id, count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts,
        |  count(DISTINCT event_type) AS n_types, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY user_id""".stripMargin,

    "q03_column_stats" ->
      """SELECT count(*) AS rows, count(*) - count(value) AS nulls,
        |  round(avg(value), 6) AS mean, round(stddev_samp(value), 6) AS stddev,
        |  round(var_pop(value), 6) AS var_pop_v, min(value) AS vmin, max(value) AS vmax
        |FROM events""".stripMargin,

    "q04_quantiles" ->
      """SELECT round(quantile_cont(value, 0.25), 6) AS q1,
        |  round(quantile_cont(value, 0.5), 6) AS med,
        |  round(quantile_cont(value, 0.75), 6) AS q3,
        |  round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6) AS iqr
        |FROM events""".stripMargin,

    "q05_robust_z_outliers" ->
      """WITH m AS (SELECT median(value) AS med FROM events),
        |  d AS (SELECT median(abs(value - med)) AS mad FROM events, m)
        |SELECT event_id, value,
        |  round(0.6745 * (value - med) / mad, 4) AS rz
        |FROM events, m, d
        |WHERE abs(0.6745 * (value - med) / mad) > 3.5""".stripMargin,

    "q06_iqr_outliers" ->
      """WITH q AS (SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM events)
        |SELECT event_id, value,
        |  round(q1 - 1.5 * (q3 - q1), 6) AS lo, round(q3 + 1.5 * (q3 - q1), 6) AS hi
        |FROM events, q
        |WHERE value < q1 - 1.5 * (q3 - q1) OR value > q3 + 1.5 * (q3 - q1)""".stripMargin,

    "q07_uniqueness_violations" ->
      """SELECT user_id, event_type, date_trunc('hour', ts) AS bucket_ts, count(*) AS n
        |FROM events GROUP BY 1, 2, 3 HAVING count(*) > 1""".stripMargin,

    "q08_referential_violations" ->
      s"""WITH $T
         |SELECT conv_id, turn_idx, role FROM transcripts
         |WHERE role NOT IN ('user','assistant','system','tool')""".stripMargin,

    "q09_rolling_z_violations" ->
      s"""WITH $T,
         |w AS (
         |  SELECT conv_id, turn_idx, value,
         |    count(value) OVER win AS n_win,
         |    avg(value) OVER win AS roll_mean,
         |    stddev_samp(value) OVER win AS roll_std
         |  FROM transcripts
         |  WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
         |)
         |SELECT conv_id, turn_idx, value, round((value - roll_mean) / roll_std, 4) AS z
         |FROM w WHERE n_win >= 24 AND abs((value - roll_mean) / roll_std) > 3""".stripMargin,

    "q10_turn_rate_bucketing" ->
      s"""WITH $T
         |SELECT conv_id, date_trunc('hour', ts) AS bucket_ts, count(*) AS n_turns,
         |  round(avg(value), 6) AS mean_value
         |FROM transcripts GROUP BY 1, 2""".stripMargin
  )
}
