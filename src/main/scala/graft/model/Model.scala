package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core data model of the validation engine.
  *
  * Retargets the reference's monitor-point/sensor-reading model
  * (reference: src/hive_data_loader.py:180-225 table registry) onto
  * multi-turn transcripts: monitor_point_code -> conv_id, create_time_s ->
  * ts, anomaly-flag columns -> Violation rows, per-point report sections ->
  * per-partition Verdict rows (see SURVEY.md §1.4).
  */

/** One transcript turn (the fact row; BASELINE.json input_hint shape). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp)

object Turn {
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))
}

/** A single constraint violation (analog of the reference's `{col}_anomaly`
  * flag columns, src/geological_anomaly_detector.py:145, carried as rows
  * instead of frame columns so violation sets union across constraints).
  */
final case class Violation(
    constraint: String,
    conv_id: String,
    turn_idx: Int,
    column: String,
    observed: String,
    bound: String,
    severity: String)

/** Per-partition pass/fail verdict (analog of the reference's
  * by_monitor_point report section, src/geological_anomaly_detector.py:417-438).
  */
final case class Verdict(
    partition_key: String,
    constraint: String,
    pass: Boolean,
    rows: Long,
    violations: Long,
    violation_rate: Double)

/** Per-column profile produced by the fused stats pass (reference analog:
  * feature profile at src/geological_anomaly_detector.py:445-454).
  */
final case class ColumnProfile(
    column: String,
    rows: Long,
    nulls: Long,
    mean: Double,
    stddev: Double,
    min: Double,
    max: Double,
    p25: Double,
    p50: Double,
    p75: Double,
    approxDistinct: Long)

/** Run-level counters; exactly mergeable across partitions/restarts
  * (counters + min/max only — required for checkpoint resume).
  */
final case class RunMetrics(
    rowsScanned: Long,
    constraintsEvaluated: Long,
    violations: Long,
    partitionsDone: Long) {
  def merge(o: RunMetrics): RunMetrics = RunMetrics(
    rowsScanned + o.rowsScanned,
    math.max(constraintsEvaluated, o.constraintsEvaluated),
    violations + o.violations,
    partitionsDone + o.partitionsDone)
}
