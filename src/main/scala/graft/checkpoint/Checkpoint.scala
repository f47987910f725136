package graft.checkpoint

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.compile.{StatsState, Validator}
import graft.dsl.Check

/** Snapshot-pinned, per-partition-resumable validation runs.
  *
  * The reference keeps "models" in a driver dict and has no resume story
  * (src/main_analysis.py:59; OOM documented as a failure mode). At 10^12
  * turns a run MUST survive restarts, so:
  *
  *  - [[SnapshotTable]] pins the exact input file set (Iceberg-snapshot
  *    semantics over plain parquet; a real Iceberg catalog drops in behind
  *    the same trait — we pin files instead of a snapshot id).
  *  - The conv-id space is hash-split into `partitions` slices;
  *    conversations never straddle slices, so per-conversation constraints
  *    (uniqueness, RI, drift, rolling-z) are exact per slice.
  *  - Each slice writes violations/verdicts/metrics + a mergeable
  *    [[StatsState]] (counters, min/max, t-digest, HLL) then an atomic
  *    _DONE marker. Restart skips _DONE slices; aggregate verdicts come
  *    from the commutative union of slice states — no rescan.
  */
object SnapshotTable {
  /** Pin the current file set of a parquet dir into a manifest. */
  def pin(spark: SparkSession, dataDir: String, manifestPath: String): Seq[String] = {
    val files = spark.read.parquet(dataDir).inputFiles.sorted.toSeq
    val json = files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("{\"files\": [", ",", "]}")
    Files.createDirectories(Paths.get(manifestPath).getParent)
    Files.write(Paths.get(manifestPath), json.getBytes(StandardCharsets.UTF_8))
    files
  }

  /** Read exactly the pinned files — late-arriving files are invisible,
    * so a resumed run sees the same rows the first attempt saw.
    */
  def read(spark: SparkSession, manifestPath: String): DataFrame = {
    val json = new String(Files.readAllBytes(Paths.get(manifestPath)),
      StandardCharsets.UTF_8)
    val files = "\"(file:[^\"]+|[^\"]*\\.parquet)\"".r.findAllMatchIn(json)
      .map(_.group(1)).toSeq.filterNot(_ == "files")
    spark.read.parquet(files: _*)
  }
}

final case class PartitionMetrics(partition: Int, rows: Long, violations: Long,
    constraintsEvaluated: Int, wallMs: Long)

class ResumableValidation(spark: SparkSession, checkpointDir: String,
    partitions: Int) {

  private def pDir(p: Int) = s"$checkpointDir/partitions/p=$p"
  private def doneMarker(p: Int) = Paths.get(s"${pDir(p)}/_DONE")
  def isDone(p: Int): Boolean = Files.exists(doneMarker(p))

  /** Run (or resume) the suite. Returns Some(violations, verdicts, metrics)
    * when all partitions are done; None if `maxPartitionsThisRun` stopped
    * the run early (kill-after-k simulation / budgeted incremental runs).
    */
  def run(df: DataFrame, check: Check,
      ctx: Validator.Context = Validator.Context(),
      withStatsState: Boolean = true,
      maxPartitionsThisRun: Int = Int.MaxValue)
      : Option[(DataFrame, DataFrame, Seq[PartitionMetrics])] = {
    val partCol = pmod(xxhash64(col(check.keyCol)), lit(partitions))
    val todo = (0 until partitions).filterNot(isDone).take(maxPartitionsThisRun)
    todo.foreach { p =>
      val t0 = System.nanoTime()
      val slice = df.where(partCol === p)
      val r = Validator.validate(slice, sliceCheck(check), ctx)
      val violations = r.violations.cache()
      violations.write.mode("overwrite").parquet(s"${pDir(p)}/violations")
      r.verdicts.write.mode("overwrite").parquet(s"${pDir(p)}/verdicts")
      if (withStatsState && StatsState.statedColumns(check).nonEmpty)
        StatsState.compute(slice, check).write.mode("overwrite")
          .parquet(s"${pDir(p)}/state")
      val rows = slice.count()
      val nViol = violations.count()
      violations.unpersist()
      val wall = (System.nanoTime() - t0) / 1000000
      import spark.implicits._
      Seq(PartitionMetrics(p, rows, nViol, check.constraints.size, wall)).toDF()
        .write.mode("overwrite").parquet(s"${pDir(p)}/metrics")
      // atomic completion marker — written last
      Files.createDirectories(doneMarker(p).getParent)
      Files.write(doneMarker(p), Array.emptyByteArray,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
    if ((0 until partitions).forall(isDone)) Some(collectResults(check)) else None
  }

  /** Per-slice check: aggregate-level constraints are evaluated from the
    * merged state at the end, not per slice (their per-slice answers would
    * be wrong); everything conversation-scoped stays.
    */
  private def sliceCheck(check: Check): Check = check.copy(
    constraints = check.constraints.filterNot {
      case _: graft.dsl.MinRows => true
      case _: graft.dsl.MeanBetween => true
      case _: graft.dsl.StddevBetween => true
      case _: graft.dsl.QuantileBetween => true
      case _: graft.dsl.DistinctCountBetween => true
      case _ => false
    })

  /** Union per-partition outputs + merge states → global results. */
  def collectResults(check: Check): (DataFrame, DataFrame, Seq[PartitionMetrics]) = {
    import spark.implicits._
    val done = (0 until partitions).filter(isDone)
    require(done.size == partitions,
      s"only ${done.size}/$partitions partitions done — resume with run()")
    val violations = spark.read.parquet(done.map(p => s"${pDir(p)}/violations"): _*)
    val verdicts = spark.read.parquet(done.map(p => s"${pDir(p)}/verdicts"): _*)
    val metrics = spark.read.parquet(done.map(p => s"${pDir(p)}/metrics"): _*)
      .as[PartitionMetrics].collect().toSeq.sortBy(_.partition)
    val withAgg = if (StatsState.statedColumns(check).nonEmpty &&
        Files.exists(Paths.get(s"${pDir(0)}/state"))) {
      val states = spark.read.parquet(done.map(p => s"${pDir(p)}/state"): _*)
      val aggV = StatsState.aggVerdicts(StatsState.merge(states), check)
        .withColumn("violations", when(col("pass"), 0L).otherwise(1L))
        .withColumn("violation_rate", lit(0.0))
        .select("partition_key", "constraint", "pass", "rows", "violations",
          "violation_rate")
      verdicts.unionByName(aggV)
    } else verdicts
    (violations, withAgg, metrics)
  }
}
