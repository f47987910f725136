package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.compile.Validator
import graft.dsl._
import graft.sources.Tables

/** Phase-level scaling probe: times each suite phase separately at a given
  * parallelism so the non-scaling stage can be identified.
  *   SPARK_GRAFT_CPUS=8 sbt "runMain graft.BenchProbe /tmp/graft_bench_120000"
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dataPath = args.headOption.getOrElse("/tmp/graft_bench_120000")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val t = spark.read.parquet(dataPath)
      .withColumn("turn_gap_s",
        (unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
          .cast("double"))
    val ctx = Validator.Context(Map(
      "role_dim" -> Tables.roleDim(spark), "tool_dim" -> Tables.toolDim(spark)))

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warm
    t.count()

    time("scan_count")(t.count())
    time("stats_agg")(t.agg(count(lit(1)), approx_count_distinct(col("conv_id")),
      expr("percentile_approx(turn_idx, 0.5, 10000)")).collect())
    time("row_flags+window")(Validator.validate(t,
      Check("p", Seq(NotNull("text"), MatchesRegex("conv_id", "^conv_[0-9]{8}$"),
        RollingZDrift("turn_gap_s", 24, 3.0))), ctx).violations.count())
    time("uniqueness")(Validator.validate(t,
      Check("p", Seq(UniqueKey(Seq("conv_id", "turn_idx")))), ctx)
      .violations.count())
    time("referential")(Validator.validate(t,
      Check("p", Seq(ReferentialIntegrity("role", "role_dim", "role"))), ctx)
      .violations.count())
    val drift = Validator.validate(t,
      Check("p", Seq(TurnRateDrift(bucket = "1 hour", period = 24,
        method = "stl", seasonal = 7, residThreshold = 3.0))), ctx)
    time("drift_violations")(drift.violations.count())
    time("drift_verdicts")(drift.verdicts.count())
    val full = Validator.validate(t, Check("p", Seq(
      NotNull("text"), UniqueKey(Seq("conv_id", "turn_idx")),
      ReferentialIntegrity("role", "role_dim", "role"),
      RollingZDrift("turn_gap_s", 24, 3.0),
      TurnRateDrift(bucket = "1 hour", period = 24, method = "stl",
        seasonal = 7, residThreshold = 3.0))), ctx)
    time("full_violations")(full.violations.count())
    time("full_verdicts")(full.verdicts.count())
    spark.stop()
  }
}
