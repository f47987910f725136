package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.compile.Validator
import graft.dsl._
import graft.sources.Tables

/** Per-constraint cost probe for the bench suite (optimization round):
  * times validate() with each benchSuite constraint ALONE over the bench
  * table, so the throughput gate's per-turn CPU has an attribution.
  *   SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.ProbeSuite /dev/shm/graft_bench/table_200000"
  */
object ProbeSuite {
  def main(args: Array[String]): Unit = {
    val dataPath = args.headOption.getOrElse("/dev/shm/graft_bench/table_200000")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "524288")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    def table = spark.read.parquet(dataPath)
      .withColumn("turn_gap_s",
        (unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
          .cast("double"))
    val ctx = Validator.Context(Map(
      "role_dim" -> Tables.roleDim(spark), "tool_dim" -> Tables.toolDim(spark)))
    val constraints: Seq[(String, Constraint)] = Seq(
      "NotNull(text)" -> NotNull("text"),
      "UniqueKey(conv,turn)" -> UniqueKey(Seq("conv_id", "turn_idx")),
      "RI(role)" -> ReferentialIntegrity("role", "role_dim", "role"),
      "RI(tool)" -> ReferentialIntegrity("tool", "tool_dim", "tool"),
      "Regex(conv_id)" -> MatchesRegex("conv_id", "^conv_[0-9]{8}$"),
      "Regex(text)" -> MatchesRegex("text",
        "^turn [0-9]+ of conv_[0-9]{8}( [a-z]+){3}$"),
      "TextEquals(text)" -> TextEquals("text",
        graft.sources.TranscriptGen.textExpr(col("conv_id"), col("turn_idx"))),
      "ValueBounds(turn_idx)" -> ValueBounds("turn_idx", Some(0), None),
      "DistinctCount(conv)" -> DistinctCountBetween("conv_id", 1, Long.MaxValue),
      "Quantile(turn_idx)" -> QuantileBetween("turn_idx", 0.5, 0.0, 1e9),
      "RollingZ(gap)" -> RollingZDrift("turn_gap_s", window = 24, threshold = 3.0),
      "TurnRate(stl,1min)" -> TurnRateDrift(bucket = "1 minute", period = 7,
        method = "stl", seasonal = 7, residThreshold = 3.0))

    // warm the scan + window once
    table.count()
    constraints.foreach { case (name, c) =>
      val t0 = System.nanoTime()
      val r = Validator.validate(table, Check("p", Seq(c)), ctx)
      val nv = r.violations.count()
      val nd = r.verdicts.count()
      r.unpersistAll()
      println(f"[psuite] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  ($nv viol, $nd verd)")
    }
    // the full suite for reference
    val t0 = System.nanoTime()
    val r = Validator.validate(table, graft.Bench.benchSuite, ctx)
    val nv = r.violations.count(); val nd = r.verdicts.count()
    r.unpersistAll()
    println(f"[psuite] FULL SUITE               ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($nv viol, $nd verd)")
    spark.stop()
  }
}
