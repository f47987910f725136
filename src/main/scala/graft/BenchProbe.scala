package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.compile.Validator
import graft.sources.{Tables, TranscriptGen}

/** Phase-level scaling probe: times each action of the EXACT bench suite
  * (graft.Bench.runSuite) at a given parallelism so the non-scaling phase
  * can be identified and attacked.
  *   SPARK_GRAFT_CPUS=8 sbt "runMain graft.BenchProbe /tmp/graft_bench_250000"
  * Generates the table at local[32] first if missing.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dataPath = args.headOption.getOrElse("/tmp/graft_bench_250000")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt

    if (!new java.io.File(s"$dataPath/_SUCCESS").exists()) {
      val nConvs = dataPath.split("_").last.toLong
      val gen = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      gen.sparkContext.setLogLevel("WARN")
      TranscriptGen.generate(gen, nConvs).write.mode("overwrite").parquet(dataPath)
      gen.stop()
    }

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe:$cpus] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    def mkInput() = spark.read.parquet(dataPath)
      .withColumn("turn_gap_s",
        (unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
          .cast("double"))
    val ctx = Validator.Context(Map(
      "role_dim" -> Tables.roleDim(spark), "tool_dim" -> Tables.toolDim(spark)))

    // warm-up: one full untimed pass
    {
      val r = Validator.validate(mkInput(), Bench.benchSuite, ctx)
      r.violations.count(); r.verdicts.count(); mkInput().count()
      r.unpersistAll()
    }

    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val t = mkInput()
      val r = time(s"r$i validate() [pass1]")(Validator.validate(t, Bench.benchSuite, ctx))
      time(s"r$i violations.count")(r.violations.count())
      time(s"r$i verdicts.count")(r.verdicts.count())
      time(s"r$i input.count")(t.count())
      println(f"[probe:$cpus] r$i TOTAL              ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r.unpersistAll()
    }
    spark.stop()
  }
}
