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

    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val freshSession = sys.env.get("SPARK_GRAFT_FRESH_SESSION").contains("1")
    def mkSession() = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.files.maxPartitionBytes",
          sys.env.getOrElse("SPARK_GRAFT_MAXPART", "8m"))
        .config("spark.sql.files.openCostInBytes", "524288")
        .config("spark.sql.adaptive.enabled",
          sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
          sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = mkSession()

    import java.lang.management.ManagementFactory
    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans
      .toArray.map(_.asInstanceOf[java.lang.management.GarbageCollectorMXBean]
        .getCollectionTime).sum
    def cpuNs: Long = ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime

    // deterministic task-metric counters (noise-independent): spill bytes
    // and task CPU from completed tasks
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val taskCpu = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    def attachListener(s: SparkSession): Unit =
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            memSpill.addAndGet(m.memoryBytesSpilled)
            diskSpill.addAndGet(m.diskBytesSpilled)
            taskCpu.addAndGet(m.executorCpuTime)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val g0 = gcMs; val c0 = cpuNs
      val s0 = memSpill.get; val d0 = diskSpill.get; val tc0 = taskCpu.get
      val sw0 = shufWrite.get
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val gc = (gcMs - g0) / 1e3
      val cpu = (cpuNs - c0) / 1e9
      val spillMb = (memSpill.get - s0) / 1e6
      val dspillMb = (diskSpill.get - d0) / 1e6
      val tcpu = (taskCpu.get - tc0) / 1e9
      val swMb = (shufWrite.get - sw0) / 1e6
      println(f"[probe:$cpus] $name%-24s $wall%8.2f s  cpu=$cpu%7.1f s  taskcpu=$tcpu%7.1f s  gc=$gc%5.1f s  spill=$spillMb%8.0f MB  dspill=$dspillMb%7.0f MB  shufw=$swMb%7.0f MB")
      r
    }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    def mkInput() = spark.read.parquet(dataPath)
      .withColumn("turn_gap_s",
        (unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
          .cast("double"))
    def mkCtx() = Validator.Context(Map(
      "role_dim" -> Tables.roleDim(spark), "tool_dim" -> Tables.toolDim(spark)))

    // stage mode: time each constraint family separately (which pass
    // inflates CPU as cores grow?)
    attachListener(spark)
    if (sys.env.get("SPARK_GRAFT_STAGES").contains("1")) {
      import graft.dsl._
      val t = mkInput()
      t.count() // warm scan
      def one(name: String, cs: Seq[Constraint]): Unit = {
        val r = Validator.validate(t, Check("p", cs), mkCtx())
        time(name)(r.violations.count())
        r.unpersistAll()
      }
      one("row_flags(regex+text)", Seq(NotNull("text"),
        MatchesRegex("conv_id", "^conv_[0-9]{8}$"),
        MatchesRegex("text", "^turn [0-9]+ of conv_[0-9]{8}( [a-z]+){3}$"),
        TextEquals("text", graft.sources.TranscriptGen.textExpr(col("conv_id"), col("turn_idx"))),
        ValueBounds("turn_idx", Some(0), None)))
      one("rolling_z window", Seq(RollingZDrift("turn_gap_s", 24, 3.0)))
      one("uniqueness", Seq(UniqueKey(Seq("conv_id", "turn_idx"))))
      one("referential x2", Seq(ReferentialIntegrity("role", "role_dim", "role"),
        ReferentialIntegrity("tool", "tool_dim", "tool")))
      one("drift(stl+psi+ks)", Seq(TurnRateDrift(bucket = "1 minute", period = 7,
        method = "stl", seasonal = 7, residThreshold = 3.0)))
      time("input scan count")(t.count())
      spark.stop()
      return
    }

    // warm-up: one full untimed pass
    {
      val r = Validator.validate(mkInput(), Bench.benchSuite, mkCtx())
      r.violations.count(); r.verdicts.count(); mkInput().count()
      r.unpersistAll()
    }

    (1 to reps).foreach { i =>
      if (freshSession) { spark.stop(); spark = mkSession(); attachListener(spark) }
      val t0 = System.nanoTime()
      val t = mkInput()
      val r = time(s"r$i validate() [pass1]")(Validator.validate(t, Bench.benchSuite, mkCtx()))
      time(s"r$i violations.count")(r.violations.count())
      time(s"r$i verdicts.count")(r.verdicts.count())
      time(s"r$i input.count")(t.count())
      println(f"[probe:$cpus] r$i TOTAL              ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r.unpersistAll()
    }
    spark.stop()
  }
}
