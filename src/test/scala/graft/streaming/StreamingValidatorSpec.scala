package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.streaming.StreamingValidator.Turn

/** Streaming rolling-z must flag exactly what the batch window kernel flags,
  * including across micro-batch boundaries (state carries the trailing
  * window) and with null values occupying window slots.
  */
class StreamingValidatorSpec extends GraftSuite {
  import spark.implicits._

  private val window = 5
  // trailing windows INCLUDE the current row, so a lone spike inflates its
  // own window's std: max attainable |z| = (n-1)/sqrt(n) ≈ 1.79 at n=5 —
  // any threshold ≥ that can never flag; 1.5 flags the spike and nothing
  // from the flat jitter (max jitter |z| ≈ 1.2)
  private val threshold = 1.5

  // conv A: flat at 10.0 with one spike; conv B: too short to ever flag
  private val turnsA = (0 until 20).map { i =>
    val v = if (i == 12) 1000.0 else 10.0 + (i % 3) * 0.5
    Turn("A", i, Some(v))
  }
  private val turnsB = (0 until 3).map(i => Turn("B", i, Some(1.0)))
  // conv C: a null breaks min_periods for the windows containing it
  private val turnsC = (0 until 10).map { i =>
    Turn("C", i, if (i == 4) None else Some(if (i == 8) 500.0 else 5.0 + i * 0.1))
  }

  private def batchFlags(all: Seq[Turn]): Set[(String, Int)] = {
    val df = all.toDF("conv_id", "turn_idx", "v")
      .withColumn("v", col("v").cast("double"))
    val stats = graft.series.Windows.rollingStats(df, "v", window,
      Seq("conv_id"), Seq("turn_idx"))
    stats.where(col("v_n") >= window &&
        abs((col("v") - col("v_rolling_mean")) / col("v_rolling_std")) > threshold)
      .select("conv_id", "turn_idx")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
  }

  test("streaming rolling-z == batch window flags across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Turn]
    val out = StreamingValidator.rollingZViolations(
      input.toDS(), "v", window, threshold, idleTimeoutMs = 0L)
    val q = out.writeStream.format("memory").queryName("rz_out")
      .outputMode("append").start()
    try {
      val all = turnsA ++ turnsB ++ turnsC
      // split mid-conversation so state must carry the trailing window
      val (b1, b2) = all.partition(t => t.turn_idx < 10)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("rz_out")
        .select("conv_id", "turn_idx")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      val expected = batchFlags(all)
      assert(expected.nonEmpty, "fixture must flag something")
      assert(got == expected, s"streaming $got vs batch $expected")
      // the spike and the decayed-window re-flags all come from conv A/C only
      assert(got.forall(x => x._1 == "A" || x._1 == "C"))
    } finally q.stop()
  }

  test("violation rows carry the batch-compatible schema") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Turn]
    val out = StreamingValidator.rollingZViolations(input.toDS(), "v", window,
      threshold, idleTimeoutMs = 0L)
    assert(out.schema.fieldNames.toSeq ==
      Seq("constraint", "conv_id", "turn_idx", "column", "observed", "bound",
        "severity"))
  }

  test("window=1 is accepted and flags nothing, matching the batch kernel") {
    // batch at window=1: rowsBetween(0,0) is legal, stddev_samp over one
    // row is null -> no flags; the streaming path must not reject what
    // the batch path accepts (its 1-sample 0/0 variance is NaN -> None)
    assert(batchFlags(turnsA).nonEmpty) // fixture sanity at window=5
    val df = turnsA.toDF("conv_id", "turn_idx", "v")
      .withColumn("v", col("v").cast("double"))
    val batch1 = graft.series.Windows.rollingZ(df, "v", 1, threshold,
      Seq("conv_id"), Seq("turn_idx"))
    assert(batch1.where(col("v_z_anomaly")).count() == 0)

    implicit val sc = spark.sqlContext
    val input = MemoryStream[Turn]
    val out = StreamingValidator.rollingZViolations(input.toDS(), "v", 1,
      threshold, idleTimeoutMs = 0L)
    val q = out.writeStream.format("memory").queryName("rz_w1")
      .outputMode("append").start()
    try {
      input.addData(turnsA: _*); q.processAllAvailable()
      assert(spark.table("rz_w1").count() == 0)
    } finally q.stop()
  }

  test("window=0: streaming rejects (would crash on an empty trailing " +
      "window); batch degrades to zero flags") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Turn]
    intercept[IllegalArgumentException] {
      StreamingValidator.rollingZViolations(input.toDS(), "v", 0, threshold,
        idleTimeoutMs = 0L)
    }
    // batch: rowsBetween(1, 0) is an EMPTY frame, not an error — all
    // aggregates are null, so nothing flags (no parity break: neither
    // path ever emits a violation at window=0)
    val df = turnsA.toDF("conv_id", "turn_idx", "v")
      .withColumn("v", col("v").cast("double"))
    val batch0 = graft.series.Windows.rollingZ(df, "v", 0, threshold,
      Seq("conv_id"), Seq("turn_idx"))
    assert(batch0.where(col("v_z_anomaly")).count() == 0)
  }
}
