package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.series.Sessions

/** Streaming session windows must agree with the batch gap-sessionization
  * kernel on tie-free data, including sessions assembled ACROSS
  * micro-batch boundaries (the state-merge path).
  */
class StreamingSessionSpec extends GraftSuite {
  import spark.implicits._

  final case class In(conv_id: String, turn_idx: Int, ts: Timestamp)

  private def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("session windows split on gaps and merge across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[In]
    val out = StreamingDrift.sessionStream(input.toDF(),
      gap = "30 minutes", watermark = "6 hours")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      input.addData(
        In("A", 0, t(10, 0)), In("A", 1, t(10, 20)),
        In("B", 0, t(10, 0)))
      q.processAllAvailable()
      input.addData(
        In("A", 2, t(10, 40)), // 20 min after A@10:20 -> MERGES into session 1
        In("A", 3, t(12, 0)),  // 80 min gap -> new session
        In("B", 1, t(11, 0)))  // 60 min gap -> new session
      q.processAllAvailable()

      val got = spark.table("sess_out")
        .select("conv_id", "session_start", "n_turns").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
      val want = Set(
        ("A", t(10, 0), 3L), ("A", t(12, 0), 1L),
        ("B", t(10, 0), 1L), ("B", t(11, 0), 1L))
      assert(got == want, s"got $got")

      // batch kernel on the same rows (tie-free: no exact-30min gaps)
      val batch = Seq(("A", 0, t(10, 0)), ("A", 1, t(10, 20)),
        ("A", 2, t(10, 40)), ("A", 3, t(12, 0)),
        ("B", 0, t(10, 0)), ("B", 1, t(11, 0)))
        .toDF("conv_id", "turn_idx", "ts")
      val bs = Sessions.sessionize(batch, "conv_id", "ts", "turn_idx", 1800L)
        .select("conv_id", "session_start", "n_turns").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(bs == got, s"batch $bs != streaming $got")
    } finally q.stop()
  }
}
