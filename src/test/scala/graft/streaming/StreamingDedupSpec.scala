package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSuite

/** Ingest-time uniqueness: at-least-once redeliveries of the same
  * (conv_id, turn_idx) must be dropped across micro-batch boundaries
  * while the key is inside the watermark horizon.
  */
class StreamingDedupSpec extends GraftSuite {
  import spark.implicits._

  final case class In(conv_id: String, turn_idx: Int, text: String, ts: Timestamp)

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("duplicate turn deliveries are dropped across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[In]
    val out = StreamingDrift.dedupTurnsStream(input.toDF(), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        In("A", 0, "hello", t(0)),
        In("A", 0, "hello", t(0)), // same-batch redelivery
        In("A", 1, "again", t(1)),
        In("B", 0, "other", t(2)))
      q.processAllAvailable()
      input.addData(
        In("A", 1, "again", t(1)), // cross-batch redelivery, inside watermark
        In("A", 2, "new", t(3)),
        In("B", 0, "other", t(2))) // cross-batch redelivery
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select("conv_id", "turn_idx").collect()
        .map(r => (r.getString(0), r.getInt(1)))
      assert(got.length == got.distinct.length, s"emitted duplicates: ${got.toSeq}")
      assert(got.toSet == Set(("A", 0), ("A", 1), ("A", 2), ("B", 0)))
    } finally q.stop()
  }
}
