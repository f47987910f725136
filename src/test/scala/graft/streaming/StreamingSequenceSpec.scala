package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSuite
import graft.compile.Validator
import graft.dsl._
import graft.streaming.StreamingSequence.{SeqChecks, SeqTurn}

/** The streaming sequence pass must emit EXACTLY the batch Validator's
  * violation rows — constraint names, observed values, and bounds
  * included — across micro-batch boundaries, with O(1) state carrying
  * only the previous turn.
  */
class StreamingSequenceSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // one fixture exercising all four checks:
  //  c1: legal alternation, then a stutter + an illegal assistant→assistant
  //      + a value that runs backwards + a 2h session gap
  //  c2: opens illegally (assistant), null role/value/text edges
  private val turns = Seq(
    SeqTurn("c1", 0, Some("user"), Some(ts("2024-01-01 00:00:00")), Some("hi"), Some(1.0)),
    SeqTurn("c1", 1, Some("assistant"), Some(ts("2024-01-01 00:01:00")), Some("yo"), Some(2.0)),
    SeqTurn("c1", 2, Some("assistant"), Some(ts("2024-01-01 00:02:00")), Some("yo"), Some(3.0)),
    SeqTurn("c1", 3, Some("user"), Some(ts("2024-01-01 02:30:00")), Some("ok"), Some(2.5)),
    SeqTurn("c1", 4, None, Some(ts("2024-01-01 02:31:00")), None, None),
    SeqTurn("c1", 5, Some("user"), Some(ts("2024-01-01 02:32:00")), Some("z"), Some(2.5)),
    SeqTurn("c2", 0, Some("assistant"), Some(ts("2024-01-02 00:00:00")), Some("a"), Some(1.0)),
    SeqTurn("c2", 1, Some("user"), Some(ts("2024-01-02 00:01:00")), Some("b"), Some(0.5)))

  private val allowed = Seq("user" -> "assistant", "assistant" -> "user")
  private val firstIn = Some(Seq("user"))

  private def batchRows: Set[(String, String, Int, String, String, String)] = {
    val df = turns.toDF("conv_id", "turn_idx", "role", "ts", "text", "v")
    val r = Validator.validate(df, Check("t", Seq(
      MaxSessionGap(3600L),
      AllowedTransitions("role", allowed, firstIn),
      Monotonic("v"),
      NoConsecutiveRepeats("text")), tsCol = "ts"))
    val rows = r.violations
      .select("constraint", "conv_id", "turn_idx", "column", "observed", "bound")
      .as[(String, String, Int, String, String, String)].collect().toSet
    r.unpersistAll()
    rows
  }

  test("streaming sequence checks == batch fused pass, byte-for-byte rows") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqTurn]
    val out = StreamingSequence.sequenceViolations(input.toDS(),
      SeqChecks(
        maxGapSeconds = Some(3600L),
        transitions = Some((allowed, firstIn)),
        monotonicStrict = Some(false),
        noRepeats = true),
      idleTimeoutMs = 0L)
    val q = out.writeStream.format("memory").queryName("seq_out")
      .outputMode("append").start()
    try {
      // split MID-conversation: the c1 stutter pair and the gap pair both
      // straddle the boundary, so state must carry the previous turn
      val (b1, b2) = turns.partition(t => t.turn_idx < 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("seq_out")
        .select("constraint", "conv_id", "turn_idx", "column", "observed", "bound")
        .as[(String, String, Int, String, String, String)].collect().toSet
      val expected = batchRows
      // the fixture must exercise every check class
      assert(Set("session_gap", "transitions", "monotonic", "no_repeats")
        .forall(k => expected.exists(_._1.startsWith(k))), s"weak fixture: $expected")
      assert(got == expected, s"streaming $got vs batch $expected")
    } finally q.stop()
  }

  test("redelivered turns are skipped; a mid-thread start never fabricates an opener violation") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqTurn]
    val out = StreamingSequence.sequenceViolations(input.toDS(),
      SeqChecks(transitions = Some((allowed, firstIn)), noRepeats = true),
      idleTimeoutMs = 0L)
    val q = out.writeStream.format("memory").queryName("seq_redeliver")
      .outputMode("append").start()
    try {
      // c3 starts MID-THREAD at turn_idx 2 with a role outside firstIn:
      // empty state at a nonzero index means the stream joined late (or
      // state expired) — no opener violation may be fabricated
      input.addData(SeqTurn("c3", 2, Some("assistant"),
        Some(ts("2024-01-03 00:00:00")), Some("x"), None))
      q.processAllAvailable()
      // an at-least-once source redelivers turn 2 in a later batch: the
      // duplicate must be skipped, not compared against itself (a false
      // no_repeats hit — identical text — and a false self-transition)
      input.addData(SeqTurn("c3", 2, Some("assistant"),
        Some(ts("2024-01-03 00:00:00")), Some("x"), None))
      q.processAllAvailable()
      // a legal continuation still checks against the retained state
      input.addData(SeqTurn("c3", 3, Some("assistant"),
        Some(ts("2024-01-03 00:01:00")), Some("y"), None))
      q.processAllAvailable()
      val got = spark.table("seq_redeliver")
        .select("constraint", "conv_id", "turn_idx")
        .as[(String, String, Int)].collect().toSet
      // exactly ONE violation: the assistant->assistant transition at
      // turn 3 (real); nothing from the mid-thread start or the replay
      assert(got == Set(("transitions(role)", "c3", 3)), got)
    } finally q.stop()
  }

  test("same-batch duplicate turn_idx copies never compare against each other") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqTurn]
    val out = StreamingSequence.sequenceViolations(input.toDS(),
      SeqChecks(
        maxGapSeconds = None,
        transitions = Some((allowed, firstIn)),
        monotonicStrict = Some(true),
        noRepeats = true),
      idleTimeoutMs = 0L)
    val q = out.writeStream.format("memory").queryName("seq_dup_out")
      .outputMode("append").start()
    try {
      // an at-least-once redelivery lands BOTH copies of turn 1 in ONE
      // micro-batch: the copies must dedupe (first in sorted order wins),
      // not stutter/strict-monotonic-violate against each other
      val t0 = SeqTurn("d1", 0, Some("user"),
        Some(ts("2024-01-01 00:00:00")), Some("hi"), Some(1.0))
      val t1 = SeqTurn("d1", 1, Some("assistant"),
        Some(ts("2024-01-01 00:01:00")), Some("yo"), Some(2.0))
      input.addData(t0, t1, t1); q.processAllAvailable()
      val got = spark.table("seq_dup_out").collect()
      assert(got.isEmpty,
        s"duplicate copies in one batch produced violations: ${got.toSeq}")
    } finally q.stop()
  }

  test("violation rows are empty when every check is off") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqTurn]
    val out = StreamingSequence.sequenceViolations(input.toDS(), SeqChecks(),
      idleTimeoutMs = 0L)
    val q = out.writeStream.format("memory").queryName("seq_noop")
      .outputMode("append").start()
    try {
      input.addData(turns: _*); q.processAllAvailable()
      assert(spark.table("seq_noop").count() == 0)
    } finally q.stop()
  }
}
