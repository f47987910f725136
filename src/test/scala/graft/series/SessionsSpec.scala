package graft.series

import java.sql.Timestamp

import graft.GraftSuite

class SessionsSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val turns = Seq(
    // conv x: 3 sessions at gap 1800s: [0,1], [2,3,4], [5]
    ("x", 0, ts("2024-01-01 10:00:00")),
    ("x", 1, ts("2024-01-01 10:20:00")),
    ("x", 2, ts("2024-01-01 11:00:00")), // 40 min gap > 30 min
    ("x", 3, ts("2024-01-01 11:29:59")),
    ("x", 4, ts("2024-01-01 11:59:59")), // exactly 1800s: NOT a new session
    ("x", 5, ts("2024-01-02 00:00:00")),
    // conv y: single turn
    ("y", 0, ts("2024-01-01 00:00:00")))
    .toDF("conv_id", "turn_idx", "ts")

  test("gap threshold splits sessions; exact-gap stays in session") {
    val got = Sessions.assign(turns, "conv_id", "ts", "turn_idx", 1800L)
      .select("conv_id", "turn_idx", "session_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val want = Map(("x", 0) -> 0, ("x", 1) -> 0, ("x", 2) -> 1,
      ("x", 3) -> 1, ("x", 4) -> 1, ("x", 5) -> 2, ("y", 0) -> 0)
    assert(got == want)
  }

  test("gaps compare at microsecond precision, not truncated seconds") {
    // 10:00:00.000 -> 10:30:00.900: true gap 1800.9s > 1800 (new session);
    // whole-second truncation would compute 1800 and merge them
    val sub = Seq(
      ("s", 0, Timestamp.valueOf("2024-01-01 10:00:00")),
      ("s", 1, Timestamp.valueOf("2024-01-01 10:30:00.9")),
      ("s", 2, Timestamp.valueOf("2024-01-01 10:59:59.9"))) // 1799.0s gap: same session
      .toDF("conv_id", "turn_idx", "ts")
    val got = Sessions.assign(sub, "conv_id", "ts", "turn_idx", 1800L)
      .select("turn_idx", "session_idx").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == Map(0 -> 0, 1 -> 1, 2 -> 1))
  }

  test("sessionize aggregates bounds, counts and span per session") {
    val got = Sessions.sessionize(turns, "conv_id", "ts", "turn_idx", 1800L)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4), r.getLong(5))).toMap
    assert(got(("x", 1)) ==
      (3L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:59:59"), 3599L))
    assert(got(("y", 0)) ==
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), 0L))
    assert(got.size == 4)
  }

  test("one shuffle: assign produces a single Exchange in the plan") {
    val plan = Sessions.assign(turns, "conv_id", "ts", "turn_idx", 1800L)
      .queryExecution.executedPlan.toString
    // both windows (lag + running sum) share the partitioner; the local
    // relation parallelizes without an exchange, so exactly one shows up
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }
}
