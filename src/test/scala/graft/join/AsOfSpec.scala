package graft.join

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.GraftSuite

class AsOfSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val dim = Seq(
    ("a", ts("2024-01-01 00:00:00"), 1),
    ("a", ts("2024-01-03 12:00:00"), 2),
    ("a", ts("2024-01-10 00:00:00"), 3),
    ("b", ts("2024-01-05 00:00:00"), 10))
    .toDF("k", "valid_from", "version")

  private val fact = Seq(
    ("a", ts("2023-12-31 23:59:59"), "before-first"),
    ("a", ts("2024-01-01 00:00:00"), "at-first"),
    ("a", ts("2024-01-02 08:00:00"), "inside-1"),
    ("a", ts("2024-01-03 12:00:00"), "at-second"),
    ("a", ts("2024-01-09 23:59:59"), "end-of-2"),
    ("a", ts("2024-01-15 00:00:00"), "open-last"),
    ("b", ts("2024-01-04 00:00:00"), "b-before"),
    ("b", ts("2024-02-01 00:00:00"), "b-open"),
    ("c", ts("2024-01-06 00:00:00"), "no-dim-key"))
    .toDF("k", "ts", "tag")

  private val expected = Map(
    "before-first" -> None, "at-first" -> Some(1), "inside-1" -> Some(1),
    "at-second" -> Some(2), "end-of-2" -> Some(2), "open-last" -> Some(3),
    "b-before" -> None, "b-open" -> Some(10), "no-dim-key" -> None)

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[String, Option[Int]] =
    df.select("tag", "version").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap

  test("bucketed broadcast as-of matches backward-inclusive semantics") {
    val got = AsOf.joinAsOf(fact, dim, Seq("k"), "ts", "valid_from",
      "day", Seq("version"))
    assert(got.count() == fact.count()) // left semantics, no fan-out
    assert(toMap(got) == expected)
  }

  test("hour granularity agrees with day granularity") {
    val d = AsOf.joinAsOf(fact, dim, Seq("k"), "ts", "valid_from", "day", Seq("version"))
    val h = AsOf.joinAsOf(fact, dim, Seq("k"), "ts", "valid_from", "hour", Seq("version"))
    assert(toMap(d) == toMap(h))
  }

  test("shuffled union-sentinel as-of agrees with the bucketed form") {
    val got = AsOf.joinAsOfShuffle(fact, dim, Seq("k"), "ts", "valid_from",
      Seq("version"))
    assert(got.count() == fact.count())
    assert(toMap(got) == expected)
  }

  test("empty fact yields empty result with the joined schema") {
    val got = AsOf.joinAsOf(fact.limit(0), dim, Seq("k"), "ts", "valid_from",
      "day", Seq("version"))
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("k", "ts", "tag", "version"))
  }

  test("dim snapshot after the last fact never matches and never errors") {
    val lateDim = dim.union(Seq(("a", ts("2030-01-01 00:00:00"), 99))
      .toDF("k", "valid_from", "version"))
    val got = AsOf.joinAsOf(fact, lateDim, Seq("k"), "ts", "valid_from",
      "day", Seq("version"))
    assert(toMap(got) == expected)
  }

  test("all-null fact ts keeps every row with null dim columns (left)") {
    val nullFact = fact.withColumn("ts", lit(null).cast("timestamp"))
    val b = AsOf.joinAsOf(nullFact, dim, Seq("k"), "ts", "valid_from",
      "day", Seq("version"))
    assert(b.count() == fact.count() && b.where(col("version").isNotNull).count() == 0)
    val s = AsOf.joinAsOfShuffle(nullFact, dim, Seq("k"), "ts", "valid_from",
      Seq("version"))
    assert(s.count() == fact.count() && s.where(col("version").isNotNull).count() == 0)
  }

  test("null join keys never match on either tier (equi-join semantics)") {
    // a window partitionBy groups null keys together, so the shuffle tier
    // must explicitly mask them or it would hand null-role facts a
    // null-role snapshot that no equi/ASOF join would ever produce
    val nullKeyFact = fact.union(Seq(
      (null.asInstanceOf[String], ts("2024-01-06 00:00:00"), "null-key"))
      .toDF("k", "ts", "tag"))
    val nullKeyDim = dim.union(Seq(
      (null.asInstanceOf[String], ts("2024-01-01 00:00:00"), 77))
      .toDF("k", "valid_from", "version"))
    val want = expected + ("null-key" -> None)
    val b = AsOf.joinAsOf(nullKeyFact, nullKeyDim, Seq("k"), "ts",
      "valid_from", "day", Seq("version"))
    assert(b.count() == nullKeyFact.count() && toMap(b) == want)
    val s = AsOf.joinAsOfShuffle(nullKeyFact, nullKeyDim, Seq("k"), "ts",
      "valid_from", Seq("version"))
    assert(s.count() == nullKeyFact.count() && toMap(s) == want)
  }

  test("null dim timestamps never match on either tier (ts >= NULL is never true)") {
    // regression (ADVICE r4): under nulls-first window ordering a null-ts
    // snapshot sorts earliest on the shuffle tier and would carry its
    // payload onto facts BEFORE the key's first real snapshot ("b-before"
    // here), while the broadcast tier and a native ASOF join never match it
    val dirtyDim = dim.union(Seq(
      ("b", null.asInstanceOf[Timestamp], 500))
      .toDF("k", "valid_from", "version"))
    val b = AsOf.joinAsOf(fact, dirtyDim, Seq("k"), "ts", "valid_from",
      "day", Seq("version"))
    assert(toMap(b) == expected)
    val s = AsOf.joinAsOfShuffle(fact, dirtyDim, Seq("k"), "ts",
      "valid_from", Seq("version"))
    assert(toMap(s) == expected)
  }

  test("granularity coarser than the dim's snapshot spacing is rejected") {
    // week buckets over ~2.5-day-spaced snapshots: correct but a 7x join
    // fan-out per fact row — the guard-rail rejects it up front
    val ex = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(fact, dim, Seq("k"), "ts", "valid_from", "week",
        Seq("version"))
    }
    assert(ex.getMessage.contains("coarser"))
  }

  test("sub-hour snapshot spacing: 'hour' still works, coarser still rejected") {
    // regression: a dim snapshotted every 30 min violates the spacing
    // bound for EVERY supported unit — the finest ("hour") must remain
    // usable (perf guard, not a correctness guard), while "day" is still
    // rejected because switching to "hour" is actionable
    val denseDim = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1),
      ("a", ts("2024-01-01 00:30:00"), 2),
      ("a", ts("2024-01-01 01:00:00"), 3))
      .toDF("k", "valid_from", "version")
    val denseFact = Seq(
      ("a", ts("2024-01-01 00:15:00"), "in-1"),
      ("a", ts("2024-01-01 00:45:00"), "in-2"),
      ("a", ts("2024-01-01 02:00:00"), "open"))
      .toDF("k", "ts", "tag")
    val got = AsOf.joinAsOf(denseFact, denseDim, Seq("k"), "ts",
      "valid_from", "hour", Seq("version"))
    assert(toMap(got) ==
      Map("in-1" -> Some(1), "in-2" -> Some(2), "open" -> Some(3)))
    val ex = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(denseFact, denseDim, Seq("k"), "ts", "valid_from",
        "day", Seq("version"))
    }
    assert(ex.getMessage.contains("coarser"))
  }

  test("caller-supplied clamp horizon matches the computed one") {
    val got = AsOf.joinAsOf(fact, dim, Seq("k"), "ts", "valid_from",
      "day", Seq("version"), clampTs = Some(ts("2024-03-01 00:00:00")))
    assert(toMap(got) == expected)
  }

  test("bucketed fact side is not shuffled (broadcast hash join)") {
    val got = AsOf.joinAsOf(fact, dim, Seq("k"), "ts", "valid_from",
      "day", Seq("version"))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
