package graft.pack

import graft.GraftSuite

class PackingSpec extends GraftSuite {
  import spark.implicits._

  private val turns = Seq(
    // conv a, capacity 10: [0,1,2] (3+4+3=10 exactly), [3] (oversize 12
    // alone), [4,5] (5+5)
    ("a", 0, Some(3L)), ("a", 1, Some(4L)), ("a", 2, Some(3L)),
    ("a", 3, Some(12L)), ("a", 4, Some(5L)), ("a", 5, Some(5L)),
    // conv b: null + negative tokens pack as 0 alongside real rows
    ("b", 0, Some(9L)), ("b", 1, None),
    ("b", 2, Some(-4L)), ("b", 3, Some(2L)))
    .toDF("conv_id", "turn_idx", "tok")

  private def packs(df: org.apache.spark.sql.DataFrame) =
    df.select("conv_id", "turn_idx", "pack_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap

  test("next-fit: exact fit stays, overflow opens a new pack") {
    val got = packs(Packing.nextFitPack(turns, "conv_id", "turn_idx", "tok", 10L))
    assert(got(("a", 0)) == 0 && got(("a", 1)) == 0 && got(("a", 2)) == 0,
      s"3+4+3 = capacity exactly must share pack 0: $got")
    assert(got(("a", 4)) == 2 && got(("a", 5)) == 2)
  }

  test("an oversize row occupies a pack alone; the next row starts fresh") {
    val got = packs(Packing.nextFitPack(turns, "conv_id", "turn_idx", "tok", 10L))
    assert(got(("a", 3)) == 1, "oversize row must open (and fill) its own pack")
    assert(got(("a", 4)) == 2, "row after an oversize pack must not join it")
  }

  test("null and negative token counts pack as zero tokens") {
    val got = packs(Packing.nextFitPack(turns, "conv_id", "turn_idx", "tok", 10L))
    // 9 + 0 + 0 = 9 <= 10 so all three share pack 0; the 2-token row
    // overflows (9 + 2 > 10) and opens pack 1
    assert(got(("b", 0)) == 0 && got(("b", 1)) == 0 && got(("b", 2)) == 0)
    assert(got(("b", 3)) == 1)
  }

  test("null keys group together into one shared pack sequence") {
    val withNulls = Seq(
      (null.asInstanceOf[String], 0, 6L),
      (null.asInstanceOf[String], 1, 6L),
      ("k", 0, 6L))
      .toDF("conv_id", "turn_idx", "tok")
    val got = Packing.nextFitPack(withNulls, "conv_id", "turn_idx", "tok", 10L)
      .select("conv_id", "turn_idx", "pack_idx")
      .collect().map(r => (Option(r.getString(0)), r.getInt(1)) -> r.getInt(2)).toMap
    // the two null-key rows are one group: 6 + 6 > 10 splits them
    assert(got((None, 0)) == 0 && got((None, 1)) == 1 && got((Some("k"), 0)) == 0,
      s"got $got")
  }

  test("packSummary reports counts, token sums and fill ratios") {
    val got = Packing.packSummary(turns, "conv_id", "turn_idx", "tok", 10L)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(("a", 0)) == ((3L, 10L, 1.0)))
    assert(got(("a", 1)) == ((1L, 12L, 1.2)), "oversize pack shows fill > 1")
    assert(got(("a", 2)) == ((2L, 10L, 1.0)))
    assert(got(("b", 0)) == ((3L, 9L, 0.9)))
    assert(got(("b", 1)) == ((1L, 2L, 0.2)))
  }

  test("one shuffle: the pack assignment plan has a single Exchange") {
    val plan = Packing.nextFitPack(turns, "conv_id", "turn_idx", "tok", 10L)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }

  test("a non-numeric token column is rejected, not coerced") {
    val bad = Seq(("a", 0, "ten")).toDF("conv_id", "turn_idx", "tok")
    val ex = intercept[org.apache.spark.SparkException] {
      Packing.nextFitPack(bad, "conv_id", "turn_idx", "tok", 10L).collect()
    }
    assert(ex.getMessage != null)
  }
}
