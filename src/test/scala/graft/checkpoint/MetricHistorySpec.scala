package graft.checkpoint

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.GraftSuite

class MetricHistorySpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("fromVerdicts: global per-constraint metric rows") {
    val verdicts = Seq(
      ("conv_a", "not_null(role)", true, 100L, 0L),
      ("conv_b", "not_null(role)", false, 50L, 5L),
      ("conv_a", "unique(conv_id,turn_idx)", true, 100L, 0L),
      ("conv_b", "unique(conv_id,turn_idx)", true, 50L, 0L)
    ).toDF("partition_key", "constraint", "pass", "rows", "violations")
    val m = MetricHistory.fromVerdicts(verdicts)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(m(("not_null(role)", "rows")) == 150.0)
    assert(m(("not_null(role)", "violations")) == 5.0)
    assert(m(("not_null(role)", "failed_partitions")) == 1.0)
    assert(math.abs(m(("not_null(role)", "violation_rate")) - 5.0 / 150) < 1e-12)
    assert(m(("unique(conv_id,turn_idx)", "failed_partitions")) == 0.0)
  }

  test("fromVerdicts: same-name per-key + '(global)' rows use the global counts") {
    // MaxKeyShare's shape: hot-key rows (rows=violations=the key's count)
    // plus ONE '(global)' census row under the same name. Mixing them
    // would record rows=1300/violations=302 — meaningless units where a
    // hot key merely growing fires a spurious rate-of-change anomaly.
    val verdicts = Seq(
      ("hot_a", "max_key_share(conv_id)", false, 200L, 200L),
      ("hot_b", "max_key_share(conv_id)", false, 100L, 100L),
      ("(global)", "max_key_share(conv_id)", false, 1000L, 2L)
    ).toDF("partition_key", "constraint", "pass", "rows", "violations")
    val m = MetricHistory.fromVerdicts(verdicts)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(m(("max_key_share(conv_id)", "rows")) == 1000.0)
    assert(m(("max_key_share(conv_id)", "violations")) == 2.0)
    // per-key FAIL rows still count as failed partition verdicts
    assert(m(("max_key_share(conv_id)", "failed_partitions")) == 3.0)
  }

  test("append/load round-trip preserves runs") {
    val dir = java.nio.file.Files.createTempDirectory("mh").toString + "/h"
    val metrics = Seq(("c1", "violations", 5.0))
      .toDF("constraint", "metric", "value")
    MetricHistory.append(dir, "r001", ts("2026-01-01 00:00:00"), metrics)
    MetricHistory.append(dir, "r002", ts("2026-01-02 00:00:00"),
      metrics.withColumn("value", lit(6.0)))
    val h = MetricHistory.load(spark, dir)
    assert(h.count() == 2)
    assert(h.select("run_id").as[String].collect().sorted.toSeq ==
      Seq("r001", "r002"))
  }

  lazy val series = Seq(
    // constraint c1 / metric violations: stable then a 3x jump at r4
    ("r1", "2026-01-01 00:00:00", "c1", "violations", 100.0),
    ("r2", "2026-01-02 00:00:00", "c1", "violations", 105.0),
    ("r3", "2026-01-03 00:00:00", "c1", "violations", 100.0),
    ("r4", "2026-01-04 00:00:00", "c1", "violations", 300.0),
    ("r5", "2026-01-05 00:00:00", "c1", "violations", 305.0),
    // zero-baseline series: 0 -> 0 quiet, 0 -> 7 flags with null rel
    ("r1", "2026-01-01 00:00:00", "c2", "violations", 0.0),
    ("r2", "2026-01-02 00:00:00", "c2", "violations", 0.0),
    ("r3", "2026-01-03 00:00:00", "c2", "violations", 7.0)
  ).map { case (id, t, c, m, v) => (id, ts(t), c, m, v) }
    .toDF("run_id", "run_ts", "constraint", "metric", "value")

  test("rateOfChange: flags only the jump; zero baseline flags nonzero") {
    val flagged = MetricHistory.rateOfChange(series, maxRel = 0.5)
      .select("run_id", "constraint", "rel_change").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(flagged == Set(
      ("r4", "c1", Some(2.0)), // |300-100|/100
      ("r3", "c2", None))) // 0 -> 7: infinite jump, rel undefined
  }

  test("rateOfChange: first run never flags; NaN never flags") {
    val withNan = series.union(Seq(
      ("r6", ts("2026-01-06 00:00:00"), "c1", "violations", Double.NaN),
      ("r7", ts("2026-01-07 00:00:00"), "c1", "violations", 305.0))
      .toDF("run_id", "run_ts", "constraint", "metric", "value"))
    val flagged = MetricHistory.rateOfChange(withNan, maxRel = 0.5)
      .select("run_id").as[String].collect().toSet
    // r6 (NaN value) and r7 (NaN baseline) both stay quiet
    assert(flagged == Set("r3", "r4"))
  }

  test("trailingZ: level shift flags after a full window; run excluded from its own baseline") {
    val shift = (1 to 8).map(i =>
      (f"r$i%02d", ts(f"2026-01-$i%02d 00:00:00"), "c", "m",
        if (i <= 6) Seq(10.0, 11.0, 10.5, 10.2, 10.8, 10.4)(i - 1) else 50.0))
      .toDF("run_id", "run_ts", "constraint", "metric", "value")
    val flagged = MetricHistory.trailingZ(shift, window = 4, threshold = 3.0)
      .select("run_id").as[String].collect().toSet
    // r07 flags vs the quiet trailing window; r08's window already holds
    // the 50 so its z is small... but r08 vs (10.8, 10.4, 50) baseline may
    // or may not flag — assert the shift run itself is caught
    assert(flagged.contains("r07"))
    assert(!flagged.exists(_ < "r05")) // no full window before r05
  }

  test("trailingZ: constant baseline (std 0) never flags") {
    val const = (1 to 6).map(i =>
      (f"r$i%02d", ts(f"2026-01-$i%02d 00:00:00"), "c", "m", 5.0))
      .toDF("run_id", "run_ts", "constraint", "metric", "value")
    assert(MetricHistory.trailingZ(const, window = 3, threshold = 1.0)
      .count() == 0)
  }
}
