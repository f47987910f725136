package graft.series

import org.apache.spark.sql.functions._
import graft.GraftSuite

class DriftSpec extends GraftSuite {
  import spark.implicits._

  // baseline N(≈0..1 uniform-ish deterministic), current shifted for key b
  lazy val twoSided = {
    val rows = for {
      key <- Seq("stable", "shifted")
      side <- Seq("baseline", "current")
      i <- 0 until 2000
    } yield {
      val u = ((i * 2654435761L + key.hashCode + side.hashCode * 31) & 0x7fffffff) /
        Int.MaxValue.toDouble
      val v = if (key == "shifted" && side == "current") u + 0.7 else u
      (key, side, v)
    }
    rows.toDF("key", "side", "x").cache()
  }

  test("PSI near zero for stable, large for shifted") {
    val p = Drift.psi(twoSided, "x", "side", Seq("key"))
      .as[(String, Double)].collect().toMap
    assert(p("stable") < 0.05, s"stable psi=${p("stable")}")
    assert(p("shifted") > 0.5, s"shifted psi=${p("shifted")}")
  }

  test("exact KS matches a hand-computed two-sample statistic") {
    val small = Seq(
      ("k", "baseline", 1.0), ("k", "baseline", 2.0), ("k", "baseline", 3.0),
      ("k", "current", 2.5), ("k", "current", 3.5), ("k", "current", 4.0))
      .toDF("key", "side", "x")
    // F_b steps at 1,2,3 (1/3,2/3,1); F_c at 2.5,3.5,4. Max gap = at x=3: |1 - 1/3| = 2/3
    val d = Drift.ks(small, "x", "side", Seq("key")).collect()(0).getDouble(1)
    assert(math.abs(d - 2.0 / 3.0) < 1e-9, s"ks=$d")
  }

  test("KS small for stable, large for shifted; sketch KS agrees") {
    val exact = Drift.ks(twoSided, "x", "side", Seq("key"))
      .as[(String, Double)].collect().toMap
    val approx = Drift.ksSketch(twoSided, "x", "side", Seq("key"))
      .as[(String, Double)].collect().toMap
    assert(exact("stable") < 0.06 && exact("shifted") > 0.6)
    assert(math.abs(approx("stable") - exact("stable")) < 0.05)
    assert(math.abs(approx("shifted") - exact("shifted")) < 0.08)
  }

  test("KS on tied values: identical all-tied samples give D = 0, not 1") {
    // Integer bucket counts tie constantly; mid-tie CDF evaluation would
    // report D = 1.0 here. With tie peers fully included (RANGE frame),
    // both empirical CDFs agree at every distinct value.
    val tied = Seq.tabulate(20)(i => ("k", if (i % 2 == 0) "baseline" else "current", 7.0))
      .toDF("key", "side", "x")
    val d = Drift.ks(tied, "x", "side", Seq("key")).collect()(0).getDouble(1)
    assert(math.abs(d) < 1e-12, s"ks=$d for identical tied samples")
    // Mixed ties: b = {1,1,2}, c = {1,2,2}. F_b(1)=2/3, F_c(1)=1/3 → D=1/3.
    val mixed = Seq(("k", "baseline", 1.0), ("k", "baseline", 1.0), ("k", "baseline", 2.0),
      ("k", "current", 1.0), ("k", "current", 2.0), ("k", "current", 2.0))
      .toDF("key", "side", "x")
    val d2 = Drift.ks(mixed, "x", "side", Seq("key")).collect()(0).getDouble(1)
    assert(math.abs(d2 - 1.0 / 3.0) < 1e-12, s"ks=$d2 for mixed ties")
  }

  test("one-sided input yields null PSI/KS, not an ANSI divide-by-zero") {
    val oneSided = Seq(("k", "baseline", 1.0), ("k", "baseline", 2.0))
      .toDF("key", "side", "x")
    val p = Drift.psi(oneSided, "x", "side", Seq("key")).collect()(0)
    assert(p.isNullAt(1))
    val k = Drift.ks(oneSided, "x", "side", Seq("key")).collect()(0)
    assert(k.isNullAt(1))
  }

  test("ensemble k-of-n vote (A12)") {
    val df = Seq((true, true, false), (true, false, false), (false, false, false))
      .toDF("a", "b", "c")
    val got = Drift.ensembleVote(df, Seq("a", "b", "c"), k = 2)
      .select("ensemble_anomaly").as[Boolean].collect().toSeq
    assert(got == Seq(true, false, false))
  }

  test("anomaly score: min-max normalized row mean + level buckets (A13/F9)") {
    val df = Seq((0.0, 10.0), (5.0, 20.0), (10.0, 20.0)).toDF("s1", "s2")
    val got = Drift.anomalyScore(df, Seq("s1", "s2"))
      .select("anomaly_score", "anomaly_level").collect()
    // row1: (0 + 0)/2 = 0 → normal; row2: (0.5+1)/2=0.75 → medium; row3: (1+1)/2=1 → high
    assert(math.abs(got(0).getDouble(0) - 0.0) < 1e-9 && got(0).getString(1) == "normal")
    assert(math.abs(got(1).getDouble(0) - 0.75) < 1e-9 && got(1).getString(1) == "medium")
    assert(math.abs(got(2).getDouble(0) - 1.0) < 1e-9 && got(2).getString(1) == "high")
  }
}
