package graft.compile

import org.apache.spark.sql.functions._
import graft.GraftSuite

class ProfilerSpec extends GraftSuite {
  import spark.implicits._

  test("numeric-column discovery excludes keys and flag suffixes (P3)") {
    val df = Seq((1, "a", 2.0, 0.5, true)).toDF(
      "turn_idx", "conv_id", "value", "value_score", "ok")
    assert(Profiler.numericColumns(df) == Seq("value"))
  }

  test("inf scrub (P9)") {
    val df = Seq(1.0, Double.PositiveInfinity, Double.NegativeInfinity, 4.0)
      .toDF("x")
    val got = Profiler.scrubInf(df, Seq("x"))
    assert(got.where(col("x").isNull).count() == 2)
    assert(got.agg(sum(col("x"))).collect()(0).getDouble(0) == 5.0)
  }

  test("one-pass profile over the events table") {
    val e = spark.read.parquet(s"$sfTiny/events.parquet")
    val p = Profiler.profile(e, Seq("value", "user_id")).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p.keySet == Set("value", "user_id"))
    val v = p("value")
    val exact = e.agg(avg("value"), expr("percentile(value, 0.5)"),
      countDistinct("user_id")).collect()(0)
    assert(math.abs(v.getAs[Double]("mean") - exact.getDouble(0)) < 1e-9)
    assert(math.abs(v.getAs[Double]("p50") - exact.getDouble(1)) /
      exact.getDouble(1) < 0.05)
    assert(v.getAs[Long]("nulls") == 0)
  }

  test("evaluation: confusion matrix + P/R/F1 (A14)") {
    val df = Seq(
      (true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false))
      .toDF("pred", "truth")
    val r = Evaluation.confusion(df, "pred", "truth").collect()(0)
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 1 &&
      r.getAs[Long]("fn") == 1 && r.getAs[Long]("tn") == 2)
    assert(math.abs(r.getAs[Double]("precision") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("recall") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("f1") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("accuracy") - 2.0 / 3) < 1e-12)
  }
}
