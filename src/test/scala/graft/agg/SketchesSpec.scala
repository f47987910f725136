package graft.agg

import org.apache.spark.sql.functions._
import graft.GraftSuite

class SketchesSpec extends GraftSuite {
  import spark.implicits._

  lazy val data = (1 to 20000).map(i => (i % 7, math.pow(i.toDouble, 1.3)))
    .toDF("g", "x").cache()

  test("t-digest quantiles close to exact percentile") {
    val r = data.agg(
      Sketches.tdigestQuantile(Sketches.tdigestAgg(col("x")), 0.5).as("approx"),
      expr("percentile(x, 0.5)").as("exact")).collect()(0)
    val (a, e) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(a - e) / e < 0.01, s"approx=$a exact=$e")
  }

  test("partial sketches merge to the global sketch (checkpoint resume)") {
    // per-group partial sketches, then blob-union — vs one global sketch
    val partials = data.groupBy("g").agg(Sketches.tdigestAgg(col("x")).as("td"))
    val merged = partials.agg(
      Sketches.tdigestQuantile(Sketches.tdigestMergeAgg(col("td")), 0.9).as("q"))
      .collect()(0).getDouble(0)
    val direct = data.agg(
      Sketches.tdigestQuantile(Sketches.tdigestAgg(col("x")), 0.9).as("q"))
      .collect()(0).getDouble(0)
    val exact = data.agg(expr("percentile(x, 0.9)")).collect()(0).getDouble(0)
    assert(math.abs(merged - exact) / exact < 0.02, s"merged=$merged exact=$exact")
    assert(math.abs(direct - exact) / exact < 0.02)
  }

  test("merge is order-insensitive (commutative union within accuracy)") {
    val partials = data.groupBy("g").agg(Sketches.tdigestAgg(col("x")).as("td"))
    val q1 = partials.orderBy(asc("g")).agg(
      Sketches.tdigestQuantile(Sketches.tdigestMergeAgg(col("td")), 0.5))
      .collect()(0).getDouble(0)
    val q2 = partials.orderBy(desc("g")).agg(
      Sketches.tdigestQuantile(Sketches.tdigestMergeAgg(col("td")), 0.5))
      .collect()(0).getDouble(0)
    val exact = data.agg(expr("percentile(x, 0.5)")).collect()(0).getDouble(0)
    assert(math.abs(q1 - exact) / exact < 0.02)
    assert(math.abs(q2 - exact) / exact < 0.02)
  }

  test("rank/CDF is monotone and calibrated") {
    val r = data.agg(Sketches.tdigestAgg(col("x")).as("td"))
      .select(
        Sketches.tdigestRank(col("td"), lit(math.pow(10000.0, 1.3))).as("mid"),
        Sketches.tdigestRank(col("td"), lit(0.0)).as("lo"),
        Sketches.tdigestRank(col("td"), lit(1e9)).as("hi"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 0.5) < 0.02)
    assert(r.getDouble(1) < 0.01 && r.getDouble(2) > 0.99)
  }

  test("KLL: quantiles within the provable rank-error bound of exact") {
    // k=200 -> normalized rank error ~1.65%; translate the rank tolerance
    // into a value window via the exact quantiles at q +/- 0.02
    val r = data.agg(
      Sketches.kllQuantile(Sketches.kllAgg(col("x")), 0.5).as("approx"),
      expr("percentile(x, 0.48)").as("lo"),
      expr("percentile(x, 0.52)").as("hi")).collect()(0)
    assert(r.getDouble(0) >= r.getDouble(1) && r.getDouble(0) <= r.getDouble(2),
      s"kll median ${r.getDouble(0)} outside rank window " +
        s"[${r.getDouble(1)}, ${r.getDouble(2)}]")
  }

  test("KLL: partial sketches blob-merge to the global sketch; rank calibrated") {
    val partials = data.groupBy("g").agg(Sketches.kllAgg(col("x")).as("s"))
    val merged = partials.agg(
      Sketches.kllQuantile(Sketches.kllMergeAgg(col("s")), 0.9).as("q"))
      .collect()(0).getDouble(0)
    val window = data.agg(expr("percentile(x, 0.87)"), expr("percentile(x, 0.93)"))
      .collect()(0)
    assert(merged >= window.getDouble(0) && merged <= window.getDouble(1),
      s"merged=$merged window=$window")
    val rank = data.agg(Sketches.kllAgg(col("x")).as("s"))
      .select(Sketches.kllRank(col("s"), lit(math.pow(10000.0, 1.3))))
      .collect()(0).getDouble(0)
    assert(math.abs(rank - 0.5) < 0.02, s"rank=$rank")
  }

  test("KLL: nulls ignored; empty sketch yields null quantile") {
    val withNulls = (1 to 100).map(i =>
      (if (i % 2 == 0) Some(i.toDouble) else None)).toDF("x")
    val empty = withNulls.where(col("x").isNull).agg(
      Sketches.kllQuantile(Sketches.kllAgg(col("x")), 0.5)).collect()(0)
    assert(empty.isNullAt(0))
    val q = withNulls.agg(
      Sketches.kllQuantile(Sketches.kllAgg(col("x")), 0.5)).collect()(0)
    assert(!q.isNullAt(0))
  }

  test("nulls are ignored; empty sketch yields null quantile") {
    val withNulls = (1 to 100).map(i =>
      (if (i % 2 == 0) Some(i.toDouble) else None)).toDF("x")
    val q = withNulls.agg(
      Sketches.tdigestQuantile(Sketches.tdigestAgg(col("x")), 0.5)).collect()(0)
    assert(!q.isNullAt(0))
    val empty = withNulls.where(col("x").isNull).agg(
      Sketches.tdigestQuantile(Sketches.tdigestAgg(col("x")), 0.5)).collect()(0)
    assert(empty.isNullAt(0))
  }
}
