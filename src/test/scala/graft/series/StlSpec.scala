package graft.series

import org.apache.spark.sql.functions._
import graft.GraftSuite

/** STL kernel contract tests (verdict-level parity with the reference's
  * statsmodels usage — same anomaly sets on the same series under the
  * documented thresholds, not bit-level equality; SURVEY.md §7.4).
  * Fixture mirrors the reference self-test: 365 daily points, linear trend
  * 0→10, weekly sinusoid amp 3 (reference src/decomposition.py:409-427).
  */
class StlSpec extends GraftSuite {
  import spark.implicits._

  private val n = 365
  private val period = 7
  private def cleanY(i: Int): Double =
    10.0 * i / n + 3 * math.sin(2 * math.Pi * i / period)

  test("recovers linear trend and weekly seasonal on the reference fixture") {
    val y = Array.tabulate(n)(cleanY)
    val r = Stl.decompose(y, period, seasonal = 7)
    // mid-series trend close to the true line
    (30 until n - 30).foreach { i =>
      assert(math.abs(r.trend(i) - 10.0 * i / n) < 0.35,
        s"trend off at $i: ${r.trend(i)} vs ${10.0 * i / n}")
    }
    // seasonal is periodic and near the true sinusoid mid-series
    (30 until n - 30 - period).foreach { i =>
      assert(math.abs(r.seasonal(i) - r.seasonal(i + period)) < 0.25)
    }
    val maxResid = (30 until n - 30).map(i => math.abs(r.resid(i))).max
    assert(maxResid < 0.5, s"resid too large: $maxResid")
  }

  test("decomposition is exact: trend+seasonal+resid == y") {
    val y = Array.tabulate(n)(i => cleanY(i) + 0.3 * math.cos(i.toDouble))
    val r = Stl.decompose(y, period)
    y.indices.foreach { i =>
      assert(math.abs(r.trend(i) + r.seasonal(i) + r.resid(i) - y(i)) < 1e-9)
    }
  }

  /** deterministic quasi-noise (no RNG): incommensurate sinusoids. */
  private def noise(i: Int): Double =
    0.35 * math.cos(3.1 * i) + 0.2 * math.sin(1.7 * i + 1.0)

  test("injected spikes land in residuals (IQR verdict parity)") {
    val spikes = Set(100, 200, 300)
    val y = Array.tabulate(n)(i =>
      cleanY(i) + noise(i) + (if (spikes(i)) 10.0 else 0.0))
    val r = Stl.decompose(y, period, robust = true)
    val resid = r.resid
    val sorted = resid.filterNot(_.isNaN).sorted
    def q(p: Double) = sorted(((sorted.length - 1) * p).toInt)
    val iqr = q(0.75) - q(0.25)
    val hi = q(0.75) + 2.0 * iqr
    val found = resid.indices.filter(i => resid(i) > hi).toSet
    assert(spikes.subsetOf(found), s"missed spikes: $found")
    assert(found.size <= spikes.size + 12, s"too many false positives: ${found.size}")
  }

  test("robust STL downweights outliers: trend less perturbed than non-robust") {
    val y = Array.tabulate(n)(i =>
      cleanY(i) + noise(i) + (if (i == 180) 40.0 else 0.0))
    val plain = Stl.decompose(y, period, robust = false)
    val robust = Stl.decompose(y, period, robust = true)
    val truth = 10.0 * 180 / n
    val errPlain = (175 to 185).map(i => math.abs(plain.trend(i) - 10.0 * i / n)).max
    val errRobust = (175 to 185).map(i => math.abs(robust.trend(i) - 10.0 * i / n)).max
    assert(errRobust < errPlain, s"robust=$errRobust plain=$errPlain (truth $truth)")
  }

  test("distributed stl via flatMapSortedGroups matches local kernel, any partitioning") {
    val y = Array.tabulate(n)(cleanY)
    val local = Stl.decompose(y, period)
    val df = y.zipWithIndex.map { case (v, i) => ("c1", i, v) }.toSeq
      .toDF("key", "idx", "y")
      .repartition(7) // scramble
    val got = SeriesKernels.stl(df, "key", "idx", "y", period)
      .orderBy("idx").select("trend", "seasonal", "resid").collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getDouble(0) - local.trend(i)) < 1e-9)
      assert(math.abs(r.getDouble(1) - local.seasonal(i)) < 1e-9)
      assert(math.abs(r.getDouble(2) - local.resid(i)) < 1e-9)
    }
  }

  test("short series pass through with null components") {
    val df = (0 until 10).map(i => ("c1", i, 1.0 * i)).toDF("key", "idx", "y")
    val got = SeriesKernels.stl(df, "key", "idx", "y", period)
    assert(got.count() == 10)
    assert(got.where(col("trend").isNotNull).isEmpty)
  }

  test("forecast extrapolates trend + cycles seasonal") {
    val y = Array.tabulate(n)(cleanY)
    val df = y.zipWithIndex.map { case (v, i) => ("c1", i, v) }.toSeq
      .toDF("key", "idx", "y")
    val dec = SeriesKernels.stl(df, "key", "idx", "y", period)
    val fc = SeriesKernels.forecast(dec, "key", "idx", period, periods = 14)
      .orderBy("step").collect()
    assert(fc.length == 14)
    // forecast continues the level: close to the true function extended
    fc.foreach { r =>
      val h = r.getInt(1)
      val truth = cleanY(n - 1 + h)
      assert(math.abs(r.getDouble(2) - truth) < 1.5,
        s"step $h: ${r.getDouble(2)} vs $truth")
    }
  }
}
