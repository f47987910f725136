package graft.series

import graft.GraftSuite

/** Differential oracle for the ADF kernel: goldens computed by an
  * INDEPENDENT numpy/lstsq implementation of the same published algorithm
  * (statsmodels adfuller semantics: common-sample AIC autolag, constant-
  * only regression, MacKinnon 2010 tau_c 5% surface) on LCG-deterministic
  * series — any linear-algebra or lag-bookkeeping defect in the Scala OLS
  * breaks the 1e-6 match.
  */
class StationaritySpec extends GraftSuite {

  private def lcg(n: Int, seed: Long = 1L): Array[Double] = {
    var x = seed
    Array.fill(n) {
      x = (1103515245L * x + 12345L) % (1L << 31)
      x.toDouble / (1L << 31)
    }
  }

  private val u = lcg(200)
  private val yStationary = Array.tabulate(200)(t => math.sin(t / 5.0) + 0.1 * u(t))
  private val yWalk = u.map(_ - 0.5).scanLeft(0.0)(_ + _).drop(1)

  test("autolag ADF matches the independent numpy golden (stationary series)") {
    val r = Stationarity.adfStat(yStationary)
    assert(math.abs(r.stat - -7.7486634612) < 1e-6, s"stat=${r.stat}")
    assert(r.usedLag == 14)
    assert(r.nobs == 185)
    assert(math.abs(r.crit5 - -2.877293) < 1e-5)
    assert(r.stationary)
  }

  test("autolag ADF matches the golden (random walk: not stationary)") {
    val r = Stationarity.adfStat(yWalk)
    assert(math.abs(r.stat - -2.0668851416) < 1e-6, s"stat=${r.stat}")
    assert(r.usedLag == 0)
    assert(r.nobs == 199)
    assert(!r.stationary)
  }

  test("fixed-lag-0 DF matches the closed-form golden") {
    val a = Stationarity.adfStat(yStationary, maxlag = 0, autolag = false)
    assert(math.abs(a.stat - -1.2350901652) < 1e-6, s"stat=${a.stat}")
    val b = Stationarity.adfStat(yWalk, maxlag = 0, autolag = false)
    assert(math.abs(b.stat - -2.0668851416) < 1e-6, s"stat=${b.stat}")
  }

  test("DataFrame kernel: one verdict row per series, short series null") {
    val spark0 = spark
    import spark0.implicits._
    val rows =
      yStationary.zipWithIndex.map { case (v, i) => ("s", i, v) } ++
      yWalk.zipWithIndex.map { case (v, i) => ("w", i, v) } ++
      Seq(("tiny", 0, 1.0), ("tiny", 1, 2.0))
    val df = rows.toSeq.toDF("k", "idx", "y")
    val out = Stationarity.adf(df, "k", "idx", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("s").getAs[Boolean]("stationary"))
    assert(!out("w").getAs[Boolean]("stationary"))
    assert(out("tiny").isNullAt(1)) // adf_stat null below minLen
    assert(math.abs(out("s").getAs[Double]("adf_stat") - -7.7486634612) < 1e-6)
  }
}
