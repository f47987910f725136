package graft.series

/** STL — Seasonal-Trend decomposition using Loess (Cleveland et al. 1990),
  * self-contained Scala kernel for per-series execution inside
  * `flatMapSortedGroups` (SURVEY.md §2.9 T2). The reference calls
  * statsmodels `STL(data, seasonal=7, trend=None, robust=False).fit()`
  * (reference src/decomposition.py:33-73); this implements the same
  * algorithm with the same defaults:
  *
  *  - seasonal smoother `ns` (odd, default 7), degree 1
  *  - trend smoother `nt` = smallest odd >= ceil(1.5p / (1 - 1.5/ns))
  *  - low-pass `nl` = smallest odd >= p, degree 1
  *  - non-robust: 2 inner loops, 0 outer; robust: 1 inner, 15 outer with
  *    bisquare robustness weights
  *
  * Series arrive one conversation at a time (buckets per conversation are
  * small — hundreds), so O(n·q) loess is fine; parallelism is across
  * conversations, not within a series.
  */
object Stl {

  final case class Result(trend: Array[Double], seasonal: Array[Double],
      resid: Array[Double])

  def decompose(y: Array[Double], period: Int, seasonal: Int = 7,
      trendLength: Int = 0, robust: Boolean = false): Result = {
    val n = y.length
    require(period >= 2, "period must be >= 2")
    require(n >= 2 * period, s"need >= ${2 * period} points, got $n")
    val ns = nextOdd(math.max(3, seasonal))
    val nt = if (trendLength > 0) nextOdd(trendLength)
      else nextOdd(math.ceil(1.5 * period / (1.0 - 1.5 / ns)).toInt)
    val nl = nextOdd(period)

    val (innerIter, outerIter) = if (robust) (1, 15) else (2, 0)
    val trend = new Array[Double](n)
    val seas = new Array[Double](n)
    val rho = Array.fill(n)(1.0)

    var outer = 0
    while (outer <= outerIter) {
      var inner = 0
      while (inner < innerIter) {
        // 1. detrend
        val detrended = Array.tabulate(n)(i => y(i) - trend(i))
        // 2. cycle-subseries loess, extended one period each side
        val c = new Array[Double](n + 2 * period)
        var v = 0
        while (v < period) {
          val idx = (v until n by period).toArray
          val sub = idx.map(detrended)
          val w = idx.map(rho)
          val sm = loessWithExtension(sub, ns, w)
          var j = 0
          while (j < sub.length + 2) {
            val pos = v + j * period // position in extended array (offset -period)
            c(pos) = sm(j)
            j += 1
          }
          v += 1
        }
        // 3. low-pass filter of c: MA(p) x2 + MA(3) + loess(nl)
        val lp = movingAvg(movingAvg(movingAvg(c, period), period), 3)
        val l = loess(lp, nl, Array.fill(lp.length)(1.0)) // length n
        // 4. seasonal
        var i = 0
        while (i < n) { seas(i) = c(i + period) - l(i); i += 1 }
        // 5. deseasonalize + trend loess
        val deseas = Array.tabulate(n)(i => y(i) - seas(i))
        val t = loess(deseas, nt, rho)
        System.arraycopy(t, 0, trend, 0, n)
        inner += 1
      }
      // robustness weights from residuals
      if (outer < outerIter) {
        val r = Array.tabulate(n)(i => math.abs(y(i) - trend(i) - seas(i)))
        val h = 6.0 * median(r)
        var i = 0
        while (i < n) {
          val u = if (h > 0) r(i) / h else 0.0
          rho(i) = if (u >= 1.0) 0.0 else { val t = 1 - u * u; t * t }
          i += 1
        }
      }
      outer += 1
    }
    val resid = Array.tabulate(n)(i => y(i) - trend(i) - seas(i))
    Result(trend, seas, resid)
  }

  private def nextOdd(x: Int): Int = if (x % 2 == 0) x + 1 else x

  /** Centered moving average of width w; output length = in.length - w + 1. */
  private[series] def movingAvg(in: Array[Double], w: Int): Array[Double] = {
    val out = new Array[Double](in.length - w + 1)
    var s = 0.0
    var i = 0
    while (i < w) { s += in(i); i += 1 }
    out(0) = s / w
    var j = 1
    while (j < out.length) { s += in(j + w - 1) - in(j - 1); out(j) = s / w; j += 1 }
    out
  }

  /** Loess (degree 1, tricube weights x robustness weights) evaluated at
    * every integer position 0..n-1 with span q nearest points.
    */
  private[series] def loess(yv: Array[Double], q: Int,
      rho: Array[Double]): Array[Double] = {
    val n = yv.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = loessAt(yv, rho, i.toDouble, q); i += 1 }
    out
  }

  /** Loess smooth of a subseries + one extrapolated point on each end
    * (STL cycle-subseries extension): evaluates at -1 .. n.
    */
  private[series] def loessWithExtension(yv: Array[Double], q: Int,
      rho: Array[Double]): Array[Double] = {
    val n = yv.length
    val out = new Array[Double](n + 2)
    var j = -1
    while (j <= n) { out(j + 1) = loessAt(yv, rho, j.toDouble, q); j += 1 }
    out
  }

  /** Weighted local linear fit at x over the q nearest integer positions. */
  private def loessAt(yv: Array[Double], rho: Array[Double], x: Double,
      q: Int): Double = {
    val n = yv.length
    val qq = math.min(q, n)
    // nearest-q window [lo, hi] around x on 0..n-1
    var lo = math.max(0, math.min(n - qq, math.ceil(x - qq / 2.0).toInt))
    val hi = lo + qq - 1
    // bandwidth: distance to the furthest used point; inflate when q > n
    var lambda = math.max(x - lo, hi - x)
    if (q > n) lambda += (q - n) / 2.0
    if (lambda <= 0) lambda = 1e-9
    var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxy = 0.0; var swxx = 0.0
    var i = lo
    while (i <= hi) {
      val d = math.abs(i - x) / lambda
      if (d < 1.0) {
        val t = 1 - d * d * d
        val w = t * t * t * rho(i)
        sw += w; swx += w * i; swy += w * yv(i)
        swxy += w * i * yv(i); swxx += w * i.toDouble * i
        i += 1
      } else i += 1
    }
    if (sw == 0) return yv(math.max(0, math.min(n - 1, math.round(x).toInt)))
    val mx = swx / sw; val my = swy / sw
    val varx = swxx / sw - mx * mx
    if (varx <= 1e-12) my
    else {
      val beta = (swxy / sw - mx * my) / varx
      my + beta * (x - mx)
    }
  }

  private[series] def median(a: Array[Double]): Double = {
    val s = a.sorted
    val n = s.length
    if (n == 0) 0.0
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
}
