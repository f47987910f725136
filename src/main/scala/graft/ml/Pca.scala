package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over a small set of feature columns
  * (reference `src/anomaly_detection.py:414-418` uses sklearn PCA(2) for
  * its anomaly scatter plots; here it is a first-class projection operator
  * feeding the same SVG figures and any downstream similarity/condense
  * step).
  *
  * Spark-first shape (the Mahalanobis pattern):
  *  - ONE fused aggregation pass collects n, sums and cross-moments
  *    (d + d(d+1)/2 accumulators, shuffle-free map-side combine);
  *  - the d×d MLE covariance is eigen-decomposed AT THE DRIVER:
  *    d == 2 uses the closed form θ = atan2(2·c01, c00−c11)/2 — the exact
  *    formula the q61 DuckDB twin mirrors, so the whole fit+project chain
  *    is hash-checkable; d ≥ 3 uses cyclic Jacobi sweeps (deterministic,
  *    no RNG), golden-gated against numpy in PcaSpec;
  *  - projections are PURE Columns — Σᵢ (xᵢ − μᵢ)·v_ji with literal
  *    coefficients — so projecting 10^12 rows is one codegen projection
  *    over the scan, no UDF, no shuffle.
  *
  * Sign conventions (both deterministic and engine-independent):
  * d == 2 → v1 = (cos θ, sin θ) with θ ∈ (−π/2, π/2] (so v1.x ≥ 0),
  * v2 = (−sin θ, cos θ); d ≥ 3 → each eigenvector's largest-|component|
  * entry is made positive (numpy comparison is up to sign regardless).
  */
object Pca {

  final case class Model(cols: Seq[String], mean: Array[Double],
      components: Array[Array[Double]], explainedVar: Array[Double],
      explainedVarRatio: Array[Double]) {

    /** One Column per retained component: pc1, pc2, … */
    def project(prefix: String = "pc"): Seq[Column] =
      components.zipWithIndex.map { case (v, j) =>
        cols.indices
          .map(i => (col(cols(i)) - lit(mean(i))) * lit(v(i)))
          .reduce(_ + _)
          .as(s"$prefix${j + 1}")
      }
  }

  /** Fused moment pass → MLE mean/covariance (ddof = 0, like a fitted
    * Gaussian and like sklearn's PCA uses n in the denominator only up to
    * the λ scale — ratios are denominator-free). Shared with Mahalanobis
    * ([[Moments.fused]] — casts to double, so integer feature columns fit).
    */
  private def moments(df: DataFrame, cols: Seq[String])
      : (Double, Array[Double], Array[Array[Double]]) = Moments.fused(df, cols)

  def fit(df: DataFrame, cols: Seq[String], nComponents: Int = 2): Model = {
    val d = cols.size
    require(nComponents >= 1 && nComponents <= d,
      s"nComponents must be in [1, $d]")
    val (_, mean, cov) = moments(df, cols)
    val (vals, vecs) = if (d == 2) eig2(cov) else jacobiEig(cov)
    val total = vals.sum
    Model(cols, mean, vecs.take(nComponents), vals.take(nComponents),
      vals.take(nComponents).map(v =>
        if (total > 0) v / total else 0.0))
  }

  /** Closed-form symmetric 2×2 eigen — mirrored term-for-term by the q61
    * SQL twin. Returns (λ desc, rows = unit eigenvectors).
    */
  private[ml] def eig2(cov: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val a = cov(0)(0); val b = cov(0)(1); val c = cov(1)(1)
    val th = math.atan2(2.0 * b, a - c) / 2.0
    val cs = math.cos(th); val sn = math.sin(th)
    val half = math.sqrt((a - c) * (a - c) / 4.0 + b * b)
    val l1 = (a + c) / 2.0 + half
    val l2 = (a + c) / 2.0 - half
    (Array(l1, l2), Array(Array(cs, sn), Array(-sn, cs)))
  }

  /** Cyclic Jacobi for symmetric d×d (Golub & Van Loan §8.5): rotate out
    * the largest off-diagonal until convergence. Deterministic; d ≲ 32 by
    * the same contract as Mahalanobis.invert.
    */
  private[ml] def jacobiEig(cov: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = cov.length
    val a = Array.tabulate(d, d)((i, j) => cov(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val eps = 1e-14 * math.max(1e-300,
      (0 until d).map(i => math.abs(a(i)(i))).max)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > eps) {
      off = 0.0
      for { p <- 0 until d; q <- p + 1 until d } {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > eps) {
          val theta = 0.5 * math.atan2(2.0 * a(p)(q), a(p)(p) - a(q)(q))
          val cs = math.cos(theta); val sn = math.sin(theta)
          var k = 0
          while (k < d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = cs * akp + sn * akq
            a(k)(q) = -sn * akp + cs * akq
            k += 1
          }
          k = 0
          while (k < d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = cs * apk + sn * aqk
            a(q)(k) = -sn * apk + cs * aqk
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = cs * vkp + sn * vkq
            v(k)(q) = -sn * vkp + cs * vkq
            k += 1
          }
        }
      }
      sweep += 1
    }
    // order λ desc (stable), rows = eigenvectors, largest-|entry| positive
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      val m = col.indices.maxBy(r => math.abs(col(r)))
      if (col(m) < 0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }

  /** Fit + project in one call: original columns plus pc1..pck. */
  def fitProject(df: DataFrame, cols: Seq[String], nComponents: Int = 2)
      : DataFrame = {
    val m = fit(df, cols, nComponents)
    df.select(df.columns.map(col) ++ m.project(): _*)
  }
}
