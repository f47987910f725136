package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Elliptic-envelope-style multivariate outlier detection (reference
  * `src/geological_anomaly_detector.py:195-199`: EllipticEnvelope with
  * contamination=0.1): points whose squared Mahalanobis distance from the
  * fitted Gaussian exceeds the contamination quantile are anomalies.
  *
  * Spark-first shape:
  *  - ONE aggregation pass collects n, per-column sums and all pairwise
  *    cross-moments (d + d(d+1)/2 accumulators — a single shuffle-free
  *    fused agg, same pattern as the Validator's stats pass);
  *  - mean/covariance assembled and inverted AT THE DRIVER (d×d with
  *    d ≲ 32 — Gauss-Jordan on a 32×32 is microseconds);
  *  - the squared distance (x-μ)ᵀ Σ⁻¹ (x-μ) is emitted as a PURE Column
  *    expression (sum of d² products with literal coefficients) — it rides
  *    whole-stage codegen with zero UDFs, so scoring 10^12 rows is one
  *    projection over the scan;
  *  - optional robust refit: drop points beyond the quantile and refit
  *    once (a 1-step reweighting approximation of sklearn's MCD — same
  *    role, simpler estimator, documented).
  *
  * sklearn-interface parity: `label` ∈ {1, −1} (−1 = anomaly), a decision
  * score, and a boolean flag for the ensemble vote (SURVEY §2.10).
  */
object Mahalanobis {

  final case class Model(cols: Seq[String], mean: Array[Double],
      covInv: Array[Array[Double]]) {

    /** Squared Mahalanobis distance as a codegen-friendly Column. */
    def distSq: Column = {
      val d = cols.size
      val centered = cols.indices.map(i => col(cols(i)) - lit(mean(i)))
      val terms = for {
        i <- 0 until d
        j <- 0 until d
        if covInv(i)(j) != 0.0
      } yield centered(i) * centered(j) * lit(covInv(i)(j))
      terms.reduceOption(_ + _).getOrElse(lit(0.0))
    }
  }

  /** Fused moment pass → (n, sums, cross-moments) → covariance. `ddof = 0`
    * is the MLE covariance (what a fitted Gaussian uses).
    */
  def fit(df: DataFrame, cols: Seq[String]): Model = {
    val d = cols.size
    // shared cast-safe moment pass (Moments.fused) — integer feature
    // columns fit instead of ClassCastException-ing on LongType sums
    val (n, mean, cov) = Moments.fused(df, cols)
    require(n > d, s"need > $d complete rows to fit, got ${n.toLong}")
    Model(cols, mean, invert(cov))
  }

  /** Score + flag. `robust = true` adds one trimmed refit (drop the
    * contamination tail, refit moments on the kept rows) before the final
    * scoring pass — the 1-step reweighting that gives MCD most of its
    * resistance to the outliers it is trying to find.
    */
  def fitScore(df: DataFrame, cols: Seq[String], contamination: Double = 0.1,
      robust: Boolean = false, approx: Boolean = true,
      scoreCol: String = "maha_dist_sq",
      flagCol: String = "maha_anomaly"): DataFrame = {
    // approx=true rides the one-pass quantile sketch (the 10^12-row path);
    // exact percentile only where a test-scale parity contract needs it
    // (same convention as RobustZ/IqrOutliers)
    def pct(c: String, p: Double) =
      if (approx) expr(s"percentile_approx($c, $p, 10000)")
      else expr(s"percentile($c, $p)")
    val first = fit(df, cols)
    val model = if (!robust) first else {
      // trimmed refit: recompute moments over the core (1-contamination) mass
      val scored = df.na.drop(cols).withColumn("__d", first.distSq)
      val cutV = scored.agg(pct("__d", 1 - contamination).as("c"))
        .collect()(0).getAs[Double]("c")
      fit(scored.where(col("__d") <= cutV).drop("__d"), cols)
    }
    val scored = df.withColumn(scoreCol, model.distSq)
    val thr = scored.na.drop(cols).agg(
      pct(scoreCol, 1 - contamination).as("t"))
      .collect()(0).getAs[Double]("t")
    scored
      .withColumn(flagCol, coalesce(col(scoreCol) > thr, lit(false)))
      .withColumn(s"${flagCol}_label",
        when(col(flagCol), -1).otherwise(1)) // sklearn {1,-1} interface
  }

  /** Gauss-Jordan inverse with partial pivoting; a degenerate pivot
    * (constant/collinear direction — after elimination its pivot collapses
    * to ~the ridge floor) is pseudo-ignored Moore-Penrose-style: its row
    * and column are zeroed in BOTH the working matrix and the inverse, so
    * that direction contributes 0 to the distance instead of a ~1/ridge
    * amplification (or Infinity when every column is constant and the
    * ridge is subnormal).
    */
  private[ml] def invert(a0: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    // ridge floor relative to the largest variance
    val ridge = 1e-9 * math.max(1e-300, (0 until d).map(i => a(i)(i)).max)
    (0 until d).foreach(i => a(i)(i) += ridge)
    // a direction whose post-elimination pivot is within an order of the
    // ridge floor carries ~no variance signal — treat as degenerate
    val degenerateTol = math.max(1e-300, 10.0 * ridge)
    val inv = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (c <- 0 until d) {
      val p = (c until d).maxBy(r => math.abs(a(r)(c)))
      if (math.abs(a(p)(c)) < degenerateTol) {
        // degenerate direction: zero its row+column everywhere (pseudo-
        // inverse "ignore"), never divide by the floor
        var t = 0
        while (t < d) {
          a(c)(t) = 0.0; a(t)(c) = 0.0
          inv(c)(t) = 0.0; inv(t)(c) = 0.0
          t += 1
        }
      } else {
        val t = a(c); a(c) = a(p); a(p) = t
        val ti = inv(c); inv(c) = inv(p); inv(p) = ti
        val piv = a(c)(c)
        var j = 0
        while (j < d) { a(c)(j) /= piv; inv(c)(j) /= piv; j += 1 }
        var r = 0
        while (r < d) {
          if (r != c && a(r)(c) != 0.0) {
            val f = a(r)(c)
            var k = 0
            while (k < d) {
              a(r)(k) -= f * a(c)(k); inv(r)(k) -= f * inv(c)(k); k += 1
            }
          }
          r += 1
        }
      }
    }
    inv
  }
}
