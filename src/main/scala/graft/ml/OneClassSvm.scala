package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ν-one-class SVM with an RBF kernel approximated by random Fourier
  * features (reference `src/anomaly_detection.py:129-174`: OneClassSVM
  * with nu=0.1, rbf kernel).
  *
  * Published algorithms, composed:
  *  - RFF (Rahimi & Recht 2007): φ(x) = sqrt(2/D)·cos(Wx + b) with
  *    W ~ N(0, 2γ·I), b ~ U[0, 2π) approximates k(x,y) = exp(−γ|x−y|²);
  *  - ν-OCSVM primal (Schölkopf et al. 2001) trained by Pegasos-style
  *    stochastic subgradient descent on the driver sample (the same
  *    fit-on-sample / score-at-scale shape as IsolationForest);
  *  - γ defaults to sklearn's 'scale': 1 / (d · Var(X)) over the sample.
  *
  * Spark-first payoff: the decision function w·φ(x) − ρ is a PURE Column —
  * D cosine terms over literal frequencies — so scoring rides whole-stage
  * codegen with zero UDFs (same trick as the Mahalanobis quadratic form;
  * D = 64 keeps the expression tree far below the Janino limits the LSH
  * bucket expression hit in round 2).
  *
  * Honest caveats, documented rather than hidden: this is the RFF
  * APPROXIMATION of the RBF one-class SVM (kernel error O(1/sqrt(D))), and
  * SGD reaches the ν-property (≈ν fraction of margin violations)
  * approximately — MlSpec gates both behaviours.
  */
object OneClassSvm {

  final case class Model(cols: Seq[String], w: Array[Double], rho: Double,
      freqs: Array[Array[Double]], phases: Array[Double]) {
    private val d = cols.size
    private val scale = math.sqrt(2.0 / w.length)

    def phi(x: Array[Double]): Array[Double] =
      Array.tabulate(w.length) { j =>
        var s = phases(j)
        var i = 0
        while (i < d) { s += freqs(j)(i) * x(i); i += 1 }
        scale * math.cos(s)
      }

    /** decision(x) = w·φ(x) − ρ ; ≥ 0 inlier, < 0 anomaly. */
    def decision: Column = {
      val terms = w.indices.map { j =>
        val arg = cols.indices
          .map(i => col(cols(i)) * lit(freqs(j)(i)))
          .reduce(_ + _) + lit(phases(j))
        cos(arg) * lit(scale * w(j))
      }
      terms.reduce(_ + _) - lit(rho)
    }
  }

  private final class XorShift(seed0: Long) {
    private var s: Long = if (seed0 == 0) 0x2545f4914f6cdd1dL else seed0
    def nextLong(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    def nextInt(bound: Int): Int = (((nextLong() >>> 1) % bound).toInt)
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    /** Box–Muller */
    def nextGaussian(): Double = {
      var u1 = nextDouble()
      if (u1 < 1e-300) u1 = 1e-300
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * nextDouble())
    }
  }

  /** Fit on a driver-held sample. `gamma <= 0` → sklearn 'scale' default. */
  def fit(data: Array[Array[Double]], nu: Double = 0.1, nFeatures: Int = 64,
      gamma: Double = -1.0, epochs: Int = 30, seed: Long = 42L): Model = {
    require(data.nonEmpty && nu > 0 && nu <= 1)
    require(epochs >= 1, s"epochs must be >= 1, got $epochs (0 would average over nothing -> NaN weights)")
    val n = data.length
    val d = data(0).length
    val rng = new XorShift(seed)
    val g = if (gamma > 0) gamma else {
      // 'scale': 1 / (d * Var(X)) with Var over all features pooled
      val flat = data.flatten
      val mean = flat.sum / flat.length
      val v = flat.map(x => (x - mean) * (x - mean)).sum / flat.length
      1.0 / (d * math.max(v, 1e-12))
    }
    // W ~ N(0, 2γ I): cos(w·(x−y)) expectation reproduces exp(−γ|x−y|²)
    val sd = math.sqrt(2.0 * g)
    val freqs = Array.fill(nFeatures)(Array.fill(d)(rng.nextGaussian() * sd))
    val phases = Array.fill(nFeatures)(rng.nextDouble() * 2.0 * math.Pi)
    val model0 = Model(Seq.fill(d)(""), new Array[Double](nFeatures), 0.0,
      freqs, phases)
    val phis = data.map(model0.phi)

    // Pegasos-style SGD on the ν-OCSVM primal:
    //   min ½|w|² + 1/(νn) Σ max(0, ρ − w·φᵢ) − ρ
    // per-sample subgradients; averaged iterates over the final epoch.
    val w = new Array[Double](nFeatures)
    var rho = 0.0
    val wAvg = new Array[Double](nFeatures)
    var rhoAvg = 0.0
    var nAvg = 0
    var t = 0
    val order = Array.tabulate(n)(identity)
    (0 until epochs).foreach { ep =>
      // deterministic shuffle per epoch
      var i = n - 1
      while (i > 0) {
        val j = rng.nextInt(i + 1)
        val tmp = order(i); order(i) = order(j); order(j) = tmp
        i -= 1
      }
      order.foreach { idx =>
        t += 1
        val eta = 1.0 / t
        val p = phis(idx)
        var m = 0.0
        var k = 0
        while (k < nFeatures) { m += w(k) * p(k); k += 1 }
        val violated = m < rho
        k = 0
        while (k < nFeatures) {
          w(k) -= eta * (w(k) - (if (violated) p(k) / nu else 0.0))
          k += 1
        }
        rho -= eta * (-1.0 + (if (violated) 1.0 / nu else 0.0))
        if (ep == epochs - 1) {
          k = 0
          while (k < nFeatures) { wAvg(k) += w(k); k += 1 }
          rhoAvg += rho
          nAvg += 1
        }
      }
    }
    var k = 0
    while (k < nFeatures) { wAvg(k) /= nAvg; k += 1 }
    Model(model0.cols, wAvg, rhoAvg / nAvg, freqs, phases)
  }

  /** Fit on the deterministic hash-reservoir sample, score every row as a
    * single codegen projection, flag decision < 0 (sklearn −1 semantics).
    */
  def fitScore(df: DataFrame, cols: Seq[String], nu: Double = 0.1,
      nFeatures: Int = 64, epochs: Int = 30, seed: Long = 42L,
      trainRows: Int = 4096, scoreCol: String = "ocsvm_decision",
      flagCol: String = "ocsvm_anomaly"): DataFrame = {
    val data = IsolationForest.deterministicSample(df, cols, trainRows)
    val m0 = fit(data, nu, nFeatures, epochs = epochs, seed = seed)
    val model = m0.copy(cols = cols)
    df.withColumn(scoreCol, model.decision)
      .withColumn(flagCol, coalesce(col(scoreCol) < 0, lit(false)))
      .withColumn(s"${flagCol}_label", when(col(flagCol), -1).otherwise(1))
  }
}
