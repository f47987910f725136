package graft.ml

import IsolationForest.{Forest, Tree}

/** Pinned (compile-time constant) detector models whose SCORING paths get
  * full DuckDB hash-checked twins (q58/q59 in SparkEntry).
  *
  * Why this exists: the fitted q55/q57 detectors are `oracleExempt` —
  * random isolation trees and SGD-trained SVM weights have no SQL twin, so
  * the driver can only rows-check them and the FIT correctness rests on
  * MlGoldenSpec's PRNG-replay goldens. But the SCORING half of each
  * detector — the array-encoded-tree traversal UDF
  * (IsolationForest.scoreWith, the one sanctioned UDF in the engine) and
  * the RFF cosine-expansion Column (OneClassSvm.Model.decision) — is a
  * deterministic function of (model, row) and IS SQL-expressible once the
  * model is a constant. Pinning one small model per detector lets the
  * driver hash-check the exact production scoring code end-to-end, so each
  * detector rests on two independent legs: golden-gated fit + hash-checked
  * scoring (reference semantics: `src/anomaly_detection.py:38-83` score
  * path, `:129-174` decision path).
  *
  * The SQL generators below mirror the Scala evaluation ORDER exactly
  * (same literal doubles via shortest-round-trip printing, same
  * left-associated sums), so the only cross-engine drift is the ≤1-ulp
  * libm difference in pow/cos — absorbed by round(…, 4) on both sides,
  * the same convention the q56 LOF twin uses.
  */
object PinnedScoring {

  /** Two hand-built isolation trees over features (x0, x1); node arrays in
    * IsolationForest.Tree encoding. sampleSize=256 matches the production
    * default so c(ψ) in the score normalization is the real constant.
    */
  val forest: Forest = Forest(Seq(
    Tree(
      feature = Array(0, -1, 1, -1, -1),
      split = Array(0.5, 0.0, 11.5, 0.0, 0.0),
      left = Array(1, -1, 3, -1, -1),
      right = Array(2, -1, 4, -1, -1),
      size = Array(256, 100, 156, 80, 76)),
    Tree(
      feature = Array(1, 0, -1, -1, -1),
      split = Array(5.5, -1.25, 0.0, 0.0, 0.0),
      left = Array(1, 3, -1, -1, -1),
      right = Array(2, 4, -1, -1, -1),
      size = Array(256, 60, 196, 5, 55))
  ), sampleSize = 256)

  /** Pinned ν-OCSVM model (D = 8 random-Fourier features over 2 inputs):
    * weights/frequencies/phases are arbitrary fixed constants in the
    * magnitude range a real fit produces.
    */
  val ocsvm: OneClassSvm.Model = OneClassSvm.Model(
    cols = Seq("value", "hod"),
    w = Array(0.7, -0.3, 0.45, 0.2, -0.6, 0.15, 0.33, -0.21),
    rho = 0.25,
    freqs = Array(
      Array(0.6, -1.1), Array(-0.4, 0.9), Array(1.3, 0.2),
      Array(-0.8, -0.5), Array(0.25, 1.7), Array(-1.5, 0.35),
      Array(0.95, -0.75), Array(0.1, 1.05)),
    phases = Array(0.5, 2.1, 3.7, 1.2, 4.4, 0.9, 5.6, 2.8))

  /** DuckDB expression computing `forest.score(x)` where x_i is the SQL
    * expression `colExprs(i)`. Each leaf's depth + c(size) is ONE
    * Scala-computed literal (exact in both engines); per-tree totals are
    * summed left-to-right like Forest.score's loop; pow(2, ·) is the only
    * libm call.
    */
  def forestScoreSql(colExprs: Seq[String]): String = {
    def node(t: Tree, i: Int, depth: Int): String =
      if (t.feature(i) < 0)
        (depth + IsolationForest.avgPathLength(t.size(i))).toString
      else
        s"(CASE WHEN ${colExprs(t.feature(i))} < ${t.split(i)} " +
          s"THEN ${node(t, t.left(i), depth + 1)} " +
          s"ELSE ${node(t, t.right(i), depth + 1)} END)"
    val totals = forest.trees.map(t => node(t, 0, 0)).mkString(" + ")
    val cpsi = IsolationForest.avgPathLength(forest.sampleSize)
    s"pow(2.0, -(($totals) / ${forest.trees.length}.0) / $cpsi)"
  }

  /** DuckDB expression computing `ocsvm.decision` with inputs bound to
    * `colExprs`: Σ_j cos(Σ_i x_i·f_ji + p_j)·(scale·w_j) − ρ, with the
    * same left-associated sum order as Model.decision's Column tree and
    * scale·w_j premultiplied in Scala exactly as decision does.
    */
  def ocsvmDecisionSql(colExprs: Seq[String]): String = {
    val m = ocsvm
    val scale = math.sqrt(2.0 / m.w.length)
    val terms = m.w.indices.map { j =>
      val arg = colExprs.indices
        .map(i => s"${colExprs(i)} * (${m.freqs(j)(i)})")
        .mkString(" + ") + s" + (${m.phases(j)})"
      s"cos($arg) * (${scale * m.w(j)})"
    }
    s"(${terms.mkString(" + ")}) - (${m.rho})"
  }
}
