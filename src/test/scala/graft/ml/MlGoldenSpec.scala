package graft.ml

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** Golden parity for the ml/ detector family against the independent
  * Python references in tools/ml_reference.py (numpy/pure-python
  * reimplementations of the published algorithms, replaying the same
  * deterministic PRNG streams) — the same two-leg differential scheme
  * that pins STL against tools/stl_reference.py.
  *
  *  - lof.csv is ALSO sklearn-equal: on this fixture all pairwise
  *    distances are distinct, so the with-ties Breunig neighbourhood
  *    equals sklearn's exactly-k brute-force neighbourhood and the
  *    values are what LocalOutlierFactor(n_neighbors=20).fit(X) yields
  *    as -negative_outlier_factor_.
  *  - iforest.csv replays the xorshift64/Fisher-Yates/uniform-split tree
  *    build draw-for-draw; only libm log/pow ulps separate the legs.
  *  - ocsvm.csv replays the RFF + Pegasos SGD; the SGD crosses
  *    data-dependent margin branches, so libm cos/log last-ulp
  *    differences can flip a step and diffuse — hence the looser
  *    relative tolerance (still far below any algorithmic divergence).
  *
  * No SparkSession needed: these gate the driver-side kernels the Spark
  * operators broadcast (q55/q57) or run per-group (q56).
  */
class MlGoldenSpec extends AnyFunSuite {

  /** MlSpec.cloud closed form — keep in sync with tools/ml_reference.py. */
  private def u(i: Int, salt: Int): Double =
    ((i * 2654435761L + salt * 1013904223L) & 0x7fffffff) / Int.MaxValue.toDouble

  private lazy val cloud: Array[Array[Double]] =
    ((0 until 500).map(i => Array(2.0 * u(i, 1) - 1.0, 2.0 * u(i, 2) - 1.0)) ++
      Seq(Array(8.0, 8.0), Array(-9.0, 7.5), Array(7.0, -8.5))).toArray

  private def golden(name: String): Array[Double] = {
    val in = getClass.getResourceAsStream(s"/goldens/$name")
    require(in != null, s"golden $name missing — run tools/ml_reference.py")
    val src = Source.fromInputStream(in)
    try src.getLines().drop(1).map(_.split(",")(1).toDouble).toArray
    finally src.close()
  }

  test("LOF matches the exact Breunig/sklearn-brute golden to 1e-9") {
    val expected = golden("lof.csv")
    val got = Neighborhood.lofKernel(cloud, k = 20)
    assert(got.length == expected.length)
    var worst = 0.0
    got.indices.foreach { i =>
      val diff = math.abs(got(i) - expected(i))
      worst = math.max(worst, diff)
      assert(diff < 1e-9, s"point $i: ${got(i)} vs ${expected(i)}")
    }
    info(f"worst |Δlof| = $worst%.3g over ${got.length} points")
  }

  test("IsolationForest scores match the Python PRNG-replay golden to 1e-9") {
    val expected = golden("iforest.csv")
    val f = IsolationForest.fit(cloud, nTrees = 100, sampleSize = 256,
      seed = 42L)
    var worst = 0.0
    cloud.indices.foreach { i =>
      val got = f.score(cloud(i))
      val diff = math.abs(got - expected(i))
      worst = math.max(worst, diff)
      assert(diff < 1e-9, s"point $i: $got vs ${expected(i)}")
    }
    info(f"worst |Δscore| = $worst%.3g over ${cloud.length} points")
  }

  test("OCSVM decisions match the Python PRNG-replay golden (1e-6 relative)") {
    val expected = golden("ocsvm.csv")
    val m = OneClassSvm.fit(cloud, nu = 0.1, nFeatures = 64, epochs = 30,
      seed = 42L)
    val scaleRef = expected.map(math.abs).max // decision magnitude scale
    var worst = 0.0
    cloud.indices.foreach { i =>
      val p = m.phi(cloud(i))
      val got = p.indices.map(j => m.w(j) * p(j)).sum - m.rho
      val diff = math.abs(got - expected(i)) / scaleRef
      worst = math.max(worst, diff)
      assert(diff < 1e-6, s"point $i: $got vs ${expected(i)} (rel $diff)")
    }
    info(f"worst relative Δdecision = $worst%.3g")
  }
}
