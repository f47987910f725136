package graft.ml

import org.apache.spark.sql.functions._
import graft.GraftSuite

/** Detector-family contract tests (SURVEY §2.10 interface: labels in
  * {1,−1}, scores, flags for the ensemble vote). Fixtures are
  * deterministic closed forms — no RNG over test data.
  */
class MlSpec extends GraftSuite {
  import spark.implicits._

  /** deterministic uniform-ish in [0,1) */
  private def u(i: Int, salt: Int): Double =
    ((i * 2654435761L + salt * 1013904223L) & 0x7fffffff) / Int.MaxValue.toDouble

  // 500 inliers around (0,0) + 3 far outliers
  private lazy val cloud = {
    val inliers = (0 until 500).map(i =>
      ("c0", i, 2.0 * u(i, 1) - 1.0, 2.0 * u(i, 2) - 1.0))
    val outliers = Seq(("c0", 500, 8.0, 8.0), ("c0", 501, -9.0, 7.5),
      ("c0", 502, 7.0, -8.5))
    (inliers ++ outliers).toDF("conv_id", "turn_idx", "x", "y").cache()
  }
  private val outlierIdx = Set(500, 501, 502)

  // ---- Mahalanobis / EllipticEnvelope ------------------------------------

  test("invert: A * inv(A) ≈ I for a well-conditioned covariance") {
    val a = Array(Array(4.0, 1.0, 0.5), Array(1.0, 3.0, 0.2),
      Array(0.5, 0.2, 2.0))
    val inv = Mahalanobis.invert(a)
    for (i <- 0 until 3; j <- 0 until 3) {
      val prod = (0 until 3).map(k => a(i)(k) * inv(k)(j)).sum
      assert(math.abs(prod - (if (i == j) 1.0 else 0.0)) < 1e-6,
        s"(A·A⁻¹)($i,$j) = $prod")
    }
  }

  test("mahalanobis distSq matches the analytic form for independent features") {
    // x ~ {-2, 2} (var 4), y ~ {-3, 3} (var 9), cov 0 ⇒
    // distSq = x²/4 + y²/9 at the (0,0) mean
    val df = Seq((-2.0, -3.0), (-2.0, 3.0), (2.0, -3.0), (2.0, 3.0))
      .toDF("x", "y")
    val m = Mahalanobis.fit(df, Seq("x", "y"))
    assert(m.mean.forall(v => math.abs(v) < 1e-12))
    val scored = df.withColumn("d", m.distSq).select("x", "y", "d").collect()
    scored.foreach { r =>
      val expected = math.pow(r.getDouble(0), 2) / 4.0 +
        math.pow(r.getDouble(1), 2) / 9.0
      assert(math.abs(r.getDouble(2) - expected) < 1e-6,
        s"(${r.getDouble(0)},${r.getDouble(1)}): ${r.getDouble(2)} vs $expected")
    }
  }

  test("mahalanobis fitScore flags exactly the planted outliers (plain + robust)") {
    Seq(false, true).foreach { robust =>
      val got = Mahalanobis.fitScore(cloud, Seq("x", "y"),
        contamination = 3.0 / 503, robust = robust)
        .where(col("maha_anomaly")).select("turn_idx")
        .as[Int].collect().toSet
      assert(got == outlierIdx, s"robust=$robust got $got")
    }
    // sklearn label interface
    val labels = Mahalanobis.fitScore(cloud, Seq("x", "y"))
      .select("maha_anomaly_label").distinct().as[Int].collect().toSet
    assert(labels.subsetOf(Set(1, -1)))
  }

  test("mahalanobis: singular covariance (constant column) doesn't throw") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0), (4.0, 5.0))
      .toDF("x", "c")
    val m = Mahalanobis.fit(df, Seq("x", "c"))
    val d = df.withColumn("d", m.distSq).select("d").as[Double].collect()
    assert(d.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("mahalanobis: degenerate directions are IGNORED, not ridge-amplified") {
    // constant column: distSq must equal the 1-d (x-μ)²/var_pop(x) form —
    // the constant direction contributes 0 (Moore-Penrose ignore), not
    // ~1/ridge
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0), (4.0, 5.0))
      .toDF("x", "c")
    val m = Mahalanobis.fit(df, Seq("x", "c"))
    val got = df.withColumn("d", m.distSq)
      .select("x", "d").as[(Double, Double)].collect().toMap
    // mean 2.5, var_pop 1.25
    Seq(1.0 -> 1.8, 2.0 -> 0.2, 3.0 -> 0.2, 4.0 -> 1.8).foreach {
      case (x, expected) =>
        assert(math.abs(got(x) - expected) < 1e-6, s"x=$x d=${got(x)}")
    }
    // ALL columns constant (ridge floor subnormal): finite zero distances
    val allConst = Seq((5.0, 7.0), (5.0, 7.0), (5.0, 7.0)).toDF("a", "b")
    val m2 = Mahalanobis.fit(allConst, Seq("a", "b"))
    val d2 = allConst.withColumn("d", m2.distSq).select("d").as[Double].collect()
    assert(d2.forall(v => v == 0.0), d2.mkString(","))
    // collinear pair: the redundant direction is dropped, distances finite
    val collinear = (1 to 8).map(i => (i.toDouble, 2.0 * i)).toDF("x", "y")
    val m3 = Mahalanobis.fit(collinear, Seq("x", "y"))
    val d3 = collinear.withColumn("d", m3.distSq).select("d").as[Double].collect()
    assert(d3.forall(v => !v.isNaN && !v.isInfinite && v < 1e6), d3.mkString(","))
  }

  // ---- IsolationForest ----------------------------------------------------

  test("iforest: planted outliers score highest; scores in (0,1)") {
    val data = cloud.select("x", "y").collect()
      .map(r => Array(r.getDouble(0), r.getDouble(1)))
    val f = IsolationForest.fit(data, nTrees = 100, sampleSize = 256, seed = 42L)
    val scores = data.map(f.score)
    assert(scores.forall(s => s > 0.0 && s < 1.0))
    val top3 = scores.zipWithIndex.sortBy(-_._1).take(3).map(_._2).toSet
    assert(top3 == outlierIdx, s"top-3 by score = $top3")
    // outliers clearly in the anomaly half, inlier bulk clearly below
    assert(outlierIdx.forall(i => scores(i) > 0.6))
    assert(scores.zipWithIndex.filterNot(x => outlierIdx(x._2))
      .count(_._1 > 0.6) < 10)
  }

  test("iforest: same seed → identical forest; different seed → different scores") {
    val data = (0 until 300).map(i =>
      Array(u(i, 3) * 4, u(i, 4) * 4)).toArray
    val s1 = IsolationForest.fit(data, 50, 128, seed = 7L)
    val s2 = IsolationForest.fit(data, 50, 128, seed = 7L)
    val s3 = IsolationForest.fit(data, 50, 128, seed = 8L)
    val probe = Array(0.1, 3.9)
    assert(s1.score(probe) == s2.score(probe))
    assert(s1.score(probe) != s3.score(probe))
  }

  test("iforest avgPathLength: c(n) grows ~ log n, c(1) = 0") {
    assert(IsolationForest.avgPathLength(1) == 0.0)
    val c10 = IsolationForest.avgPathLength(10)
    val c100 = IsolationForest.avgPathLength(100)
    val c1000 = IsolationForest.avgPathLength(1000)
    assert(c10 < c100 && c100 < c1000)
    assert(math.abs((c1000 - c100) - (c100 - c10)) < 2.0) // log-ish spacing
  }

  test("iforest fitScore: DataFrame path flags the contamination tail; nulls pass through") {
    val withNull = cloud.union(
      Seq(("c0", 503, Double.NaN, 0.0)).toDF("conv_id", "turn_idx", "x", "y")
        .withColumn("x", lit(null).cast("double")))
    val scored = IsolationForest.fitScore(withNull, Seq("x", "y"),
      contamination = 3.0 / 503, trainRows = 503)
    val flagged = scored.where(col("iforest_anomaly")).select("turn_idx")
      .as[Int].collect().toSet
    assert(flagged == outlierIdx, s"got $flagged")
    val nullRow = scored.where(col("turn_idx") === 503).collect()(0)
    assert(nullRow.isNullAt(nullRow.fieldIndex("iforest_score")))
    assert(!nullRow.getAs[Boolean]("iforest_anomaly"))
  }

  // ---- OneClassSVM (RFF) --------------------------------------------------

  test("ocsvm: RFF features approximate the RBF kernel (Rahimi–Recht bound)") {
    val g = 0.5
    val m = OneClassSvm.fit(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)), // data only seeds gamma; pass explicit
      nFeatures = 4096, gamma = g, epochs = 1, seed = 3L)
    def k(x: Array[Double], y: Array[Double]): Double = {
      val d2 = x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
      math.exp(-g * d2)
    }
    val pairs = Seq(
      (Array(0.0, 0.0), Array(0.0, 0.0)),
      (Array(0.0, 0.0), Array(1.0, 0.0)),
      (Array(0.5, -1.0), Array(-0.5, 1.0)),
      (Array(2.0, 2.0), Array(-2.0, -2.0)))
    pairs.foreach { case (x, y) =>
      val approx = m.phi(x).zip(m.phi(y)).map { case (a, b) => a * b }.sum
      assert(math.abs(approx - k(x, y)) < 0.05,
        s"φ(x)·φ(y)=$approx vs k=${k(x, y)}")
    }
  }

  test("ocsvm: planted outliers get negative decisions, bulk non-negative-ish; ν bounds flags") {
    val scored = OneClassSvm.fitScore(cloud, Seq("x", "y"), nu = 0.1,
      trainRows = 503)
    val rows = scored.select("turn_idx", "ocsvm_decision", "ocsvm_anomaly")
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    outlierIdx.foreach { i =>
      assert(rows(i)._1 < 0 && rows(i)._2, s"outlier $i decision=${rows(i)._1}")
    }
    val flaggedFrac = rows.values.count(_._2).toDouble / rows.size
    // ν=0.1 bounds the training outlier fraction ≈ 10%; allow SGD slack
    assert(flaggedFrac > 0.01 && flaggedFrac < 0.35, s"flagged $flaggedFrac")
    val labels = scored.select("ocsvm_anomaly_label").distinct()
      .as[Int].collect().toSet
    assert(labels.subsetOf(Set(1, -1)))
  }

  test("ocsvm: same seed reproduces identical decisions") {
    def run() = OneClassSvm.fitScore(cloud, Seq("x", "y"), seed = 11L)
      .agg(sum(abs(col("ocsvm_decision")))).collect()(0).getDouble(0)
    assert(run() == run())
  }

  // ---- LOF ----------------------------------------------------------------

  test("lof kernel: isolated point ≫ 1, uniform-grid inliers ≈ 1, duplicates = 1") {
    // 10x10 unit grid + a far point
    val grid = (for { i <- 0 until 10; j <- 0 until 10 }
      yield Array(i.toDouble, j.toDouble)).toArray
    val xs = grid :+ Array(30.0, 30.0)
    val scores = Neighborhood.lofKernel(xs, k = 5)
    assert(scores.last > 3.0, s"outlier lof=${scores.last}")
    // interior grid points are locally uniform
    val interior = for { i <- 2 until 8; j <- 2 until 8 } yield scores(i * 10 + j)
    interior.foreach(s => assert(s > 0.8 && s < 1.2, s"interior lof=$s"))
    // all-identical points: defined, not NaN/∞
    val dup = Neighborhood.lofKernel(Array.fill(6)(Array(1.0, 1.0)), k = 3)
    assert(dup.forall(s => !s.isNaN && !s.isInfinite))
  }

  test("lof kthSmallest: matches full sort on adversarial layouts") {
    val cases = Seq(
      Array(3.0, 1.0, 2.0),
      Array(5.0, 5.0, 5.0, 5.0),
      Array(9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 3.0),
      Array.tabulate(101)(i => ((i * 37) % 101).toDouble),
      Array.tabulate(64)(i => (i % 4).toDouble)) // heavy ties
    cases.foreach { a =>
      val sorted = a.clone().sorted
      (1 to a.length).foreach { k =>
        val got = Neighborhood.kthSmallest(a.clone(), a.length, k)
        assert(got == sorted(k - 1), s"k=$k on ${a.take(8).mkString(",")}…")
      }
    }
  }

  test("lof kernel: 20k-row group runs in O(n·k) memory (no n² matrix)") {
    // 3-cluster deterministic cloud + 5 far outliers. The pre-r4 kernel
    // allocated an n×n distance matrix (20000² doubles = 3.2 GB) here;
    // the streaming kernel keeps one O(n) row buffer + O(k) neighbor
    // lists and completes comfortably inside the test heap.
    val n = 20000
    val xs = Array.tabulate(n) { i =>
      if (i >= n - 5) Array(500.0 + i, 500.0 - i)
      else {
        val c = i % 3
        Array(c * 30.0 + 4 * u(i, 21) - 2, c * 10.0 + 4 * u(i, 22) - 2)
      }
    }
    val scores = Neighborhood.lofKernel(xs, k = 20)
    assert(scores.length == n)
    assert(scores.forall(s => !s.isNaN))
    val top5 = scores.zipWithIndex.sortBy(-_._1).take(5).map(_._2).toSet
    assert(top5 == (n - 5 until n).toSet, s"top-5 = $top5")
  }

  test("lof/dbscan: null feature rows get null scores, not a crash") {
    val good = (0 until 30).map(i => ("c", i, Option(u(i, 13) * 2), Option(u(i, 14) * 2)))
    val bad = Seq(("c", 30, Option.empty[Double], Option(1.0)),
      ("c", 31, Option(1.0), Option.empty[Double]))
    val df = (good ++ bad).toDF("conv_id", "turn_idx", "x", "y")
    val lofGot = Neighborhood.lof(df, "conv_id", "turn_idx", Seq("x", "y"), k = 5)
      .collect().map(r => r.getInt(1) -> !r.isNullAt(2)).toMap
    assert(lofGot.size == 32)
    assert(!lofGot(30) && !lofGot(31))
    assert((0 until 30).forall(lofGot(_)))
    val dbGot = Neighborhood.dbscan(df, "conv_id", "turn_idx", Seq("x", "y"),
      eps = 3.0, minSamples = 3)
      .collect().map(r => r.getInt(1) -> !r.isNullAt(2)).toMap
    assert(dbGot.size == 32 && !dbGot(30) && !dbGot(31))
    assert((0 until 30).forall(dbGot(_)))
  }

  test("lof DataFrame: per-conversation groups, outlier flagged, oversize group → null") {
    val g1 = (0 until 60).map(i => ("a", i, u(i, 5) * 2, u(i, 6) * 2))
    val g1out = Seq(("a", 60, 25.0, 25.0))
    val g2 = (0 until 40).map(i => ("b", i, 5 + u(i, 7), 5 + u(i, 8)))
    val df = (g1 ++ g1out ++ g2).toDF("conv_id", "turn_idx", "x", "y")
    val got = Neighborhood.lof(df, "conv_id", "turn_idx", Seq("x", "y"), k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.size == 101)
    assert(got(("a", 60)).get > 3.0)
    assert(got(("b", 20)).get < 1.5)
    // oversize group → nulls, no blowup
    val big = (0 until 50).map(i => ("z", i, u(i, 9), u(i, 10)))
      .toDF("conv_id", "turn_idx", "x", "y")
    val nulls = Neighborhood.lof(big, "conv_id", "turn_idx", Seq("x", "y"),
      k = 5, maxGroup = 10).where(col("lof").isNotNull).count()
    assert(nulls == 0)
  }

  // ---- DBSCAN -------------------------------------------------------------

  test("dbscan kernel: two clusters + noise, chain connectivity, border points") {
    // cluster A: 8 points spaced 0.3 (chained within eps 0.5)
    val a = (0 until 8).map(i => Array(i * 0.3, 0.0))
    // cluster B: 8 points around (10, 10)
    val b = (0 until 8).map(i => Array(10.0 + (i % 4) * 0.3, 10.0 + (i / 4) * 0.3))
    // noise: 2 isolated points
    val noise = Seq(Array(5.0, 5.0), Array(-5.0, 5.0))
    val labels = Neighborhood.dbscanKernel((a ++ b ++ noise).toArray,
      eps = 0.5, minSamples = 3)
    val la = labels.slice(0, 8).toSet
    val lb = labels.slice(8, 16).toSet
    assert(la.size == 1 && !la.contains(-1), s"cluster A labels $la")
    assert(lb.size == 1 && !lb.contains(-1), s"cluster B labels $lb")
    assert(la != lb)
    assert(labels.slice(16, 18).forall(_ == -1))
  }

  test("dbscan kernel: dense 20k-point group stays O(n) memory, one cluster") {
    // regression (VERDICT r4 item 3): the stored-neighbor-list kernel held
    // up to n² ints (~1.6 GB at n=20k, every point within eps) in one
    // task; the count-and-recompute kernel holds O(n). A dense group is
    // the worst case — if lists were still materialized this allocates
    // 20k arrays of 20k ints and blows past any sane per-task budget.
    val n = 20000
    val xs = Array.tabulate(n)(i => Array(i * 1e-6, 0.0)) // all within eps
    val before = {
      val rt = Runtime.getRuntime; rt.gc()
      rt.totalMemory() - rt.freeMemory()
    }
    val labels = Neighborhood.dbscanKernel(xs, eps = 0.5, minSamples = 5)
    val after = {
      val rt = Runtime.getRuntime
      rt.totalMemory() - rt.freeMemory()
    }
    assert(labels.forall(_ == 0), "one dense cluster, no noise")
    // generous bound: O(n) state is ~KBs; the old kernel needed ~1.6 GB.
    // totalMemory-freeMemory is noisy (other allocations, GC timing), so
    // assert only that we did not retain hundreds of MB
    assert(after - before < 400L * 1024 * 1024,
      s"dbscanKernel retained ${(after - before) / 1024 / 1024} MB")
  }

  test("dbscan: noise ⟺ non-core with no core neighbor (oracle-checkable form)") {
    val xs = ((0 until 30).map(i => Array(u(i, 11) * 2)) ++
      Seq(Array(50.0), Array(80.0))).toArray
    val eps = 0.4
    val minS = 4
    val labels = Neighborhood.dbscanKernel(xs, eps, minS)
    def d(i: Int, j: Int) = math.abs(xs(i)(0) - xs(j)(0))
    val core = xs.indices.map(i => xs.indices.count(j => d(i, j) <= eps) >= minS)
    xs.indices.foreach { i =>
      val expectNoise = !core(i) && !xs.indices.exists(j => core(j) && d(i, j) <= eps)
      assert((labels(i) == -1) == expectNoise, s"point $i: label=${labels(i)}")
    }
  }

  test("dbscan DataFrame: per-conversation labels, sklearn-style −1 noise") {
    val dense = (0 until 20).map(i => ("c", i, i * 0.1))
    val lone = Seq(("c", 20, 99.0))
    val df = (dense ++ lone).toDF("conv_id", "turn_idx", "v")
    val got = Neighborhood.dbscan(df, "conv_id", "turn_idx", Seq("v"),
      eps = 0.15, minSamples = 3)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(got(20) == -1)
    assert((0 until 20).forall(i => got(i) == 0))
  }

  // ---- Pinned scoring paths (q58/q59 twins) ------------------------------

  test("scoreWith(pinned forest): UDF path equals driver-side Forest.score exactly") {
    val rows = (0 until 64).map(i =>
      (i, 4.0 * u(i, 21) - 2.0, math.floor(24.0 * u(i, 22)))) :+
      ((64, Double.NaN, 3.0)) // NaN routes through comparisons, not nulls
    val df = rows.toDF("id", "v", "h")
    val got = IsolationForest
      .scoreWith(df, Seq("v", "h"), PinnedScoring.forest, "s")
      .select("id", "v", "h", "s").collect()
    got.foreach { r =>
      val expect = PinnedScoring.forest.score(
        Array(r.getDouble(1), r.getDouble(2)))
      assert(r.getDouble(3) == expect, // same JVM code both sides: exact
        s"id=${r.getInt(0)}: ${r.getDouble(3)} vs $expect")
    }
    // null feature → null score (the q58 twin filters nulls symmetrically)
    val withNull = df.withColumn("v",
      when(col("id") === 0, lit(null)).otherwise(col("v")))
    val nulled = IsolationForest
      .scoreWith(withNull, Seq("v", "h"), PinnedScoring.forest, "s")
      .where(col("id") === 0).select("s").collect()
    assert(nulled.head.isNullAt(0))
  }

  test("pinned ocsvm decision Column matches w·φ(x) − ρ (φ-path differential)") {
    val m = PinnedScoring.ocsvm
    val rows = (0 until 64).map(i =>
      (i, 6.0 * u(i, 31) - 3.0, math.floor(24.0 * u(i, 32))))
    val df = rows.toDF("id", "value", "hod")
    val got = df.withColumn("d", m.decision)
      .select("id", "value", "hod", "d").collect()
    got.foreach { r =>
      val phi = m.phi(Array(r.getDouble(1), r.getDouble(2)))
      val expect = m.w.zip(phi).map { case (a, b) => a * b }.sum - m.rho
      // Column tree and phi loop sum in different orders → ≈, not ==
      assert(math.abs(r.getDouble(3) - expect) < 1e-12,
        s"id=${r.getInt(0)}: ${r.getDouble(3)} vs $expect")
    }
  }

  test("pinned SQL twins: generated expressions carry every model constant") {
    val fs = PinnedScoring.forestScoreSql(Seq("a", "b"))
    PinnedScoring.forest.trees.flatMap(t =>
      t.feature.indices.filter(t.feature(_) >= 0).map(t.split(_))).foreach {
      s => assert(fs.contains(s.toString), s"missing split $s in $fs")
    }
    assert(fs.contains("pow(2.0,"))
    val os = PinnedScoring.ocsvmDecisionSql(Seq("a", "b"))
    PinnedScoring.ocsvm.freqs.flatten.foreach { f =>
      assert(os.contains(f.toString), s"missing freq $f in $os")
    }
    assert(os.contains(PinnedScoring.ocsvm.rho.toString))
  }

  test("degenerate-input guards: int features fit, tiny/zero-epoch inputs fail fast") {
    import spark.implicits._
    // integer feature columns: the cast-safe moment pass must fit
    val ints = (0 until 50).map(i => (i % 10, (i * 7) % 13)).toDF("a", "b")
    val m = Mahalanobis.fit(ints, Seq("a", "b"))
    assert(m.mean.forall(v => !v.isNaN))
    val p = Pca.fit(ints, Seq("a", "b"), 2)
    assert(p.explainedVarRatio.forall(v => !v.isNaN))
    // 1-row iforest fit would NaN every score
    intercept[IllegalArgumentException] {
      IsolationForest.fit(Array(Array(1.0, 2.0)))
    }
    // 0-epoch ocsvm would divide by nAvg = 0
    intercept[IllegalArgumentException] {
      OneClassSvm.fit(Array(Array(1.0), Array(2.0)), epochs = 0)
    }
  }

  test("iforest sample salt: duplicate tuples no longer flood the reservoir") {
    import spark.implicits._
    // 5000 copies of one tuple + 100 distinct rows; trainRows = 64
    val df = ((0 until 5000).map(i => (i.toLong, 0.0, 12.0)) ++
      (0 until 100).map(i => (10000L + i, i.toDouble, (i % 24).toDouble)))
      .toDF("id", "value", "hod")
    val salted = IsolationForest.deterministicSample(
      df, Seq("value", "hod"), 64, saltCols = Seq("id"))
    // per-row uniform: the duplicate tuple is ~98% of rows, so it should
    // dominate the sample but NOT exclude distinct rows entirely, and the
    // unsalted all-or-nothing pathology (0 or 64 copies) must not occur
    val dupCount = salted.count(v => v(0) == 0.0 && v(1) == 12.0)
    assert(dupCount > 32 && dupCount < 64, s"dup rows in sample: $dupCount")
  }
}
