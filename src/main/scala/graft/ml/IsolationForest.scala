package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isolation Forest (Liu, Ting & Zhou 2008, "Isolation Forest", ICDM) —
  * the reference's primary ML detector (`src/anomaly_detection.py:38-83`:
  * contamination=0.1, n_estimators=100, random_state=42).
  *
  * Spark-first shape (fit-on-sample, score-at-scale — the standard way to
  * run a sample-trained detector over 10^12 rows):
  *  - the training sample is a DETERMINISTIC uniform reservoir: the
  *    `trainRows`-smallest rows by xxhash64 of the feature tuple (default
  *    8192; TakeOrdered — one pass, no shuffle of the full data, same
  *    sample on every rerun/resume; no RNG over the data). Every tree
  *    then draws its ψ-row subsample from this ONE shared pool — unlike
  *    sklearn, where each tree subsamples the full data independently; at
  *    the defaults (8192 ≫ ψ=256) the lost sample diversity is
  *    negligible, but raise `trainRows` if `nTrees * sampleSize`
  *    approaches it;
  *  - trees are fitted at the driver from a seeded xorshift PRNG (the
  *    isolation-tree build over ≤256-row subsamples is microseconds) and
  *    broadcast as flat int/double arrays;
  *  - scoring is one projection: a scala UDF traversing 100 array-encoded
  *    trees per row. A tree traversal is inherently branchy — there is no
  *    honest Column encoding — so this is the ONE sanctioned UDF in the
  *    engine; it allocates nothing per row beyond the feature array.
  *  - threshold: the contamination quantile of the scores (one
  *    percentile_approx pass), matching sklearn's `contamination`
  *    semantics; labels ∈ {1, −1} preserve the reference interface.
  */
object IsolationForest {

  /** One tree, array-encoded: for node i,
    *  feature(i) >= 0  → internal: go left if x(feature) < split(i),
    *                     children at left(i)/right(i);
    *  feature(i) == -1 → external: size(i) rows landed here at fit time.
    */
  final case class Tree(feature: Array[Int], split: Array[Double],
      left: Array[Int], right: Array[Int], size: Array[Int])

  final case class Forest(trees: Seq[Tree], sampleSize: Int) {
    /** Average path length over trees → anomaly score 2^(−E[h]/c(ψ)). */
    def score(x: Array[Double]): Double = {
      var total = 0.0
      var t = 0
      while (t < trees.length) {
        val tr = trees(t)
        var node = 0
        var depth = 0
        while (tr.feature(node) >= 0) {
          node = if (x(tr.feature(node)) < tr.split(node)) tr.left(node)
            else tr.right(node)
          depth += 1
        }
        total += depth + avgPathLength(tr.size(node))
        t += 1
      }
      math.pow(2.0, -(total / trees.length) / avgPathLength(sampleSize))
    }
  }

  /** c(n): average unsuccessful-search path length in a BST of n nodes
    * (Liu et al. eq. 1): 2·H(n−1) − 2(n−1)/n, H(i) ≈ ln(i) + γ.
    */
  private[ml] def avgPathLength(n: Int): Double =
    if (n <= 1) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n

  private final class XorShift(seed0: Long) {
    private var s: Long = if (seed0 == 0) 0x9e3779b97f4a7c15L else seed0
    def nextLong(): Long = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s
    }
    def nextInt(bound: Int): Int = (((nextLong() >>> 1) % bound).toInt)
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  /** Fit `nTrees` isolation trees on driver-held `data` (each tree sees its
    * own ψ-row subsample; height limit ceil(log2 ψ) as in the paper).
    */
  def fit(data: Array[Array[Double]], nTrees: Int = 100,
      sampleSize: Int = 256, seed: Long = 42L): Forest = {
    // psi = 1 makes avgPathLength(sampleSize) = 0 and every score NaN
    require(data.length >= 2, s"need >= 2 training rows, got ${data.length}")
    val d = data(0).length
    val rng = new XorShift(seed)
    val psi = math.min(sampleSize, data.length)
    val heightLimit = math.ceil(math.log(psi.toDouble) / math.log(2.0)).toInt
    val trees = (0 until nTrees).map { _ =>
      // ψ distinct rows per tree (partial Fisher–Yates — sampling without
      // replacement as in the paper / sklearn)
      val pool = Array.tabulate(data.length)(identity)
      var i = 0
      while (i < psi) {
        val j = i + rng.nextInt(data.length - i)
        val t = pool(i); pool(i) = pool(j); pool(j) = t
        i += 1
      }
      val idx = java.util.Arrays.copyOfRange(pool, 0, psi)
      val feature = scala.collection.mutable.ArrayBuffer.empty[Int]
      val split = scala.collection.mutable.ArrayBuffer.empty[Double]
      val left = scala.collection.mutable.ArrayBuffer.empty[Int]
      val right = scala.collection.mutable.ArrayBuffer.empty[Int]
      val size = scala.collection.mutable.ArrayBuffer.empty[Int]
      def build(rows: Array[Int], depth: Int): Int = {
        val me = feature.length
        feature += -1; split += 0.0; left += -1; right += -1; size += rows.length
        if (rows.length <= 1 || depth >= heightLimit) return me
        // pick a feature with spread; give up after d tries (all-constant)
        var tries = 0
        var f = -1
        var lo = 0.0
        var hi = 0.0
        while (tries < d && f < 0) {
          val cand = rng.nextInt(d)
          var mn = Double.PositiveInfinity
          var mx = Double.NegativeInfinity
          rows.foreach { r =>
            val v = data(r)(cand)
            if (v < mn) mn = v
            if (v > mx) mx = v
          }
          if (mx > mn) { f = cand; lo = mn; hi = mx }
          tries += 1
        }
        if (f < 0) return me // all candidate features constant: external
        val s = lo + rng.nextDouble() * (hi - lo)
        val (l, r) = rows.partition(data(_)(f) < s)
        if (l.isEmpty || r.isEmpty) return me
        val li = build(l, depth + 1)
        val ri = build(r, depth + 1)
        // convert this node to internal now that the children exist
        feature(me) = f; split(me) = s; left(me) = li; right(me) = ri
        me
      }
      build(idx, 0)
      Tree(feature.toArray, split.toArray, left.toArray, right.toArray,
        size.toArray)
    }
    Forest(trees, psi)
  }

  /** Deterministic uniform sample of the feature rows: smallest-k by
    * xxhash64 of the feature tuple — one TakeOrdered pass, reproducible
    * across runs and partitionings (SURVEY §7 resumability: a resumed run
    * refits the identical forest).
    */
  /** `saltCols`: a row-unique key to fold into the reservoir hash.
    * Without it duplicate feature tuples share ONE hash and enter the
    * sample all-or-nothing — a heavily duplicated tuple (a sentinel
    * value) can flood the whole sample. With a unique salt the reservoir
    * is uniform over ROWS, still fully deterministic.
    */
  def deterministicSample(df: DataFrame, cols: Seq[String], k: Int,
      saltCols: Seq[String] = Nil): Array[Array[Double]] =
    df.na.drop(cols)
      .select(cols.map(c => col(c).cast("double")) :+
        xxhash64((cols ++ saltCols).map(col): _*).as("__h"): _*)
      .orderBy(col("__h"))
      .limit(k)
      .drop("__h")
      .collect()
      .map(r => Array.tabulate(cols.size)(r.getDouble))

  /** Score every row with a GIVEN forest: broadcast the array-encoded
    * trees, traverse them in the one sanctioned UDF, null features → null
    * score. This is the production scoring path for both the fitted
    * detector (fitScore) and the pinned hash-checked twin (q58).
    */
  def scoreWith(df: DataFrame, cols: Seq[String], forest: Forest,
      scoreCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(forest)
    val scoreUdf = udf { xs: Seq[Double] => bc.value.score(xs.toArray) }
    val features = array(cols.map(c => col(c).cast("double")): _*)
    df.withColumn(scoreCol,
      when(cols.map(col(_).isNotNull).reduce(_ && _), scoreUdf(features)))
  }

  /** Fit on a deterministic sample, score every row, flag the
    * contamination tail. Adds `scoreCol`, `flagCol`, `flagCol_label`.
    */
  def fitScore(df: DataFrame, cols: Seq[String], nTrees: Int = 100,
      sampleSize: Int = 256, contamination: Double = 0.1, seed: Long = 42L,
      trainRows: Int = 8192, scoreCol: String = "iforest_score",
      flagCol: String = "iforest_anomaly",
      sampleSaltCols: Seq[String] = Nil): DataFrame = {
    val data = deterministicSample(df, cols, trainRows, sampleSaltCols)
    val forest = fit(data, nTrees, sampleSize, seed)
    val scored = scoreWith(df, cols, forest, scoreCol)
    val thr = scored.na.drop(cols).agg(
      percentile_approx(col(scoreCol), lit(1 - contamination), lit(10000)).as("t"))
      .collect()(0).getAs[Double]("t")
    scored
      .withColumn(flagCol, coalesce(col(scoreCol) > thr, lit(false)))
      .withColumn(s"${flagCol}_label", when(col(flagCol), -1).otherwise(1))
  }
}
