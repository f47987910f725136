package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the FAISS-style
  * coarse-quantizer scale path, complementing the hyperplane-LSH path
  * ([[Similarity.annTopK]]):
  *
  *  - [[fit]]: spherical k-means (k-means++ seeding, Lloyd iterations) on
  *    a DETERMINISTIC driver sample — same fit-on-sample / score-at-scale
  *    shape as the ml/ detectors; centroids come back L2-normalized so
  *    cosine order == dot order;
  *  - [[IvfCells]]: one codegen'd projection assigns every corpus vector
  *    its home cell (argmax dot) and every query its `nprobe` nearest
  *    cells;
  *  - [[topK]]: candidate generation is a plain equi-join on the scalar
  *    cell id — each corpus vector lives in EXACTLY ONE cell, so unlike
  *    the ×tables LSH explode there is no candidate duplication and no
  *    pair-dedup shuffle. At 100 TB the cell column is computed in the
  *    same pass that writes the corpus (or backfilled once) and the table
  *    is bucketed by cell; the query side is small and broadcasts.
  *
  * Recall/cost is tuned by (k cells, nprobe): probing more cells grows
  * candidates linearly. IvfSpec gates recall against the exact
  * brute-force baseline on clustered data; the q60 driver query pins the
  * centroid matrix ([[pinnedCentroids]]) so the ENTIRE search path —
  * assignment, probe, candidate join, cosine re-rank — is hash-checked
  * against a DuckDB twin (the k-means FIT, like the detector fits, is
  * spec-gated: iterative Lloyd state has no SQL twin).
  */
object Ivf {

  private final class XorShift(seed0: Long) {
    private var s: Long = if (seed0 == 0) 0x6a09e667f3bcc909L else seed0
    def nextLong(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    def nextInt(bound: Int): Int = (((nextLong() >>> 1) % bound).toInt)
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Spherical k-means on a deterministic sample (smallest-`sampleRows`
    * by xxhash64 of the vector — reproducible across runs, partitionings,
    * and resumes). Unit-norm output; distance = 1 − dot on unit vectors.
    */
  def fit(df: DataFrame, vecCol: String, k: Int, iters: Int = 10,
      sampleRows: Int = 4096, seed: Long = 42L): Array[Array[Double]] = {
    val raw = df
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .where(col("v").isNotNull && not(exists(col("v"), _.isNull)))
      .orderBy(xxhash64(col("v")))
      .limit(sampleRows)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    // a truncated vector in the sample would AIOOBE every dot() against
    // full-width centroids (a longer one would be silently cut): fit on
    // the sample's dominant dimensionality only
    val dims = raw.map(_.length).groupBy(identity)
      .maxByOption { case (_, g) => g.length }.map(_._1).getOrElse(0)
    val sample = raw.filter(_.length == dims)
      .map(normalize)
      .filter(v => v.exists(_ != 0.0))
    require(sample.length >= k, s"need >= $k non-zero sample vectors")
    val rng = new XorShift(seed)

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dims) { s += a(i) * b(i); i += 1 }
      s
    }

    // k-means++ seeding: D²(x) = (1 − best-dot) sampling
    val cents = new Array[Array[Double]](k)
    cents(0) = sample(rng.nextInt(sample.length)).clone()
    val bestD = sample.map(v => math.max(0.0, 1.0 - dot(v, cents(0))))
    var c = 1
    while (c < k) {
      val total = bestD.sum
      var target = rng.nextDouble() * total
      var pick = 0
      while (pick < sample.length - 1 && target > bestD(pick)) {
        target -= bestD(pick); pick += 1
      }
      cents(c) = sample(pick).clone()
      var i = 0
      while (i < sample.length) {
        val d = math.max(0.0, 1.0 - dot(sample(i), cents(c)))
        if (d < bestD(i)) bestD(i) = d
        i += 1
      }
      c += 1
    }

    // Lloyd: assign to argmax dot (ties → lower id), mean, renormalize;
    // an emptied cell is reseeded to the point farthest from its centroid.
    val assign = new Array[Int](sample.length)
    (0 until iters).foreach { _ =>
      var i = 0
      while (i < sample.length) {
        var best = 0
        var bd = dot(sample(i), cents(0))
        var j = 1
        while (j < k) {
          val d = dot(sample(i), cents(j))
          if (d > bd) { bd = d; best = j }
          j += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Int](k)
      i = 0
      while (i < sample.length) {
        val s = sums(assign(i))
        var x = 0
        while (x < dims) { s(x) += sample(i)(x); x += 1 }
        counts(assign(i)) += 1
        i += 1
      }
      // reseed each emptied cell from a DISTINCT farthest point: two cells
      // emptied in the same iteration would otherwise both clone the same
      // point, and the argmax tie-break would starve the higher id forever
      val reseeded = scala.collection.mutable.Set.empty[Int]
      var j = 0
      while (j < k) {
        if (counts(j) > 0) cents(j) = normalize(sums(j))
        else {
          var worst = -1
          var wd = Double.PositiveInfinity
          var p = 0
          while (p < sample.length) {
            val d = dot(sample(p), cents(assign(p)))
            if (d < wd && !reseeded.contains(p)) { wd = d; worst = p }
            p += 1
          }
          if (worst >= 0) { cents(j) = sample(worst).clone(); reseeded += worst }
        }
        j += 1
      }
    }
    cents
  }

  /** IVF top-k: corpus vectors live in their single home cell, queries
    * probe their `nprobe` nearest cells, exact cosine re-rank within
    * candidates. Query side must be small (broadcast by contract, like
    * [[Similarity.bruteForceTopK]]'s query set).
    */
  def topK(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
      qVec: String, cVec: String, k: Int, centroids: Array[Array[Double]],
      nprobe: Int = 2): DataFrame = {
    // ranking limits: a query needs its nprobe probe cells, a corpus row
    // only its argmax home cell — O(k·limit), not a full O(k²) sort/row
    val qCells = queries.select(col(qId),
      explode(slice(IvfCells(col(qVec), centroids, nprobe), 1, nprobe)).as("cell"))
    // get() (not getItem) tolerates the degenerate-vector empty array
    // under ANSI semantics, yielding null → filtered
    val cCells = corpus.select(col(cId),
      get(IvfCells(col(cVec), centroids, 1), lit(0)).as("cell"))
      .where(col("cell").isNotNull)
    // one cell per corpus vector + distinct probe cells per query ⇒ a
    // (query, candidate) pair matches at most once: no dedup needed.
    // The query side is broadcast explicitly — after the caller's filter
    // Catalyst's size estimate can overshoot and shuffle the corpus.
    val pairs = broadcast(qCells).join(cCells, Seq("cell"))
      .where(col(qId) =!= col(cId))
      .select(col(qId), col(cId))
    val cand = pairs
      .join(broadcast(queries.select(col(qId), col(qVec))), Seq(qId))
      .join(corpus.select(col(cId), col(cVec)), Seq(cId))
      .withColumn("cos", Similarity.cosine(col(qVec), col(cVec)))
      .where(col("cos").isNotNull)
    val w = Window.partitionBy(col(qId)).orderBy(desc("cos"), col(cId))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId).as("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic pinned centroid matrix for the q60 search-path twin:
    * md5-derived components (the [[Similarity.planeComponent]] recipe
    * under an "ivf_cent" namespace), L2-normalized in Scala; the oracle
    * SQL inlines the normalized doubles via shortest-round-trip printing.
    */
  def pinnedCentroids(k: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(k) { j =>
      normalize(Array.tabulate(dims) { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"ivf_cent_${j}_$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2000001L -
          1000000L) / 1000000.0
      })
    }

  /** `(cid, [..]::DOUBLE[])` VALUES rows for the DuckDB twin. */
  def centroidsSqlValues(cents: Array[Array[Double]]): String =
    cents.zipWithIndex.map { case (c, j) =>
      s"($j, [${c.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
}
