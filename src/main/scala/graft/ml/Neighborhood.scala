package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Neighborhood-density detectors, per bounded group: LocalOutlierFactor
  * (Breunig et al. 2000; reference `src/anomaly_detection.py:85-127`,
  * n_neighbors=20) and DBSCAN noise labeling (Ester et al. 1996; reference
  * `src/anomaly_detection.py:176-217`, eps=0.5/min_samples=5, label −1 ⇒
  * anomaly).
  *
  * Scale shape: both are O(n²)-neighborhood algorithms, so the engine runs
  * them the same way it runs STL — as per-conversation kernels inside
  * `flatMapSortedGroups`, parallel ACROSS conversations with each group
  * bounded (the reference itself fits them per monitor point over ≤1000
  * rows). Groups above `maxGroup` rows get null scores rather than a
  * quadratic blowup — at that size the global detectors (IsolationForest /
  * Mahalanobis, which scale linearly) are the right tool, and a null score
  * is an honest "not computed", not a silent cap.
  */
object Neighborhood {

  /** Rows with any null/NaN-decoding feature carry a None vector (the
    * kernels emit a null score for them, like IsolationForest's null
    * pass-through) — decoding them as a bare Seq[Double] would crash the
    * whole job on the first null ("Null value appeared in non-nullable
    * field").
    */
  private def packed(df: DataFrame, keyCol: String, ordCol: String,
      featureCols: Seq[String]) = {
    val spark = df.sparkSession
    import spark.implicits._
    // guard the CAST value, not the raw column: a non-null value whose
    // double cast is null ("n/a" in a string column) would otherwise slip
    // a null into the array and crash deserialization; a NaN would poison
    // every distance comparison in the group's kernel
    val xs = featureCols.map(c => col(c).cast("double"))
    val allSet = xs.map(x => x.isNotNull && !isnan(x)).reduce(_ && _)
    df.select(col(keyCol).cast("string").as("key"),
        col(ordCol).cast("int").as("ord"),
        when(allSet, array(xs: _*)).as("x"))
      .as[(String, Int, Option[Seq[Double]])]
  }

  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  /** LOF per group → (key, ord, lof). LOF ≈ 1 means inlier-dense; ≫ 1
    * means local outlier (the reference flags label −1 from sklearn's
    * `fit_predict`, i.e. the contamination tail of −LOF — flagging is left
    * to the caller via a quantile or fixed threshold on this score).
    */
  def lof(df: DataFrame, keyCol: String, ordCol: String,
      featureCols: Seq[String], k: Int = 20, maxGroup: Int = 20000)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    packed(df, keyCol, ordCol, featureCols)
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ord")) { (key, rows) =>
        val buf = rows.toArray
        val valid = buf.iterator.zipWithIndex
          .collect { case ((_, _, Some(x)), i) => (i, x.toArray) }.toArray
        if (valid.length > maxGroup || valid.length < 3)
          buf.iterator.map(r => (key, r._2, Option.empty[Double]))
        else {
          val scores =
            lofKernel(valid.map(_._2), math.min(k, valid.length - 1))
          val byPos = valid.iterator.map(_._1).zip(scores.iterator).toMap
          buf.iterator.zipWithIndex.map { case (r, i) =>
            (key, r._2, byPos.get(i))
          }
        }
      }
      .toDF(keyCol, ordCol, "lof")
  }

  /** Exact LOF over one in-memory group (Breunig semantics: k-distance
    * neighborhoods WITH ties, reachability distances, lrd, LOF).
    *
    * Memory shape: no n×n matrix — each point's distance row is computed
    * into a reused O(n) buffer and only the neighbor list (ids +
    * distances, k plus ties) is retained, so a 20k-row group holds
    * ~O(n·k) doubles resident instead of the 3.2 GB n² matrix the
    * matrix form costs at `maxGroup`. Time stays O(n²·d) — the reason
    * groups are bounded at all. (Degenerate caveat: a group that is
    * mostly exact duplicates has tie-neighborhoods of size ~n and the
    * neighbor lists grow toward O(n²) again — the maxGroup bound is the
    * backstop there too.)
    */
  private[ml] def lofKernel(xs: Array[Array[Double]], k: Int): Array[Double] = {
    val n = xs.length
    val kdist = new Array[Double](n)
    val neighIds = new Array[Array[Int]](n)
    val neighDist = new Array[Array[Double]](n)
    val row = new Array[Double](n) // reused distance buffer
    val scratch = new Array[Double](n) // reused selection buffer
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) { row(j) = dist(xs(i), xs(j)); j += 1 }
      var m = 0
      j = 0
      while (j < n) { if (j != i) { scratch(m) = row(j); m += 1 }; j += 1 }
      kdist(i) = kthSmallest(scratch, m, k)
      val ids = new scala.collection.mutable.ArrayBuilder.ofInt
      val ds = new scala.collection.mutable.ArrayBuilder.ofDouble
      j = 0
      while (j < n) {
        if (j != i && row(j) <= kdist(i)) { ids += j; ds += row(j) }
        j += 1
      }
      neighIds(i) = ids.result()
      neighDist(i) = ds.result()
      i += 1
    }
    val lrd = new Array[Double](n)
    i = 0
    while (i < n) {
      var s = 0.0
      val ds = neighDist(i)
      val ids = neighIds(i)
      var t = 0
      while (t < ids.length) { s += math.max(kdist(ids(t)), ds(t)); t += 1 }
      lrd(i) = if (s <= 0) Double.PositiveInfinity
        else ids.length / s
      i += 1
    }
    Array.tabulate(n) { p =>
      val ns = neighIds(p)
      if (lrd(p).isInfinite) 1.0 // duplicate-dense point: as dense as peers
      else {
        var s = 0.0
        ns.foreach { o =>
          s += (if (lrd(o).isInfinite) 1e12 else lrd(o))
        }
        (s / ns.length) / lrd(p)
      }
    }
  }

  /** k-th smallest of a(0 until m), in-place iterative quickselect with a
    * median-of-three pivot (deterministic — no RNG). Mutates `a`.
    */
  private[ml] def kthSmallest(a: Array[Double], m: Int, k: Int): Double = {
    require(k >= 1 && k <= m, s"k=$k outside 1..$m")
    var lo = 0
    var hi = m - 1
    val target = k - 1
    while (lo < hi) {
      // median-of-three pivot, moved to a(lo)
      val mid = lo + (hi - lo) / 2
      if (a(mid) < a(lo)) { val t = a(mid); a(mid) = a(lo); a(lo) = t }
      if (a(hi) < a(lo)) { val t = a(hi); a(hi) = a(lo); a(lo) = t }
      if (a(hi) < a(mid)) { val t = a(hi); a(hi) = a(mid); a(mid) = t }
      val pivot = a(mid)
      var i = lo
      var j = hi
      while (i <= j) {
        while (a(i) < pivot) i += 1
        while (a(j) > pivot) j -= 1
        if (i <= j) {
          val t = a(i); a(i) = a(j); a(j) = t
          i += 1; j -= 1
        }
      }
      if (target <= j) hi = j
      else if (target >= i) lo = i
      else return a(target)
    }
    a(target)
  }

  /** DBSCAN per group → (key, ord, cluster, is_noise). Cluster ids are
    * local to the group, −1 = noise (the reference's anomaly label);
    * `minSamples` counts the point itself, like sklearn.
    */
  def dbscan(df: DataFrame, keyCol: String, ordCol: String,
      featureCols: Seq[String], eps: Double = 0.5, minSamples: Int = 5,
      maxGroup: Int = 20000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    packed(df, keyCol, ordCol, featureCols)
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ord")) { (key, rows) =>
        val buf = rows.toArray
        val valid = buf.iterator.zipWithIndex
          .collect { case ((_, _, Some(x)), i) => (i, x.toArray) }.toArray
        if (valid.length > maxGroup)
          buf.iterator.map(r => (key, r._2, Option.empty[Int], Option.empty[Boolean]))
        else {
          val labels = dbscanKernel(valid.map(_._2), eps, minSamples)
          val byPos = valid.iterator.map(_._1).zip(labels.iterator).toMap
          buf.iterator.zipWithIndex.map { case (r, i) =>
            val l = byPos.get(i)
            (key, r._2, l, l.map(_ == -1))
          }
        }
      }
      .toDF(keyCol, ordCol, "cluster", "is_noise")
  }

  /** Classic BFS DBSCAN over one in-memory group; returns labels, −1 noise.
    *
    * Memory stays O(n): neighborhoods are never materialized — core flags
    * come from a count-only pass and the BFS recomputes each dequeued core
    * point's neighborhood on the fly. Each core point is dequeued at most
    * once, so time stays O(n²·d) like the stored-list version, while a
    * dense group at `maxGroup` no longer holds up to n² ints (~1.6 GB at
    * 20k rows with large eps) in a single task.
    */
  private[ml] def dbscanKernel(xs: Array[Array[Double]], eps: Double,
      minSamples: Int): Array[Int] = {
    val n = xs.length
    val core = Array.tabulate(n) { i =>
      var c = 0; var j = 0
      while (j < n) { if (dist(xs(i), xs(j)) <= eps) c += 1; j += 1 } // incl. self
      c >= minSamples
    }
    val label = Array.fill(n)(-2) // -2 unvisited, -1 noise, >=0 cluster
    var cluster = 0
    var i = 0
    while (i < n) {
      if (label(i) == -2) {
        if (!core(i)) label(i) = -1 // provisionally noise; may become border
        else {
          val queue = scala.collection.mutable.Queue(i)
          label(i) = cluster
          while (queue.nonEmpty) {
            val p = queue.dequeue() // invariant: only core points enqueue
            var q = 0
            while (q < n) {
              if ((label(q) == -2 || label(q) == -1) &&
                  dist(xs(p), xs(q)) <= eps) {
                val wasUnvisited = label(q) == -2
                label(q) = cluster // core expands, non-core becomes border
                if (wasUnvisited && core(q)) queue.enqueue(q)
              }
              q += 1
            }
          }
          cluster += 1
        }
      }
      i += 1
    }
    label
  }
}
