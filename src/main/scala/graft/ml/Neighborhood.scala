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

  private def packed(df: DataFrame, keyCol: String, ordCol: String,
      featureCols: Seq[String]) = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("key"),
        col(ordCol).cast("int").as("ord"),
        array(featureCols.map(c => col(c).cast("double")): _*).as("x"))
      .as[(String, Int, Seq[Double])]
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
        if (buf.length > maxGroup || buf.length < 3)
          buf.iterator.map(r => (key, r._2, Option.empty[Double]))
        else {
          val xs = buf.map(_._3.toArray)
          val scores = lofKernel(xs, math.min(k, buf.length - 1))
          buf.iterator.zip(scores.iterator).map { case (r, s) =>
            (key, r._2, Option(s))
          }
        }
      }
      .toDF(keyCol, ordCol, "lof")
  }

  /** Exact LOF over one in-memory group (the reference's sklearn
    * semantics: k-distance neighborhoods WITH ties, reachability
    * distances, lrd, LOF).
    */
  private[ml] def lofKernel(xs: Array[Array[Double]], k: Int): Array[Double] = {
    val n = xs.length
    val d = Array.tabulate(n, n)((i, j) => dist(xs(i), xs(j)))
    // k-distance and neighborhood (all points within k-distance, ties incl.)
    val kdist = new Array[Double](n)
    val neigh = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val others = (0 until n).filter(_ != i).toArray
      val sorted = others.sortBy(d(i))
      kdist(i) = d(i)(sorted(k - 1))
      neigh(i) = others.filter(j => d(i)(j) <= kdist(i))
      i += 1
    }
    val lrd = new Array[Double](n)
    i = 0
    while (i < n) {
      var s = 0.0
      neigh(i).foreach(j => s += math.max(kdist(j), d(i)(j)))
      lrd(i) = if (s <= 0) Double.PositiveInfinity
        else neigh(i).length / s
      i += 1
    }
    Array.tabulate(n) { p =>
      val ns = neigh(p)
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
        if (buf.length > maxGroup)
          buf.iterator.map(r => (key, r._2, Option.empty[Int], Option.empty[Boolean]))
        else {
          val labels = dbscanKernel(buf.map(_._3.toArray), eps, minSamples)
          buf.iterator.zip(labels.iterator).map { case (r, l) =>
            (key, r._2, Option(l), Option(l == -1))
          }
        }
      }
      .toDF(keyCol, ordCol, "cluster", "is_noise")
  }

  /** Classic BFS DBSCAN over one in-memory group; returns labels, −1 noise. */
  private[ml] def dbscanKernel(xs: Array[Array[Double]], eps: Double,
      minSamples: Int): Array[Int] = {
    val n = xs.length
    val neigh = Array.tabulate(n) { i =>
      (0 until n).filter(j => dist(xs(i), xs(j)) <= eps).toArray // incl. self
    }
    val core = Array.tabulate(n)(i => neigh(i).length >= minSamples)
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
            val p = queue.dequeue()
            neigh(p).foreach { q =>
              if (label(q) == -2 || label(q) == -1) {
                val wasUnvisited = label(q) == -2
                label(q) = cluster // core expands, non-core becomes border
                if (wasUnvisited && core(q)) queue.enqueue(q)
              }
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
