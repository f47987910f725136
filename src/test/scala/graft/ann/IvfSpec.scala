package graft.ann

import org.apache.spark.sql.functions._
import graft.GraftSuite

class IvfSpec extends GraftSuite {
  import spark.implicits._

  /** Deterministic clustered vectors: 8 clusters x 30 points in 16 dims
    * (same recipe as SimilaritySpec's fixture).
    */
  private def clustered = {
    val rows = for (c <- 0 until 8; i <- 0 until 30) yield {
      val vec = Array.tabulate(16) { d =>
        val center = if (d % 8 == c % 8) 1.0f else 0.0f
        val jitter = (((c * 31 + i * 17 + d * 7) % 13) - 6) / 60.0f
        center + jitter
      }
      (c * 100L + i, vec)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IvfCells: codegen path equals driver-side ordering, ties to lower id") {
    val cents = Ivf.pinnedCentroids(k = 5, dims = 4)
    val vecs = Seq(
      Array(0.3f, -1.2f, 0.8f, 0.05f),
      Array(1.0f, 1.0f, 1.0f, 1.0f),
      Array(-0.7f, 0.0f, 0.0f, 2.5f))
    val got = vecs.map(v => Tuple1(v)).toDF("v")
      .select(IvfCells(col("v"), cents).as("cells"))
      .collect().map(_.getSeq[Int](0))
    vecs.zip(got).foreach { case (v, cells) =>
      val dots = cents.map(c =>
        c.indices.foldLeft(0.0)((s, i) => s + v(i).toDouble * c(i)))
      val expect = dots.indices.sortBy(j => (-dots(j), j))
      assert(cells == expect, s"${cells} vs ${expect.toSeq}")
    }
  }

  test("IvfCells: short or null-element vector → empty array (drops from join)") {
    val cents = Ivf.pinnedCentroids(k = 3, dims = 4)
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1.0f), Some(2.0f), Some(3.0f), Some(4.0f))),
      (2L, Seq[Option[Float]](Some(1.0f), Some(2.0f))),
      (3L, Seq[Option[Float]](Some(1.0f), None, Some(3.0f), Some(4.0f))))
      .toDF("id", "v")
    val got = df.select(col("id"), IvfCells(col("v"), cents).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L).size == 3)
    assert(got(2L).isEmpty && got(3L).isEmpty)
    // get(…, 0) on the empty array is null — the topK cell filter drops it
    val cell0 = df.select(col("id"),
      get(IvfCells(col("v"), cents), lit(0)).as("cell"))
      .where(col("cell").isNotNull).select("id").as[Long].collect()
    assert(cell0.toSeq == Seq(1L))
  }

  test("spherical k-means recovers well-separated clusters (purity >= 0.9)") {
    val corpus = clustered.cache()
    val cents = Ivf.fit(corpus, "embedding", k = 8, iters = 10,
      sampleRows = 240, seed = 42L)
    assert(cents.length == 8)
    cents.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid norm $n")
    }
    val cells = corpus
      .select((col("vec_id") / 100).cast("int").as("cluster"),
        IvfCells(col("embedding"), cents).getItem(0).as("cell"))
      .collect().map(r => r.getInt(0) -> r.getInt(1))
    val majority = cells.groupBy(_._1).map { case (cl, xs) =>
      cl -> xs.groupBy(_._2).view.mapValues(_.size).maxBy(_._2)._1
    }
    val pure = cells.count { case (cl, cell) => majority(cl) == cell }
    assert(pure.toDouble / cells.length >= 0.9,
      s"purity ${pure.toDouble / cells.length}")
  }

  test("IVF ANN recall vs brute force with fitted centroids") {
    val corpus = clustered.cache()
    val queries = corpus.where(col("vec_id") % 100 < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(queries, corpus, "q_id", "vec_id",
      "q_vec", "embedding", k = 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val cents = Ivf.fit(corpus, "embedding", k = 8, iters = 10,
      sampleRows = 240, seed = 42L)
    val ivf = Ivf.topK(queries, corpus, "q_id", "vec_id",
      "q_vec", "embedding", k = 5, cents, nprobe = 2)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("pinned centroids: unit norm, and the SQL VALUES carry every constant") {
    val cents = Ivf.pinnedCentroids(k = 8, dims = 64)
    cents.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
    val sql = Ivf.centroidsSqlValues(cents)
    cents.flatten.foreach(x => assert(sql.contains(x.toString)))
    assert(sql.contains("(7, ["))
  }
}
