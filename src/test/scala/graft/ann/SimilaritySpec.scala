package graft.ann

import org.apache.spark.sql.functions._
import graft.GraftSuite

class SimilaritySpec extends GraftSuite {
  import spark.implicits._

  test("custom cosine expression == composable HOF form on the testdata") {
    val e = spark.read.parquet(s"$sfTiny/embeddings.parquet").limit(100)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("vb")))
      .where(col("a_id") < col("b_id"))
    val diff = pairs.select(
      Similarity.cosine(col("va"), col("vb")).as("fast"),
      Similarity.cosineComposable(col("va"), col("vb")).as("slow"))
      .where(abs(col("fast") - col("slow")) > 1e-12)
    assert(diff.isEmpty)
  }

  test("cosine matches hand computation; zero vector → null") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect()
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(got(1).getDouble(0) - 0.0) < 1e-12)
    assert(math.abs(got(2).getDouble(0) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(got(3).isNullAt(0))
  }

  test("cosine: length mismatch or a null element → null, matching the HOF form") {
    val df = Seq(
      (Seq(Option(1.0f), Option(0.0f)), Seq(Option(1.0f))), // shorter
      (Seq(Option(1.0f), None), Seq(Option(1.0f), Option(1.0f))), // null slot
      (Seq(Option(1.0f), Option(2.0f)), Seq(Option(1.0f), Option(2.0f))))
      .toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(got(0).isNullAt(0), "prefix-truncated score must not rank")
    assert(got(1).isNullAt(0), "null element read as 0.0 must not rank")
    assert(math.abs(got(2).getDouble(0) - 1.0) < 1e-12)
  }

  /** Deterministic clustered vectors: 8 clusters x 30 points in 16 dims. */
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

  test("brute-force top-k: neighbors come from the same cluster") {
    val corpus = clustered.cache()
    val queries = corpus.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = Similarity.bruteForceTopK(queries, corpus, "q_id", "vec_id",
      "q_vec", "embedding", k = 5).cache()
    assert(top.groupBy("q_id").count().where(col("count") =!= 5).isEmpty)
    val wrongCluster = top.where(floor(col("neighbor_id") / 100) =!=
      floor(col("q_id") / 100))
    assert(wrongCluster.isEmpty)
  }

  test("LSH ANN achieves high recall vs brute force on clustered data") {
    val corpus = clustered.cache()
    val queries = corpus.where(col("vec_id") % 100 < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(queries, corpus, "q_id", "vec_id",
      "q_vec", "embedding", k = 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(queries, corpus, "q_id", "vec_id",
      "q_vec", "embedding", k = 5, planes = 6, tables = 4, dims = 16)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("embedding near-dups find planted near-copies") {
    val base = clustered
    val copies = base.where(col("vec_id") % 100 === 7)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.001f)).as("embedding"))
    val all = base.unionByName(copies)
    val dups = Similarity.embeddingNearDups(all, "vec_id", "embedding",
      threshold = 0.999, planes = 6, tables = 6, dims = 16)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expected = (0 until 8).map(c => (c * 100L + 7, c * 100L + 7 + 100000L)).toSet
    val found = expected.count(dups.contains).toDouble / expected.size
    assert(found >= 0.75, s"found fraction=$found of planted near-copies")
  }

  test("runs on the embeddings testdata") {
    val e = spark.read.parquet(s"$sfTiny/embeddings.parquet")
    val q = e.limit(3).select(col("vec_id").as("q_id"),
      col("embedding").as("q_vec"))
    val top = Similarity.bruteForceTopK(q, e, "q_id", "vec_id", "q_vec",
      "embedding", k = 10)
    assert(top.count() == 30)
  }
}
