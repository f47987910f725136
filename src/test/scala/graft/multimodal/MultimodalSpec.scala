package graft.multimodal

import org.apache.spark.sql.functions._
import graft.GraftSuite

class MultimodalSpec extends GraftSuite {
  import spark.implicits._

  lazy val assets = Multimodal.syntheticAssets(spark, 200).cache()

  test("asset table has the contract schema") {
    assert(assets.schema.fieldNames.toSeq ==
      Seq("asset_id", "media", "media_type", "meta"))
    assert(assets.schema("media").dataType.typeName == "binary")
    assert(assets.count() == 200)
  }

  test("feature extraction is deterministic and dimension-stable") {
    val f1 = Multimodal.extractFeatures(assets, dim = 16, batchSize = 32)
    val f2 = Multimodal.extractFeatures(assets.repartition(7), dim = 16,
      batchSize = 5)
    assert(f1.where(size(col("features")) =!= 16).isEmpty)
    val a = f1.orderBy("asset_id").collect().map(_.toString).toSeq
    val b = f2.orderBy("asset_id").collect().map(_.toString).toSeq
    assert(a == b, "features must not depend on partitioning or batch size")
  }

  test("null media yields null features (no crash)") {
    val withNull = assets.withColumn("media",
      when(col("asset_id") === 7, lit(null).cast("binary"))
        .otherwise(col("media")))
    val f = Multimodal.extractFeatures(withNull, dim = 8)
    assert(f.where(col("asset_id") === 7 && col("features").isNotNull).isEmpty)
    assert(f.where(col("features").isNotNull).count() == 199)
  }

  test("resize bounds payload size") {
    val r = Multimodal.resizeMedia(assets, maxBytes = 50)
    assert(r.where(length(col("media_resized")) > 50).isEmpty)
  }

  test("extracted features feed the similarity stack") {
    val f = Multimodal.extractFeatures(assets, dim = 16)
      .withColumn("features", transform(col("features"), x => x.cast("float")))
    val q = f.limit(2).select(col("asset_id").as("q_id"),
      col("features").as("q_vec"))
    val top = graft.ann.Similarity.bruteForceTopK(q, f, "q_id", "asset_id",
      "q_vec", "features", k = 3)
    assert(top.count() == 6)
  }
}
