package graft.sources

import org.apache.spark.sql.functions._
import graft.GraftSuite
import graft.skew.Salting

class TranscriptGenSpec extends GraftSuite {
  import spark.implicits._

  lazy val t = TranscriptGen.generate(spark, nConvs = 150, baseTurns = 40).cache()

  test("pure-hash determinism: regeneration is identical, any partitioning") {
    val t2 = TranscriptGen.generate(spark, nConvs = 150, baseTurns = 40)
      .repartition(13)
    assert(t.exceptAll(t2).isEmpty && t2.exceptAll(t).isEmpty)
  }

  test("text column equals its closed form everywhere") {
    val bad = t.where(!(col("text") <=>
      TranscriptGen.textExpr(col("conv_id"), col("turn_idx"))))
    assert(bad.isEmpty)
  }

  test("injects duplicates, bad roles, bad tools, mega-threads") {
    assert(t.groupBy("conv_id", "turn_idx").count().where(col("count") > 1).count() > 0)
    assert(t.where(col("role") === "invalid_role").count() > 0)
    assert(t.where(col("tool") === "tool_xx").count() > 0)
    val mega = Salting.megaKeys(t, "conv_id", factor = 5.0)
    assert(mega.count() >= 1) // conv_idx % 101 == 0 → convs 0 and 101
  }

  test("ts is strictly monotone in turn_idx within a conversation") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy("turn_idx")
    val dedup = t.dropDuplicates("conv_id", "turn_idx")
    val bad = dedup.withColumn("prev", lag(col("ts"), 1).over(w))
      .where(col("prev").isNotNull && col("ts") <= col("prev"))
    assert(bad.isEmpty)
  }

  test("burst conversations exist: some 10-min bucket holds many turns") {
    val rates = t.groupBy(col("conv_id"), window(col("ts"), "10 minutes"))
      .count()
    assert(rates.where(col("count") >= 18).count() > 0)
  }

  test("salted counts equal plain counts (mergeable two-stage agg)") {
    val plain = t.groupBy("conv_id").count().withColumnRenamed("count", "n")
    val salted = Salting.saltedCounts(t, "conv_id", "turn_idx", salts = 8)
    assert(plain.join(salted, "conv_id")
      .where(plain("n") =!= salted("n")).isEmpty)
  }
}
