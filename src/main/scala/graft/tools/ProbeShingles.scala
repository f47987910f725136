package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.TextAnalysis

/** Micro-probe for the minhash chain cost model (optimization round):
  * times each sub-piece of the q40 signature stage in isolation.
  *   sbt "runMain graft.tools.ProbeShingles /root/testdata/sf0.1"
  */
object ProbeShingles {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ps] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    time("docs count")(docs.count())
    time("normalized only")(
      docs.select(length(TextAnalysis.normalized(col("text"))).as("l"))
        .agg(sum("l")).collect())
    time("tokens explode")(
      docs.select(explode(split(TextAnalysis.normalized(col("text")), " "))).count())
    time("shingle strings explode")(
      docs.select(explode(TextAnalysis.shingleHashes(col("text"), 3))).count())
    time("shingles again (warm)")(
      docs.select(explode(TextAnalysis.shingleHashes(col("text"), 3))).count())
    // 64 hashes in the projection, no agg
    val sh = docs.select(col("doc_id"),
      explode(TextAnalysis.shingleHashes(col("text"), 3)).as("sh"))
    time("64 hash projection")(
      sh.select((0 until 64).map(s => xxhash64(col("sh"), lit(s)).as(s"h$s")): _*)
        .agg(sum("h0")).collect())
    val aggs = (0 until 64).map(s => min(xxhash64(col("sh"), lit(s))).as(s"mh_$s"))
    time("64-min groupBy agg")(
      sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count())
    time("64-min groupBy agg (warm)")(
      sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count())
    time("full minhashSignatures")(
      graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64).count())
    // the map-side alternative shape: per-row signature via transform
    val shArr = TextAnalysis.shingleHashes(col("text"), 3)
    val sigExpr = array((0 until 64).map(s =>
      array_min(transform(col("__sh"), x => xxhash64(x, lit(s))))): _*)
    time("map-side transform sigs")(
      docs.select(col("doc_id"), shArr.as("__sh"))
        .where(size(col("__sh")) > 0)
        .select(col("doc_id"), sigExpr.as("signature")).count())
    time("map-side transform sigs (warm)")(
      docs.select(col("doc_id"), shArr.as("__sh"))
        .where(size(col("__sh")) > 0)
        .select(col("doc_id"), sigExpr.as("signature")).count())
    spark.stop()
  }
}
