package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, Dedup}
import graft.sources.Tables

/** Stage probe for q62 (ngram-jaccard pairs + connected components). */
object ProbeQ62 {
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
      println(f"[p62] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, dir).where(col("doc_id") < 200)
    time("warm")(docs.count())
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleK = 1, threshold = 0.9)
    time("pairs")(pairs.count())
    val pairsC = pairs.persist(); pairsC.count()
    time("cc assign")(
      ConnectedComponents.assign(docs.select("doc_id"), "doc_id",
        pairsC, "a_id", "b_id").count())
    time("full q62")(graft.SparkEntry.queries("q62_dup_components")(spark, dir).count())
    spark.stop()
  }
}
