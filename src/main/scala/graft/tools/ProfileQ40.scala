package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Tables

/** Stage-level profiler for q40 (minhash → LSH banding → exact verify) —
  * r3 measured the whole query at 21.5s vs 8.1s in r1 on unchanged code,
  * with a host brown-out as the prime suspect. This main times each stage
  * in isolation (and the 32-hash × 16-band signature variant) so a quiet
  * window can attribute the cost: `runMain graft.tools.ProfileQ40 [sfDir]`.
  */
object ProfileQ40 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-q40")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = Tables.documents(spark, dir).cache()
    println(s"[profile] docs = ${docs.count()}")

    (1 to 3).foreach { rep =>
      println(s"-- rep $rep ------------------------------------------------")
      Seq((64, 32), (32, 16)).foreach { case (hashes, bands) =>
        val sigs = time(s"signatures ${hashes}h") {
          val s = Dedup.minhashSignatures(docs, "doc_id", "text",
            shingleK = 3, numHashes = hashes)
          s.cache().count(); s
        }
        val cands = time(s"lsh candidates ${bands}b") {
          val c = Dedup.minhashLshCandidates(sigs, "doc_id", bands = bands,
            estJaccardMin = 0.4)
          c.cache().count(); c
        }
        time(s"verify jaccard") {
          Dedup.verifyJaccard(docs, cands, "doc_id", "text",
            shingleK = 3, threshold = 0.7).count()
        }
        println(s"[profile] candidates(${hashes}x$bands) = ${cands.count()}")
        sigs.unpersist(); cands.unpersist()
      }
      val end2end = time("q40 end-to-end (64x32)") {
        val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64)
        val cands = Dedup.minhashLshCandidates(sigs, "doc_id", 32, 0.4)
        Dedup.verifyJaccard(docs, cands, "doc_id", "text", 3, 0.7).count()
      }
      println(s"[profile] q40 rows = $end2end")
    }
    spark.stop()
  }
}
