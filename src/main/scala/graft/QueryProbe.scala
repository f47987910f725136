package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Tables

/** Stage-level profiler for individual SparkEntry queries (perf triage).
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.QueryProbe q40 /root/testdata/sf0.1"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q40")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[qprobe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    which match {
      case "q40" =>
        val docs = Tables.documents(spark, dir)
        time("warm docs")(docs.count())
        val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
          shingleK = 3, numHashes = 64)
        time("signatures")(sigs.count())
        val sigsC = sigs.persist()
        time("signatures(cached)")(sigsC.count())
        val cands = Dedup.minhashLshCandidates(sigsC, "doc_id", bands = 32,
          estJaccardMin = 0.4)
        time("lsh candidates")(cands.count())
        val candsC = cands.persist()
        candsC.count()
        time("verify jaccard")(
          Dedup.verifyJaccard(docs, candsC, "doc_id", "text", shingleK = 3,
            threshold = 0.7).count())
        time("full q40")(SparkEntry.queries("q40_minhash_lsh")(spark, dir).count())
      case other =>
        val t0 = System.nanoTime()
        SparkEntry.queries.filterKeys(_.startsWith(other)).foreach {
          case (name, fn) =>
            val n = fn(spark, dir).count()
            println(f"[qprobe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
        }
    }
    spark.stop()
  }
}
