package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round side benchmark (guide §1): replicates the FROZEN
  * Bench.scala per-query phase methodology — identical session confs, a
  * cold single run per query with the cache cleared in between — without
  * touching the frozen harness. Supports a query subset and repeats so a
  * single optimization can be measured in isolation.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.BenchExtra [reps] [q40 q99 ...]"
  *
  * Prints one `[bx] name sec rows` line per (query, rep) plus a summary
  * line with the min per query (min-of-N is the noise armor on this
  * shared host; the driver's single cold observation is bounded below by
  * it). Also supports `--noop` to time via the noop sink (guide §1.4)
  * instead of count().
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val useNoop = args.contains("--noop")
    val rest = args.filterNot(_ == "--noop")
    val reps = rest.headOption.flatMap(a => scala.util.Try(a.toInt).toOption)
      .getOrElse(1)
    val namesArg = rest.drop(if (rest.headOption.exists(a =>
      scala.util.Try(a.toInt).isSuccess)) 1 else 0)
    val names =
      if (namesArg.nonEmpty)
        SparkEntry.queries.keys.toSeq.sorted
          .filter(n => namesArg.exists(n.startsWith))
      else SparkEntry.queries.keys.toSeq.sorted

    // mirror graft.Bench.newSession exactly (frozen) so timings compare
    val scratch = Bench.scratchRoot
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "524288")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.local.dir", Bench.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same warm-up as the frozen query phase
    graft.sources.Tables.events(spark, sfDir).count()
    SparkEntry.queries("q03_column_stats")(spark, sfDir).count()
    spark.sharedState.cacheManager.clearCache()

    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    (1 to reps).foreach { rep =>
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        spark.sparkContext.setJobDescription(s"$name rep$rep")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val n = if (useNoop) {
          df.write.format("noop").mode("overwrite").save(); -1L
        } else df.count()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[bx] $name%-34s $w%8.3f s  ($n rows)  rep$rep")
        mins(name) = math.min(mins.getOrElse(name, Double.MaxValue), w)
        spark.sharedState.cacheManager.clearCache()
      }
    }
    val total = mins.values.sum
    println("[bx] ---- min per query ----")
    mins.toSeq.sortBy(-_._2).foreach { case (n, w) =>
      println(f"[bx-min] $n%-34s $w%8.3f s")
    }
    println(f"[bx] total(min) = $total%.2f s over ${mins.size} queries")
    spark.stop()
  }
}
