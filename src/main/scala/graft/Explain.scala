package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for the named queries (or a
  * default set) so pushdown/broadcast/codegen can be reviewed.
  *
  *   sbt "runMain graft.Explain [sfDir] [q01 q08 ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan_project_filter", "q02_summary_agg",
        "q08_referential_violations", "q09_rolling_z_violations",
        "q10_turn_rate_bucketing", "q23_full_outer_join", "q37_cosine_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n; known: ${SparkEntry.queries.keys.toSeq.sorted}"))
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
