package graft

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries: runMain graft.TimeQueries <sfDir> <q...> */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"[time] $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($c rows)")
    }
    spark.stop()
  }
}
