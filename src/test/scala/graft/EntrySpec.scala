package graft

import org.apache.spark.sql.functions._

class EntrySpec extends GraftSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly exempt") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert((missing -- SparkEntry.oracleExempt).isEmpty,
      s"queries without oracle: ${missing -- SparkEntry.oracleExempt}")
    // and nothing is both exempt and oracle-checked
    assert((SparkEntry.oracleExempt & SparkEntry.oracleSql.keySet).isEmpty)
  }

  test("all queries run non-crashing on sf0.001 with stable schemas") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfTiny)
      val n = df.count()
      assert(n >= 0, name)
      assert(df.columns.distinct.length == df.columns.length, s"$name dup cols")
    }
  }

  test("transcripts view is deterministic and well-formed") {
    val t1 = sources.Tables.transcripts(spark, sfTiny)
    val t2 = sources.Tables.transcripts(spark, sfTiny)
    assert(t1.exceptAll(t2).isEmpty && t2.exceptAll(t1).isEmpty)
    // turn_idx dense from 0 per conversation
    val bad = t1.groupBy("conv_id")
      .agg(min("turn_idx").as("mn"), max("turn_idx").as("mx"), count(lit(1)).as("n"))
      .where(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.isEmpty)
  }

  test("rolling z respects min_periods=24 NaN-head semantics") {
    val flagged = SparkEntry.queries("q09_rolling_z_violations")(spark, sfTiny)
    assert(flagged.where(col("turn_idx") < 23).isEmpty)
  }
}
