package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.agg.Sketches

/** Data profiling: the reference's duck-typed numeric-column discovery +
  * per-feature profile (select_dtypes(number) at
  * src/geological_anomaly_detector.py:80,123,166-169; profile at :445-454),
  * done schema-first and in ONE fused aggregation pass for all columns.
  */
object Profiler {

  /** P3: numeric columns minus key/flag columns (suffix convention mirrors
    * the reference's `_anomaly`/`_score` exclusions).
    */
  def numericColumns(df: DataFrame,
      exclude: Seq[String] = Seq("conv_id", "turn_idx"),
      excludeSuffixes: Seq[String] = Seq("_anomaly", "_score", "_z")): Seq[String] =
    df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType])
      .map(_.name)
      .filterNot(exclude.contains)
      .filterNot(n => excludeSuffixes.exists(n.endsWith))
      .toSeq

  /** P9: ±Inf → null (reference replaces inf then median-fills,
    * src/geological_anomaly_detector.py:96-97).
    */
  def scrubInf(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c) === Double.PositiveInfinity ||
          col(c) === Double.NegativeInfinity, lit(null)).otherwise(col(c)))
    }

  /** One-pass profile of every numeric column: count/nulls/mean/std/min/max
    * + t-digest quantiles + HLL distinct. One wide agg row → long format.
    * The sketch columns make the profile state checkpoint-mergeable.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else numericColumns(df, Nil, Nil)
    require(cols.nonEmpty, "no numeric columns to profile")
    val aggs = cols.flatMap { c =>
      val v = col(c).cast("double")
      Seq(
        count(v).as(s"n__$c"),
        count(when(col(c).isNull, 1)).as(s"nulls__$c"),
        avg(v).as(s"mean__$c"),
        stddev_samp(v).as(s"std__$c"),
        min(v).as(s"min__$c"),
        max(v).as(s"max__$c"),
        Sketches.tdigestAgg(v).as(s"td__$c"),
        approx_count_distinct(col(c)).as(s"hll__$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"n__$c").as("rows"),
        col(s"nulls__$c").as("nulls"),
        col(s"mean__$c").as("mean"),
        col(s"std__$c").as("stddev"),
        col(s"min__$c").as("min"),
        col(s"max__$c").as("max"),
        Sketches.tdigestQuantile(col(s"td__$c"), 0.25).as("p25"),
        Sketches.tdigestQuantile(col(s"td__$c"), 0.5).as("p50"),
        Sketches.tdigestQuantile(col(s"td__$c"), 0.75).as("p75"),
        col(s"hll__$c").as("approx_distinct"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
