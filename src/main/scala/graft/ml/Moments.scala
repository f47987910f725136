package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused first/second-moment pass shared by Mahalanobis and Pca:
  * one aggregation over complete rows → (n, mean, MLE covariance,
  * ddof = 0). Feature columns are cast to double BEFORE summing — an
  * integer column would otherwise sum to LongType (ClassCastException at
  * the driver) and int×int cross-products could overflow before the sum.
  */
private[ml] object Moments {
  def fused(df: DataFrame, cols: Seq[String])
      : (Double, Array[Double], Array[Array[Double]]) = {
    val d = cols.size
    require(d >= 1, "need at least one feature column")
    val xs = cols.map(c => col(c).cast("double"))
    val sums = cols.zip(xs).map { case (c, x) => sum(x).as(s"__s_$c") }
    val crosses = for { i <- 0 until d; j <- i until d } yield
      sum(xs(i) * xs(j)).as(s"__x_${i}_$j")
    val aggs = (count(lit(1)).as("__n") +: sums) ++ crosses
    val row = df.na.drop(cols).agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n").toDouble
    require(n > 1, s"need > 1 complete rows, got ${n.toLong}")
    val mean = cols.map(c => row.getAs[Double](s"__s_$c") / n).toArray
    val cov = Array.ofDim[Double](d, d)
    for { i <- 0 until d; j <- i until d } {
      val m = row.getAs[Double](s"__x_${i}_$j") / n - mean(i) * mean(j)
      cov(i)(j) = m; cov(j)(i) = m
    }
    (n, mean, cov)
  }
}
