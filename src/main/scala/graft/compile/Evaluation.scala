package graft.compile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A14: detector evaluation — confusion matrix + precision/recall/F1/
  * accuracy (reference src/anomaly_detection.py:339-386). One groupBy pass;
  * the scalar metrics are arithmetic on the four counts.
  */
object Evaluation {

  /** pred/truth are boolean "is anomaly" columns. Returns a single row:
    * tp/fp/tn/fn + precision/recall/f1/accuracy.
    */
  def confusion(df: DataFrame, predCol: String, truthCol: String): DataFrame = {
    val p = col(predCol)
    val t = col(truthCol)
    df.agg(
      sum(when(p && t, 1).otherwise(0)).as("tp"),
      sum(when(p && !t, 1).otherwise(0)).as("fp"),
      sum(when(!p && !t, 1).otherwise(0)).as("tn"),
      sum(when(!p && t, 1).otherwise(0)).as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp") / (col("tp") + col("fp"))).otherwise(0.0))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          col("tp") / (col("tp") + col("fn"))).otherwise(0.0))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(0.0))
      .withColumn("accuracy",
        (col("tp") + col("tn")) /
          (col("tp") + col("fp") + col("tn") + col("fn")))
  }
}
