package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.GraftSuite

class SourcesSpec extends GraftSuite {

  test("S3: CSV source round-trips with timestamp parsing") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val e = Tables.events(spark, sfTiny)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("create_time_s"),
        col("value"))
    e.coalesce(1).write.option("header", "true").csv(s"$dir/csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/csv")
      .withColumn("ts", to_timestamp(col("create_time_s"), "yyyy-MM-dd HH:mm:ss"))
    assert(back.count() == e.count())
    assert(back.where(col("ts").isNull).isEmpty)
    // values survive the round trip
    val sumCsv = back.agg(round(sum("value"), 4)).collect()(0).getDouble(0)
    val sumPq = e.agg(round(sum("value"), 4)).collect()(0).getDouble(0)
    assert(sumCsv == sumPq)
  }

  test("streaming T1: watermarked turn-rate aggregation over a file stream") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val t = Tables.transcripts(spark, sfTiny)
    t.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(t.schema).parquet(s"$dir/in")
    val agg = graft.streaming.StreamingDrift.turnRateStream(stream)
    val q = agg.writeStream
      .format("memory").queryName("turn_rates")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; batch recompute of
    // the same aggregation bounds it from above
    val streamed = spark.table("turn_rates")
    val batch = t.groupBy(col("conv_id"), window(col("ts"), "1 hour")).count()
    assert(streamed.count() > 0)
    assert(streamed.count() <= batch.count())
    val bad = streamed.join(
      batch.select(col("conv_id"), col("window.start").as("bucket_ts"),
        col("count").as("n_batch")),
      Seq("conv_id", "bucket_ts"))
      .where(col("n_turns") =!= col("n_batch"))
    assert(bad.isEmpty)
  }
}
