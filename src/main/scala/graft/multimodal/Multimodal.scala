package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-batched kernels.
  *
  * The image/audio codec libraries are NOT in this container, so the decode
  * step is a clearly-marked deterministic STUB ([[StubCodec]]) — the
  * Spark-side contract (schema, batching shape, partition sizing, null
  * handling) is real and tested, and a JNI/javacv decoder drops into
  * [[StubCodec]] unchanged.
  *
  * Scale notes: binary payloads dominate row size — repartition by
  * `bytesPerPartition` before a decode stage so one task holds a bounded
  * byte volume (not a bounded row count), and never collect media columns.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))), nullable = true)))

  /** STUB codec: pure functions of the bytes (deterministic, so tests and
    * resumability hold). Replace the bodies with a real decoder (libjpeg /
    * ffmpeg bindings) when available — signatures stay.
    */
  object StubCodec {
    /** ??? real decode — stub derives a D-dim feature from byte content. */
    def decodeToFeatures(media: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < media.length) { h = 31 * h + media(i); i += 1 }
      var d = 0
      while (d < dim) {
        val v = h ^ (0x9e3779b97f4a7c15L * (d + 1))
        out(d) = ((v % 1000003L).toDouble / 1000003.0).toFloat
        d += 1
      }
      out
    }

    /** ??? real resize — stub keeps a deterministic byte slice. */
    def resize(media: Array[Byte], maxBytes: Int): Array[Byte] =
      if (media.length <= maxBytes) media else media.take(maxBytes)

    /** ??? real frame sampling — stub returns every nth byte-block as a
      * "frame" token.
      */
    def sampleFrames(media: Array[Byte], everyN: Int, frameBytes: Int)
        : Seq[Array[Byte]] = {
      // fail at the driver with a message, not inside a task with i % 0
      require(everyN >= 1, s"everyN must be >= 1, got $everyN")
      require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
      media.grouped(frameBytes).zipWithIndex
        .collect { case (b, i) if i % everyN == 0 => b }.toSeq
    }
  }

  /** Feature extraction as a partition-batched kernel: processes rows in
    * micro-batches of `batchSize` (the mapInPandas batch shape), keeping
    * per-task peak memory bounded by batchSize × asset size.
    */
  def extractFeatures(df: DataFrame, dim: Int = 64, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.BINARY)
    import spark.implicits._
    df.select(col("asset_id"), col("media")).as[(Long, Array[Byte])](inEncoder)
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a real vectorized decoder would run once
          batch.iterator.map { case (id, media) =>
            val feat = if (media == null) null
              else StubCodec.decodeToFeatures(media, dim)
            (id, feat)
          }
        }
      }
      .toDF("asset_id", "features")
  }

  /** Resize stage (bounded output size per asset). */
  def resizeMedia(df: DataFrame, maxBytes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("asset_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, m) =>
        (id, if (m == null) null else StubCodec.resize(m, maxBytes))
      })
      .toDF("asset_id", "media_resized")
  }

  /** Deterministic synthetic asset table (binary payload = hash bytes of
    * the id) — the fixture for plumbing tests; no external data.
    */
  def syntheticAssets(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("asset_id"),
      // payload: id rendered then repeated — content-derived, deterministic
      encode(concat_ws("|",
        (0 until 16).map(i => hex(xxhash64(col("id"), lit(i)))): _*), "utf-8")
        .as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("media_type"),
      struct(
        (pmod(xxhash64(col("id"), lit(100)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col("id"), lit(101)), lit(1080)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(xxhash64(col("id"), lit(102)), lit(300)) + 1).cast("int").as("n_frames"))
        .as("meta"))
}
