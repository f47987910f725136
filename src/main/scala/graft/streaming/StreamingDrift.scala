package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming mode for the T1 turn-rate series (SURVEY.md §2.11:
  * the reference is batch-only; this is the noted streaming seam, kept
  * deliberately thin). The batch drift kernels consume the sink of this
  * stage; stateful constraint evaluation stays batch-side where the
  * checkpoint story lives.
  */
object StreamingDrift {

  /** Watermarked per-conversation turn-rate aggregation over a streaming
    * transcripts source. Append-mode compatible (watermark closes windows).
    *
    * Null-ts rows are filtered up front: a null window group can NEVER be
    * emitted in append mode (no watermark ever passes a null window end)
    * — without the filter those turns silently vanish from the sink while
    * one state-store entry per (conv_id, null-window) lives forever. A
    * null ts is NotNull's finding; the batch kernel's null-bucket row is
    * the one shape this stream cannot reproduce, by Spark's own rules.
    */
  def turnRateStream(stream: DataFrame, bucket: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    stream
      // watermarks need TIMESTAMP (ltz); parquet sources often carry NTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .where(col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(col("conv_id"), window(col("ts"), bucket).as("w"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("conv_id"), col("w.start").as("bucket_ts"), col("n_turns"))

  /** Streaming rolling z on completed buckets is the batch kernel applied
    * to the sink table — documented contract (SURVEY §2.11): T1 streams,
    * stats/decomposition run on the materialized series.
    */

  /** The uniqueness constraint evaluated AT INGEST: duplicate
    * re-deliveries of a turn (at-least-once sources redeliver on retry)
    * are dropped before they ever reach the batch table, keyed on the
    * same (conv_id, turn_idx) the batch UniqueKey constraint checks.
    * `dropDuplicatesWithinWatermark` expires key state with the
    * watermark, so state is O(turns inside the horizon) — a mega-thread
    * costs nothing once its turns age past the watermark, unlike a plain
    * dropDuplicates whose state would grow to 10^12 keys.
    */
  def dedupTurnsStream(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")

  /** Streaming counterpart of [[graft.series.Sessions]]: data-driven
    * session windows via the built-in `session_window` (state merges
    * adjacent windows; the watermark closes sessions whose gap has
    * provably expired, so state is O(open sessions), append-compatible).
    *
    * Boundary nuance vs the batch kernel: session_window's window is
    * `[start, last_ts + gap)` with an EXCLUSIVE end, so an event at
    * exactly `prev + gap` starts a NEW session here, while the batch
    * `diff > gapSeconds` rule keeps it — batch-streaming parity holds for
    * all gaps except exact-`gap` ties (the batch kernel compares at
    * microsecond precision, so "tie" means equality at that resolution).
    */
  def sessionStream(stream: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    stream
      .withColumn("ts", col("ts").cast("timestamp"))
      // null-ts sessions can never close in append mode — see
      // turnRateStream; a null ts is NotNull's finding
      .where(col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(col("conv_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("conv_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_turns"))
}
