package graft.series

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each conversation's turn stream into
  * sessions wherever the inter-turn gap exceeds `gapSeconds` — the standard
  * segmentation for agent-transcript analytics (a "conversation" id often
  * spans days of sporadic activity; drift/rate checks want the dense
  * bursts). The reference has no session concept (its series are fixed
  * daily buckets); this generalizes its T1 bucketing to data-driven
  * boundaries.
  *
  * Scale shape: ONE window over (key, order) — the same shuffle class as
  * the turn_idx derivation itself, and the partitioner is reusable across
  * both (Catalyst collapses adjacent windows on the same spec). No
  * self-join, no global sort; a mega-conversation costs one partition's
  * sort like any other keyed window (salting/chunking guidance as in
  * [[Windows]]).
  */
object Sessions {

  /** Adds `session_idx` (0-based per key): a new session starts at the
    * first turn and at every turn whose gap from the previous turn exceeds
    * `gapSeconds`. Ordering ties break on `ordCol` for determinism.
    */
  def assign(df: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val prev = lag(col(tsCol), 1).over(w)
    // microsecond-exact gap (unix_timestamp would TRUNCATE each side to
    // whole seconds, misjudging sub-second-resolution gaps near the
    // threshold); ntz timestamps cast via the session tz (UTC everywhere
    // in this engine) so the difference is tz-independent
    val us = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
    val isNew = when(prev.isNull, 1)
      .otherwise((us(col(tsCol)) - us(prev) > gapSeconds * 1000000L).cast("int"))
    // running count of boundaries − 1 = 0-based session index; both windows
    // share one spec, so this is still a single shuffle + sort
    df.withColumn("session_idx",
      (sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)) - 1).cast("int"))
  }

  /** Adds `__gap_us` — the microsecond gap from the previous turn (null
    * for each key's first turn). Same window spec as [[assign]], so
    * `__gap_us > g·10⁶` flags exactly the session boundaries assign()
    * opens past the first; this is the row-level view the
    * [[graft.dsl.MaxSessionGap]] constraint compiles to.
    */
  def withGap(df: DataFrame, keyCol: String, tsCol: String,
      ordCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val us = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
    df.withColumn("__gap_us",
      us(col(tsCol)) - us(lag(col(tsCol), 1).over(w)))
  }

  /** Per-session summary: bounds, turn count, active span. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      gapSeconds: Long): DataFrame =
    assign(df, keyCol, tsCol, ordCol, gapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_timestamp(max(col(tsCol))) -
          unix_timestamp(min(col(tsCol)))).as("span_seconds"))
}
