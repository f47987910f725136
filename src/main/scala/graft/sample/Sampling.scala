package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic (hash-salted) sampling for training-data pipelines:
  * downsample over-represented strata (role, language, source) at fixed
  * per-stratum rates, reproducibly — rerunning the job, or resuming it from
  * a checkpoint, selects the SAME rows, which `df.sample()`'s
  * partition-seeded RNG does not guarantee once partitioning changes.
  *
  * The decision is a pure projection (md5 of salt+key compared to a
  * precomputed hex threshold) — codegen'd, no shuffle, no RNG state; and
  * because md5 is engine-independent, the exact sample is reproducible in
  * any other engine for audit (the DuckDB oracle twin recomputes it).
  *
  * Keying on a row id samples rows; [[uniform]] keyed on conv_id samples
  * whole conversations coherently (every turn of a kept conversation is
  * kept) — the right unit for transcript training data. [[stratified]]
  * with per-turn strata (e.g. role) is coherent per (stratum,
  * conversation) block, NOT per conversation: a conversation whose hash
  * passes one stratum's rate but not another's keeps only the passing
  * roles' turns. For whole-conversation stratified sampling, stratify on
  * a per-conversation attribute.
  *
  * Null keys are never sampled (kept = false): SQL's `md5(NULL || ...)`
  * comparison is NULL→filtered, and Spark's `concat_ws` would instead
  * silently collapse all null keys onto one hash — the explicit guard
  * keeps the two engines (and the oracle twin) identical.
  */
object Sampling {

  /** Uniform-in-[0,1) hex threshold for `rate` over the first 12 md5 hex
    * chars (48 bits — granularity 3.6e-15, far below any practical rate).
    */
  private[graft] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    val space = 1L << 48
    // a rate < 1.0 that rounds up to the full space would format as 13
    // chars and lexicographically UNDERSORT 12-char hashes; clamp to
    // space-1 ("ffffffffffff") — off by 16^-12, far under such a rate's
    // distance from 1.0 semantics anyone could observe
    val cut = math.min(space - 1, math.round(rate * space))
    f"$cut%012x"
  }

  /** True iff the row is kept at `rate`, keyed on `key` and `salt`.
    * Lexicographic compare of lowercase hex == numeric compare of the
    * underlying 48-bit value, identically in any engine with md5.
    */
  def keep(key: Column, rate: Double, salt: String): Column =
    if (rate >= 1.0) key.isNotNull
    else if (rate <= 0.0) lit(false)
    else key.isNotNull &&
      substring(md5(concat_ws("|", lit(salt), key)), 1, 12) <
        lit(hexThreshold(rate))

  /** Uniform deterministic sample at `rate`, keyed on `keyCol`. */
  def uniform(df: DataFrame, keyCol: String, rate: Double,
      salt: String = "graft"): DataFrame =
    df.where(keep(col(keyCol), rate, salt))

  /** Stratified deterministic sample: per-stratum rates, unknown strata
    * kept at `defaultRate`. One CASE projection — rows never shuffle.
    */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    val decision = rates.toSeq.sortBy(_._1).foldRight(
      keep(col(keyCol), defaultRate, salt)) { case ((stratum, r), acc) =>
      when(col(strataCol) === lit(stratum), keep(col(keyCol), r, salt))
        .otherwise(acc)
    }
    df.where(decision)
  }
}
