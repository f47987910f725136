package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic transcript synthesizer (FIXTURES.md §1). Every column is a
  * pure hash function of (conv_idx, turn_idx) — NO RNG state — so any
  * partition of the id space regenerates identical rows. That purity is
  * what the per-turn text-equality invariant and the resumability tests
  * lean on. Mirrors the reference mock generator's shape: round-robin
  * entity codes (reference src/hive_data_loader.py:330-334) and ~5%
  * injected anomalies (:388-411), here as turn-rate bursts, invalid
  * roles/tools, and duplicate keys.
  *
  * Scales by construction: `spark.range(nConvs)` → per-conv turn count →
  * posexplode(sequence) → per-turn hash columns. 10^12 turns is just a
  * bigger range; no driver-side data.
  */
object TranscriptGen {

  val SEED = 42L

  private def h(cols: Column*): Column = xxhash64((lit(SEED) +: cols): _*)
  private def uhash(cols: Column*): Column = pmod(h(cols: _*), lit(1000000007L))

  /** Closed-form turn count for a conversation: heavy-tail — 1 in 101
    * conversations is a mega-thread with `megaFactor`× the base turns.
    */
  def turnCount(convIdx: Column, baseTurns: Int, megaFactor: Int): Column =
    when(pmod(convIdx, lit(101)) === 0, lit(baseTurns * megaFactor))
      .otherwise(lit(baseTurns / 2) + pmod(uhash(convIdx, lit(1)), lit(baseTurns)))

  /** Closed-form text of a turn — the invariant the engine re-verifies
    * per-row under stable (conv_id, turn_idx) ordering.
    */
  def textExpr(convId: Column, turnIdx: Column): Column = {
    val words = array(Seq("agent", "tool", "call", "plan", "result", "check",
      "state", "drift", "turn", "reply", "query", "step", "trace", "model",
      "token", "score").map(lit): _*)
    val w1 = element_at(words, (pmod(uhash(convId, turnIdx, lit(2)), lit(16)) + 1).cast("int"))
    val w2 = element_at(words, (pmod(uhash(convId, turnIdx, lit(3)), lit(16)) + 1).cast("int"))
    val w3 = element_at(words, (pmod(uhash(convId, turnIdx, lit(5)), lit(16)) + 1).cast("int"))
    concat_ws(" ", lit("turn"), turnIdx.cast("string"), lit("of"), convId,
      w1, w2, w3)
  }

  /** Generate the transcripts fact table.
    *
    * @param nConvs       conversations
    * @param baseTurns    mean-ish turns per conversation
    * @param megaFactor   mega-thread multiplier (skew)
    * @param dupRate      1/dupRate of turns get a duplicated (conv,turn) key
    * @param badRoleRate  1/badRoleRate turns carry an out-of-dim role
    * @param burstRate    1/burstRate conversations get a turn-rate burst
    */
  def generate(spark: SparkSession, nConvs: Long, baseTurns: Int = 40,
      megaFactor: Int = 50, dupRate: Int = 997, badRoleRate: Int = 211,
      burstRate: Int = 20): DataFrame = {
    val convs = spark.range(nConvs).select(
      col("id").as("conv_idx"),
      // floor at 1: n_turns = 0 would make sequence(0, -1) emit a bogus
      // descending [0, -1] pair (turn_idx = -1) instead of zero rows
      greatest(lit(1), turnCount(col("id"), baseTurns, megaFactor)).as("n_turns"))

    val turns = convs.select(
      col("conv_idx"),
      posexplode(sequence(lit(0), (col("n_turns") - 1).cast("int"))).as(Seq("turn_idx", "_z")))
      .drop("_z")

    val convId = format_string("conv_%08d", col("conv_idx"))
    val turnIdx = col("turn_idx")
    val roleIdx = pmod(turnIdx, lit(4))
    val role = when(pmod(uhash(col("conv_idx"), turnIdx, lit(7)), lit(badRoleRate)) === 0,
      lit("invalid_role"))
      .otherwise(element_at(array(lit("user"), lit("assistant"), lit("system"),
        lit("tool")), (roleIdx + 1).cast("int")))
    val tool = when(role === "tool",
      when(pmod(uhash(col("conv_idx"), turnIdx, lit(11)), lit(499)) === 0, lit("tool_xx"))
        .otherwise(format_string("tool_%02d",
          pmod(uhash(col("conv_idx"), turnIdx, lit(13)), lit(16)))))

    // conversation start within a fixed 30-day window; per-turn offsets are
    // closed-form monotonic (jitter < cadence). Burst conversations compress
    // the cadence to ~1s for turns in the middle third (turn-rate anomaly).
    val start = lit(1704067200L) + pmod(uhash(col("conv_idx"), lit(17)), lit(30L * 86400))
    val isBurst = pmod(uhash(col("conv_idx"), lit(19)), lit(burstRate)) === 0
    val burstFrom = lit(baseTurns / 3)
    val burstLen = lit(baseTurns / 3)
    val burstTurnsSoFar = greatest(lit(0),
      least(turnIdx.cast("long"), burstFrom + burstLen) - burstFrom)
    val inBurst = isBurst && turnIdx >= burstFrom && turnIdx < burstFrom + burstLen
    // jitter < remaining cadence keeps ts strictly monotone (burst cadence
    // is 1s, so burst turns carry no jitter)
    val jitter = when(inBurst, lit(0L))
      .otherwise(pmod(uhash(col("conv_idx"), turnIdx, lit(23)), lit(30)))
    val baseOffset = turnIdx.cast("long") * 60 + jitter
    val offset = when(isBurst, baseOffset - burstTurnsSoFar * 59).otherwise(baseOffset)
    val ts = timestamp_seconds(start + offset)

    val base = turns.select(
      convId.as("conv_id"),
      turnIdx.cast("int").as("turn_idx"),
      role.as("role"),
      textExpr(convId, turnIdx.cast("int")).as("text"),
      tool.as("tool"),
      ts.as("ts"))

    // inject duplicate (conv_id, turn_idx) keys for uniqueness goldens
    val dups = base.where(pmod(xxhash64(lit(SEED), col("conv_id"), col("turn_idx"), lit(29)),
      lit(dupRate)) === 0)
    base.unionAll(dups)
  }
}
