package graft.pack

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Token-budget sequence packing: greedily append each key's rows (in
  * order) to the current pack, opening a new pack when the next row would
  * push the pack past `capacity` tokens — the standard next-fit assembly
  * of training sequences into fixed context windows. The reference has no
  * packing concept (its pipelines end at per-row scores); this is part of
  * the beyond-reference LLM-data-pipeline family alongside dedup/sampling.
  *
  * Semantics (mirrored exactly by the q74/q75 DuckDB recursive-CTE twins):
  *  - rows are packed per key in ascending `ordCol` order (ties undefined —
  *    callers use a unique order column, e.g. turn_idx);
  *  - a row joins the current pack unless the pack is non-empty AND
  *    adding it would exceed `capacity`; an oversize single row therefore
  *    always occupies a pack of its own (never split, never dropped);
  *  - null/negative token counts pack as 0 tokens;
  *  - null keys group together (one shared pack sequence), matching
  *    grouped-window null semantics rather than dropping rows.
  *
  * Scale shape: ONE hash Exchange on the key + an in-partition sort — the
  * same shuffle class as any keyed window — then a streaming per-partition
  * pass holding O(1) state (current key, pack index, accumulated tokens).
  * No per-group materialization, no driver collection; a mega-conversation
  * costs one partition's sort like any other keyed window. Packing is
  * inherently sequential WITHIN a key, so per-key streams are the natural
  * parallel unit at 100 TB (shard-level packing = pick a shard id as the
  * key).
  */
object Packing {

  /** Adds `pack_idx` (0-based per key): the next-fit pack each row lands
    * in under `capacity` tokens, reading integer token counts from
    * `tokensCol` (any numeric type; fractional values truncate).
    */
  def nextFitPack(df: DataFrame, keyCol: String, ordCol: String,
      tokensCol: String, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val outSchema = StructType(df.schema.fields :+
      StructField("pack_idx", IntegerType, nullable = false))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val tokIdx = df.schema.fieldIndex(tokensCol)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    // repartition + sortWithinPartitions instead of groupByKey: null keys
    // survive (hash(null) is one partition, nulls-first sort makes them
    // adjacent), nothing is materialized per group, and the plan is a
    // single Exchange — gated in PackingSpec
    df.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol).asc_nulls_first, col(ordCol))
      .mapPartitions { it =>
        var curKey: Any = null
        var haveKey = false
        var pack = 0
        var acc = 0L
        it.map { r =>
          val k = r.get(keyIdx)
          if (!haveKey || k != curKey) {
            haveKey = true; curKey = k; pack = 0; acc = 0L
          }
          val tok = r.get(tokIdx) match {
            case null => 0L
            case n: java.lang.Number => math.max(0L, n.longValue())
            case other => throw new IllegalArgumentException(
              s"token column '$tokensCol' must be numeric, got " +
                other.getClass.getName)
          }
          if (acc > 0 && acc + tok > capacity) { pack += 1; acc = tok }
          else acc += tok
          Row.fromSeq(r.toSeq :+ pack)
        }
      }
  }

  /** Per-pack utilization: row count, token sum and fill ratio against
    * `capacity` — the census a packing run is judged by (mean fill is the
    * padding waste; oversize packs show up as fill_ratio > 1).
    */
  def packSummary(df: DataFrame, keyCol: String, ordCol: String,
      tokensCol: String, capacity: Long): DataFrame =
    packSummaryOf(nextFitPack(df, keyCol, ordCol, tokensCol, capacity),
      keyCol, tokensCol, capacity)

  /** [[packSummary]] over an ALREADY-packed frame (one with `pack_idx`):
    * callers that just ran [[nextFitPack]] summarize the same frame
    * instead of paying the repartition+sort+pack pass a second time.
    */
  def packSummaryOf(packed: DataFrame, keyCol: String,
      tokensCol: String, capacity: Long): DataFrame = {
    require(packed.columns.contains("pack_idx"),
      "packSummaryOf needs a nextFitPack output (missing pack_idx)")
    // the same null/negative normalization nextFitPack applies per row
    val tok: Column = greatest(coalesce(col(tokensCol).cast("long"),
      lit(0L)), lit(0L))
    packed
      .groupBy(col(keyCol), col("pack_idx"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(tok).as("pack_tokens"))
      .withColumn("fill_ratio",
        round(col("pack_tokens") / lit(capacity.toDouble), 6))
  }
}
