package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: align each fact row to the LATEST dimension
  * snapshot at or before the fact's timestamp, per key — the canonical way
  * a transcript turn picks up the model/config/policy version that was live
  * when the turn happened. The reference has no temporal dims (its tables
  * are daily snapshots joined by date string, src/hive_data_loader.py), but
  * any production validation run over 10^12 turns must resolve slowly-
  * changing dimensions; Spark has no ASOF JOIN operator, so this composes
  * one from built-ins (SURVEY §7.3 preference (a)).
  *
  * Two physical strategies, chosen by dim size:
  *
  *  - [[joinAsOf]] (snapshot dims — the overwhelmingly common case): turn
  *    each dim row into its validity interval [ts, next ts) via one lead()
  *    window over the (small) dim, explode intervals to fixed-granularity
  *    buckets, then BROADCAST equi-join the fact on (key, bucket(fact.ts))
  *    plus a residual range filter. The fact side is never shuffled and the
  *    range predicate never degenerates into a BroadcastNestedLoopJoin —
  *    the bucket key keeps it a hash join. Bucket explosion is bounded by
  *    (time span / granularity), paid on the dim side only.
  *
  *  - [[joinAsOfShuffle]] (dims too large to broadcast): the union-sentinel
  *    carry-forward — tag dim rows, union with facts, one window over
  *    (key, ts) carrying the last dim values forward. One shuffle of
  *    fact+dim by key; correct for any dim size, but subject to key skew
  *    (a mega-key's rows land in one partition), so prefer the bucketed
  *    form whenever the dim broadcasts.
  *
  * Ties (fact.ts == dim.ts) match the snapshot at that exact ts, matching
  * DuckDB/pandas `merge_asof` backward semantics.
  */
object AsOf {

  /** Broadcast interval-bucket as-of join (left semantics: fact rows before
    * the first snapshot keep null dim columns).
    *
    * @param fact        fact table
    * @param dim         snapshot table, one row per (key, version ts); must
    *                    be broadcast-small (exploded by ~span/granularity)
    * @param keys        equi-join key columns present on both sides
    * @param factTs      fact timestamp column
    * @param dimTs       dim snapshot-effective timestamp column
    * @param granularity bucket width as a SQL interval unit: "day"/"hour"
    * @param dimCols     dim payload columns to carry onto the fact
    * @param clampTs     upper bound for the OPEN last interval's bucket
    *                    explosion. None computes max(fact.ts) — one extra
    *                    aggregate-only scan of the fact; at 100 TB pass the
    *                    known horizon (e.g. the partition/day being
    *                    validated) to skip that scan. Must be >= every
    *                    fact ts, or later facts lose their last-snapshot
    *                    match.
    */
  def joinAsOf(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      factTs: String, dimTs: String, granularity: String,
      dimCols: Seq[String], clampTs: Option[java.sql.Timestamp] = None)
      : DataFrame = {
    require(Seq("day", "hour", "week").contains(granularity),
      s"unsupported granularity $granularity")
    val keyCols = keys.map(col)

    // validity interval per snapshot: [dimTs, next dimTs) within the key
    val w = Window.partitionBy(keyCols: _*).orderBy(col(dimTs))
    val withEnd = dim.select((keys :+ dimTs) ++ dimCols map col: _*)
      .withColumn("__valid_to", lead(col(dimTs), 1).over(w))

    // guard-rail: a granularity coarser than the dim's typical snapshot
    // spacing is CORRECT but wasteful — every bucket then holds several
    // intervals and each fact row joins against all of them before the
    // range filter prunes to one (week buckets over daily snapshots = 7×
    // join fan-out for nothing). Median positive spacing, not min: one
    // tight snapshot pair in an otherwise-daily dim must not outlaw "day".
    // One tiny agg job on the broadcast-small dim.
    val granMicros = granularity match {
      case "hour" => 3600L * 1000000L
      case "day" => 86400L * 1000000L
      case "week" => 7L * 86400L * 1000000L
    }
    val spacingUs = unix_micros(col("__valid_to")) - unix_micros(col(dimTs))
    val medSpacing = withEnd
      .where(col("__valid_to").isNotNull && spacingUs > 0)
      .agg(percentile_approx(spacingUs, lit(0.5), lit(1000))).first()
    // "hour" (the finest supported unit) is always allowed: a dim
    // snapshotted every 30 min violates the bound for EVERY unit, and
    // rejecting all of them would turn this perf guard into a hard
    // regression — there the modest fan-out is the best available plan.
    // Coarser units stay rejected whenever they exceed the spacing,
    // because "pick a finer granularity" is then actionable advice.
    if (!medSpacing.isNullAt(0) && granularity != "hour")
      require(granMicros <= medSpacing.getLong(0),
        s"granularity '$granularity' is coarser than the dim's median " +
          s"snapshot spacing (${medSpacing.getLong(0) / 1000000L}s): pick a " +
          "finer granularity, or every bucket holds multiple intervals and " +
          "each fact row joins against all of them")

    // the open last interval is clamped (caller horizon, or the fact's max
    // ts via one aggregate-only pass) so its bucket explosion is bounded
    val clamp: Option[Any] = clampTs.orElse {
      val r = fact.agg(max(col(factTs))).first()
      if (r.isNullAt(0)) None else Some(r.get(0))
    }
    if (clamp.isEmpty) {
      // no usable horizon = fact is empty or every factTs is null; left
      // semantics keep all such rows (0 or n) with null dim columns
      return fact.select(fact.columns.map(col) ++
        dimCols.map(c => lit(null).cast(dim.schema(c).dataType).as(c)): _*)
    }
    val maxTs = lit(clamp.get)

    // explode each interval to the buckets it covers; a fact row in bucket b
    // can only match the (unique) interval containing its ts, and that
    // interval covers b — so bucket equality + range filter is exact
    val bucketed = withEnd
      .withColumn("__b0", date_trunc(granularity, col(dimTs)))
      // clamp CLOSED intervals to the horizon too: a snapshot far in the
      // future would otherwise explode its predecessor's interval into
      // years of unmatched buckets (explosion stays <= span/granularity)
      .withColumn("__b1",
        date_trunc(granularity, least(coalesce(col("__valid_to"), maxTs), maxTs)))
      // any interval starting after the last fact has __b1 < __b0 (its
      // end clamps to maxTs) — unmatched by construction, drop it before
      // sequence() would reject the descending range
      .where(col("__b0") <= col("__b1"))
      .withColumn("__bucket",
        explode(sequence(col("__b0"), col("__b1"),
          expr(s"interval 1 $granularity"))))
      .drop("__b0", "__b1")

    val factB = fact.withColumn("__bucket", date_trunc(granularity, col(factTs)))
    val cond = keys.map(k => factB(k) === bucketed(k))
      .reduce(_ && _) && factB("__bucket") === bucketed("__bucket") &&
      factB(factTs) >= bucketed(dimTs) &&
      (bucketed("__valid_to").isNull || factB(factTs) < bucketed("__valid_to"))

    factB.join(broadcast(bucketed), cond, "left")
      .select(fact.columns.map(factB(_)) ++ dimCols.map(bucketed(_)): _*)
  }

  /** Shuffled union-sentinel as-of join for non-broadcastable dims: one
    * window pass carries the latest snapshot values forward onto fact rows.
    * Dim payload travels as a struct so one last(ignoreNulls) carries all
    * columns atomically (no torn version/value pairs).
    */
  def joinAsOfShuffle(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      factTs: String, dimTs: String, dimCols: Seq[String]): DataFrame = {
    val factCols = fact.columns.toSeq
    val payload = struct(dimCols.map(col): _*)
    // equi-join semantics on NULL keys: a window partitionBy groups null
    // keys TOGETHER (unlike a join, where null never matches), so null-key
    // dim rows are dropped here and null-key fact rows get their payload
    // masked below — keeping this tier's output identical to the
    // broadcast tier and to a native ASOF equi-join for dirty keys.
    // Null-TIMESTAMP dim rows are dropped for the same reason: under
    // nulls-first window ordering a null-ts snapshot would sort earliest
    // and carry forward onto facts before the first real snapshot, while
    // the broadcast tier and native ASOF never match it (ts >= NULL is
    // never true)
    val keyNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val dimSide = dim.where(keyNotNull && col(dimTs).isNotNull).select(
      keys.map(col) ++ Seq(col(dimTs).as("__ts"), lit(0).as("__src"),
        payload.as("__payload")): _*)
    val factSide = fact.select(
      keys.map(col) ++ Seq(col(factTs).as("__ts"), lit(1).as("__src"),
        lit(null).cast(dimSide.schema("__payload").dataType).as("__payload"),
        struct(factCols.map(col): _*).as("__fact")): _*)
    val dimAligned = dimSide.withColumn("__fact",
      lit(null).cast(factSide.schema("__fact").dataType))
      .select(factSide.columns.map(col): _*)

    // dim rows sort before fact rows at equal ts (__src 0 < 1), so a fact
    // AT a snapshot ts sees that snapshot — backward/inclusive semantics;
    // the carry-forward IS Windows.ffill over the union
    val carried = graft.series.Windows.ffill(
      factSide.unionByName(dimAligned), "__payload",
      keys, Seq("__ts", "__src"))
      .where(col("__src") === 1)

    carried.select(factCols.map(c => col(s"__fact.$c").as(c)) ++
      dimCols.map(c =>
        when(keyNotNull, col(s"__payload_ffill.$c")).as(c)): _*)
  }
}
