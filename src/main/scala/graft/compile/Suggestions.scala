package graft.compile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType,
  NumericType, StringType}

import graft.dsl._

/** Constraint suggestion: profile a table once, emit a starter constraint
  * suite that PASSES on the profiled data. The reference hardcodes its
  * per-region thresholds in config (`config/regions.yaml:54-58`); this is
  * the discovery step that writes that config for you — profile a blessed
  * snapshot, render the suggested suite to YAML ([[SuiteConfig.render]]),
  * review, and run it against every future snapshot.
  *
  * Scale shape: one fused aggregation over all columns (exact distincts
  * expand the scan k+1 ways — bounded by column count, not rows), plus one
  * targeted second pass that collects values ONLY for columns the census
  * proved low-cardinality. At 10^12 turns run it on a deterministic sample
  * ([[graft.sample.Sampling.keep]]) — suggestion thresholds are heuristics,
  * not verdicts, so sampling is sound here in a way it never is for the
  * validator itself.
  */
object Suggestions {

  /** The fixed shape battery: candidate value-shape regexes, tried in
    * order — a column whose every non-null value matches one becomes a
    * `matches_regex` suggestion (first hit wins). Fixed and ordered so
    * the suggestion is deterministic and the q91 oracle can replay it.
    */
  val shapeBattery: Seq[String] = Seq(
    "^[0-9]+$",           // bare numeric ids
    "^[a-z]+_[0-9]+$")    // snake prefix + counter (conv_000042 ...)

  /** Per-column census row (driver-side: one row per COLUMN, not per row
    * of data — collecting it is O(columns)).
    */
  final case class ColumnCensus(
      column: String,
      rows: Long,
      nulls: Long,
      distinct: Long,
      min: Option[Double],
      max: Option[Double],
      isString: Boolean,
      isNumeric: Boolean,
      shapeBreaks: Seq[Long] = Nil,
      piiHits: Option[Long] = None,
      lenMin: Option[Long] = None,
      lenMax: Option[Long] = None,
      isVector: Boolean = false,
      dimMin: Option[Long] = None,
      dimMax: Option[Long] = None,
      vecBadElems: Option[Long] = None,
      normMin: Option[Double] = None,
      normMax: Option[Double] = None)

  /** One suggested constraint plus the census evidence that produced it. */
  final case class Suggested(
      column: String,
      suggestion: String,
      lo: Option[Double],
      hi: Option[Double],
      details: Option[String],
      constraint: Constraint)

  private def profiledFields(df: DataFrame, columns: Seq[String]) = {
    // a typo'd requested name must refuse, not silently profile the rest —
    // the caller would believe the column was covered (strictness
    // contract, same as SuiteConfig's unknown-field rejection)
    val missing = columns.filterNot(df.schema.fieldNames.contains)
    require(missing.isEmpty,
      s"columns not in the schema: ${missing.mkString(", ")}")
    val fields =
      if (columns.nonEmpty) df.schema.fields.filter(f => columns.contains(f.name))
      else df.schema.fields
    require(fields.nonEmpty, "no columns to profile")
    fields
  }

  /** The single fused census aggregation (exposed pre-collect so PlanSpec
    * can gate its shape: one pass, string distincts digest-reduced).
    */
  private[graft] def censusFrame(df: DataFrame,
      columns: Seq[String] = Nil): DataFrame = {
    val fields = profiledFields(df, columns)
    val aggs = count(lit(1)).as("__rows") +: fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val minMax = f.dataType match {
        case _: NumericType => Seq(
          min(c).cast("double").as(s"min__${f.name}"),
          max(c).cast("double").as(s"max__${f.name}"))
        case _ => Nil
      }
      // string distincts count a map-side md5 digest, not the value: at
      // 10^12 turns a text column's values must never ride the distinct
      // exchange (same discipline as MaxDuplicateRate / NoConsecutiveRepeats)
      val distArg = f.dataType match {
        case StringType => md5(c.cast("binary"))
        case _ => c
      }
      // shape battery: per string column, how many non-null values BREAK
      // each candidate pattern (zero breaks + high cardinality → suggest
      // matches_regex; enums stay in_set's business). Fused into the same
      // single pass — rlike is a codegen'd scan-side predicate.
      val shapes = f.dataType match {
        case StringType => shapeBattery.zipWithIndex.map { case (p, i) =>
          count(when(c.isNotNull && !c.rlike(p), 1))
            .as(s"shape${i}__${f.name}")
        }
        case _ => Nil
      }
      // PII census: per string column, how many non-null values hit the
      // full graft.text.Pii battery — a clean column becomes a `no_pii`
      // suggestion (bound 0), locking in the observed property the same
      // way value_bounds locks in [min, max]. A column WITH hits gets no
      // suggestion: whether its PII is legitimate is the owner's call,
      // not a profiler's. Fused into the same single pass — the battery
      // is pure codegen'd regex + the Luhn fold.
      val pii = f.dataType match {
        case StringType => Seq(count(when(c.isNotNull &&
            size(graft.text.Pii.matchedKinds(c, graft.text.Pii.allKinds)) > 0,
            1)).as(s"pii__${f.name}"))
        case _ => Nil
      }
      // length census: the string analog of min/max — the observed
      // character-length window becomes a `length_bounds` suggestion
      val lengths = f.dataType match {
        case StringType => Seq(
          min(length(c)).as(s"lenmin__${f.name}"),
          max(length(c)).as(s"lenmax__${f.name}"))
        case _ => Nil
      }
      // vector census: per float/double-array column, the dim range, the
      // count of null/NaN-poisoned vectors, and the L2-norm range over
      // well-formed ones — a constant-dim, observed-clean column becomes
      // a `vector_shape` suggestion (dim + norm bounds locked in the way
      // value_bounds locks [min, max]). Fused into the same single pass —
      // size + two higher-order folds, all codegen.
      val vec = f.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          val bad = exists(c, x => x.isNull || isnan(x.cast("double")))
          val norm = sqrt(aggregate(c, lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")))
          Seq(
            min(when(c.isNotNull, size(c))).as(s"dimmin__${f.name}"),
            max(when(c.isNotNull, size(c))).as(s"dimmax__${f.name}"),
            count(when(c.isNotNull && bad, 1)).as(s"vbad__${f.name}"),
            min(when(c.isNotNull && !bad, norm)).as(s"normmin__${f.name}"),
            max(when(c.isNotNull && !bad, norm)).as(s"normmax__${f.name}"))
        case _ => Nil
      }
      Seq(
        count(when(c.isNull, 1)).as(s"nulls__${f.name}"),
        count_distinct(distArg).as(s"dist__${f.name}")) ++
        minMax ++ shapes ++ pii ++ lengths ++ vec
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** One-pass per-column census: total rows, nulls, exact distinct, and
    * min/max (numeric columns only). Exact distincts (not HLL) because the
    * suggested bounds must hold exactly on the profiled data.
    */
  def census(df: DataFrame, columns: Seq[String] = Nil): Seq[ColumnCensus] = {
    val fields = profiledFields(df, columns)
    val row = censusFrame(df, columns).collect()(0)
    val rows = row.getAs[Long]("__rows")
    fields.toSeq.map { f =>
      def optD(name: String): Option[Double] = {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) None else Some(row.getDouble(i))
      }
      val numeric = f.dataType.isInstanceOf[NumericType]
      val vector = f.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      def optL(name: String): Option[Long] = {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) None
        else Some(row.getAs[Number](i).longValue)
      }
      ColumnCensus(
        column = f.name,
        rows = rows,
        nulls = row.getAs[Long](s"nulls__${f.name}"),
        distinct = row.getAs[Long](s"dist__${f.name}"),
        min = if (numeric) optD(s"min__${f.name}") else None,
        max = if (numeric) optD(s"max__${f.name}") else None,
        isString = f.dataType == StringType,
        isNumeric = numeric,
        shapeBreaks =
          if (f.dataType == StringType)
            shapeBattery.indices.map(i =>
              row.getAs[Long](s"shape${i}__${f.name}"))
          else Nil,
        piiHits =
          if (f.dataType == StringType)
            Some(row.getAs[Long](s"pii__${f.name}"))
          else None,
        lenMin =
          if (f.dataType == StringType) optL(s"lenmin__${f.name}") else None,
        lenMax =
          if (f.dataType == StringType) optL(s"lenmax__${f.name}") else None,
        isVector = vector,
        dimMin = if (vector) optL(s"dimmin__${f.name}") else None,
        dimMax = if (vector) optL(s"dimmax__${f.name}") else None,
        vecBadElems =
          if (vector) Some(row.getAs[Long](s"vbad__${f.name}")) else None,
        normMin = if (vector) optD(s"normmin__${f.name}") else None,
        normMax = if (vector) optD(s"normmax__${f.name}") else None)
    }
  }

  /** Suggest constraints from the census. Rules (all deterministic; the
    * bounds hold on the profiled data GLOBALLY — the validator's
    * per-partition rate verdicts can still flag a partition where e.g.
    * nulls cluster, which is the localization those verdicts exist for):
    *
    *  - `not_null` when the null rate is ≤ `maxNullRateForNotNull`; the
    *    suggested bound is the observed rate rounded UP to 4 decimals so
    *    the constraint holds on the data that produced it.
    *  - `in_set` for string columns with 2..`maxSetSize` distinct values
    *    that actually repeat (distinct < non-null count) — a column where
    *    every value is unique is an id, not an enum.
    *  - `matches_regex` for high-cardinality string columns whose every
    *    non-null value fits a [[shapeBattery]] pattern (first hit wins).
    *  - `value_bounds` [observed min, observed max] for numeric columns.
    *  - `unique_key` for a non-null column whose distinct count equals the
    *    row count.
    *  - `no_pii` for string columns with zero hits across the full
    *    [[graft.text.Pii]] battery — observed-clean becomes a locked-in
    *    bound, like value_bounds; columns WITH hits get no suggestion
    *    (whether their PII is legitimate is the owner's call).
    *  - `length_bounds` [observed min length, observed max length] for
    *    string columns with any non-null value — the value_bounds
    *    lock-in applied to the one string property every corpus bounds.
    *  - `vector_shape` for float/double-array columns whose non-null
    *    vectors all share ONE dim and carry zero null/NaN elements: the
    *    observed dim plus [floor(min norm), ceil(max norm)] at 4 decimals
    *    (padded outward so the bound holds on the data that produced it).
    *    A column with poisoned vectors or varying dims gets no suggestion
    *    — which shape is intended is the owner's call, the no_pii rule.
    */
  def suggest(df: DataFrame, columns: Seq[String] = Nil,
      maxSetSize: Int = 20,
      maxNullRateForNotNull: Double = 0.5): Seq[Suggested] = {
    val cen = census(df, columns)
    val setCandidates = cen.filter(c => c.isString && c.rows > 0 &&
      c.distinct >= 2 && c.distinct <= maxSetSize &&
      c.distinct < c.rows - c.nulls).map(_.column)
    // second pass, only for columns the census proved low-cardinality
    val values: Map[String, Seq[String]] =
      if (setCandidates.isEmpty) Map.empty
      else {
        val aggs = setCandidates.map(c =>
          sort_array(collect_set(col(c))).as(c))
        val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        setCandidates.map(c => c -> r.getSeq[String](r.fieldIndex(c)).toSeq).toMap
      }
    cen.filter(_.rows > 0).flatMap { c =>
      val rate = c.nulls.toDouble / c.rows
      val notNull =
        if (rate <= maxNullRateForNotNull) {
          val bound = math.ceil(rate * 10000) / 10000
          Some(Suggested(c.column, "not_null", None, Some(bound), None,
            NotNull(c.column, maxNullRate = bound)))
        } else None
      val inSet = values.get(c.column).map { vs =>
        Suggested(c.column, "in_set", None, None, Some(vs.mkString(",")),
          InSet(c.column, vs))
      }
      // matches_regex: a HIGH-cardinality string column whose every
      // non-null value fits a battery shape (enums stay in_set's
      // business); first battery hit wins, deterministically
      val shape =
        if (c.isString && c.rows - c.nulls > 0 && c.distinct > maxSetSize)
          c.shapeBreaks.zipWithIndex.collectFirst {
            case (0L, i) =>
              val p = shapeBattery(i)
              Suggested(c.column, "matches_regex", None, None, Some(p),
                MatchesRegex(c.column, p))
          }
        else None
      val bounds =
        if (c.isNumeric && c.min.nonEmpty)
          Some(Suggested(c.column, "value_bounds", c.min, c.max, None,
            ValueBounds(c.column, c.min, c.max)))
        else None
      val unique =
        if (c.nulls == 0 && c.distinct == c.rows && c.rows > 1)
          Some(Suggested(c.column, "unique_key", None, None, None,
            UniqueKey(Seq(c.column))))
        else None
      // no_pii: a string column observed CLEAN across the whole battery
      // locks that property in (bound 0) — a column with hits gets no
      // suggestion; whether its PII is legitimate is the owner's call
      val noPii =
        if (c.isString && c.rows - c.nulls > 0 && c.piiHits.contains(0L))
          Some(Suggested(c.column, "no_pii", None, None,
            Some(graft.text.Pii.allKinds.mkString(",")),
            NoPii(c.column)))
        else None
      // length_bounds: the observed character-length window locked in
      // exactly (the value_bounds pattern for strings)
      val lengths =
        if (c.isString && c.rows - c.nulls > 0)
          c.lenMin.zip(c.lenMax).map { case (lMin, lMax) =>
            Suggested(c.column, "length_bounds", Some(lMin.toDouble),
              Some(lMax.toDouble), None,
              LengthBounds(c.column, Some(lMin), Some(lMax)))
          }
        else None
      // vector_shape: constant-dim, observed-clean float/double arrays
      // lock in the dim and the padded norm window; poisoned or
      // ragged-dim columns get no suggestion (owner's call, like no_pii)
      val vector =
        if (c.isVector && c.rows - c.nulls > 0 &&
            c.vecBadElems.contains(0L) && c.dimMin.nonEmpty &&
            c.dimMin == c.dimMax)
          c.normMin.zip(c.normMax).map { case (nLo, nHi) =>
            val lo = math.floor(nLo * 10000) / 10000
            val hi = math.ceil(nHi * 10000) / 10000
            Suggested(c.column, "vector_shape", Some(lo), Some(hi),
              Some(s"dim=${c.dimMin.get}"),
              VectorShape(c.column, Some(c.dimMin.get.toInt),
                Some(lo), Some(hi)))
          }
        else None
      Seq(notNull, inSet, shape, bounds, unique, noPii, lengths,
        vector).flatten
    }.sortBy(s => (s.column, s.suggestion))
  }

  /** Suggestions as a DataFrame (the q91 oracle shape); lo/hi rounded via
    * Spark's own `round` so the surface is engine-comparable.
    */
  def suggestDf(spark: SparkSession, df: DataFrame,
      columns: Seq[String] = Nil, maxSetSize: Int = 20): DataFrame = {
    import spark.implicits._
    suggest(df, columns, maxSetSize)
      .map(s => (s.column, s.suggestion, s.lo, s.hi, s.details))
      .toDF("column", "suggestion", "lo", "hi", "details")
      .withColumn("lo", round(col("lo"), 6))
      .withColumn("hi", round(col("hi"), 6))
  }

  /** Bundle suggestions into a runnable [[Check]] (render it with
    * [[SuiteConfig.render]] to get the starter YAML).
    */
  def toCheck(name: String, suggestions: Seq[Suggested],
      keyCol: String = "conv_id", orderCol: String = "turn_idx",
      tsCol: String = "ts"): Check =
    Check(name, suggestions.map(_.constraint), keyCol, orderCol, tsCol)
}
