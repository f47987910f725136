package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.{Ivf, Similarity}
import graft.compile.{Suggestions, Validator}
import graft.dedup.Dedup
import graft.dsl._
import graft.multimodal.Multimodal
import graft.series.{Decomposition, Drift, Windows}
import graft.sources.Tables
import graft.text.TextAnalysis

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the training-data pipeline families), each with an exact
  * DuckDB oracle over the same parquet where SQL can express it; the
  * non-SQL-expressible ops (sketches, STL, LSH, EWM, multimodal) are listed
  * in `oracleExempt` and get the driver's rows-only check.
  *
  * Column names are aliased identically on both sides (driver hash-compares
  * after sorting columns by name). Double aggregates whose value depends on
  * accumulation order are rounded identically on both sides.
  */
object SparkEntry {

  /** Flagship: the full constraint suite over the transcripts view —
    * verdict rows for uniqueness / RI / completeness / turn-rate drift
    * (north-star shape) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q50_validation_suite")(spark, "/root/testdata/sf0.001")

  // ---- shared helpers -----------------------------------------------------

  private def withScalars(df: DataFrame, scalars: DataFrame): DataFrame =
    df.crossJoin(broadcast(scalars))

  /** events with nulls injected on 'error' rows (fixture for fill/interp). */
  private def eventsWithNulls(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("v",
      when(col("event_type") === "error", lit(null).cast("double"))
        .otherwise(col("value")))

  private val userOrder = Seq("ts", "event_id")

  // q39 LSH-ANN parameters, shared by the Spark plan and its SQL oracle
  // twin so the two pipelines stay in lockstep.
  private val annPlanes = 8
  private val annTables = 8
  private val annDims = 64

  // q60 IVF-ANN cell count (pinned-centroid search-path twin)
  private val ivfCells = 8

  /** Shared q67/q69 as-of fixture: every-3rd-day (role, day) snapshot dim
    * with a per-role version counter — ONE definition so the broadcast and
    * shuffle tiers provably join the identical dim.
    */
  private def every3rdDaySnapshots(t: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    t.select(col("role"),
        date_trunc("day", col("ts")).as("valid_from")).distinct()
      .where(pmod(datediff(to_date(col("valid_from")),
        lit("2000-01-01").cast("date")), lit(3)) === 0)
      .withColumn("version", row_number().over(
        Window.partitionBy(col("role")).orderBy(col("valid_from"))))
  }

  /** Global hourly event-count series with constant key (decomposition fixture). */
  private def hourlySeries(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket_ts"))
      .agg(count(lit(1)).cast("double").as("y"))
      .withColumn("k", lit("all"))

  private def decomposedHourly(s: SparkSession, dir: String): DataFrame =
    Decomposition.additive(hourlySeries(s, dir), "y", 24, Seq("k"), Seq("bucket_ts"))

  // ---- queries ------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2/P1-P6: canonical projection scan with pushed predicates
    // (reference: sql/get_di.sql:1-19, src/hive_data_loader.py:269-308)
    "q01_scan_project_filter" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
        .where(col("value").isNotNull &&
          col("event_type").isin("click", "view", "purchase") &&
          col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-22 00:00:00").cast("timestamp"))
    }),

    // A1/A8: grouped multi-agg summary (reference src/hive_data_loader.py:528-533)
    "q02_summary_agg" -> ((s, dir) => {
      Tables.events(s, dir).groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        countDistinct(col("event_type")).as("n_types"),
        round(sum(col("value")), 4).as("sum_value"))
    }),

    // A2/A3/A7/A16: fused global column stats in ONE aggregation pass
    "q03_column_stats" -> ((s, dir) => {
      Tables.events(s, dir).agg(
        count(lit(1)).as("rows"),
        (count(lit(1)) - count(col("value"))).as("nulls"),
        round(avg(col("value")), 6).as("mean"),
        round(stddev_samp(col("value")), 6).as("stddev"),
        round(var_pop(col("value")), 6).as("var_pop_v"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))
    }),

    // A4/A5: exact quantiles + IQR
    "q04_quantiles" -> ((s, dir) => {
      Tables.events(s, dir).agg(
        round(expr("percentile(value, 0.25)"), 6).as("q1"),
        round(expr("percentile(value, 0.5)"), 6).as("med"),
        round(expr("percentile(value, 0.75)"), 6).as("q3"),
        round(expr("percentile(value, 0.75) - percentile(value, 0.25)"), 6).as("iqr"))
    }),

    // A6: MAD / modified z-score outliers
    "q05_robust_z_outliers" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val med = e.agg(expr("percentile(value, 0.5)").as("med"))
      val withMed = withScalars(e, med)
      val mad = withMed.agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      withScalars(withMed, mad)
        // mad = 0 (>=50% of values identical) ⇒ null rz, nothing flagged;
        // the unguarded divide would ANSI-crash on such data
        .withColumn("rz", when(col("mad") > 0,
          lit(0.6745) * (col("value") - col("med")) / col("mad")))
        .where(abs(col("rz")) > 3.5)
        .select(col("event_id"), col("value"), round(col("rz"), 4).as("rz"))
    }),

    // T5 (IQR rule): global IQR fence outliers, k=1.5
    "q06_iqr_outliers" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val q = e.agg(
        expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"))
      withScalars(e, q)
        .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
        .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
        .where(col("value") < col("lo") || col("value") > col("hi"))
        .select(col("event_id"), col("value"), round(col("lo"), 6).as("lo"),
          round(col("hi"), 6).as("hi"))
    }),

    // Uniqueness constraint: duplicate-key census
    "q07_uniqueness_violations" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"),
          date_trunc("hour", col("ts")).as("bucket_ts"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") > 1)
    }),

    // J2: referential integrity via broadcast left-anti join
    "q08_referential_violations" -> ((s, dir) => {
      Tables.transcripts(s, dir)
        .join(broadcast(Tables.roleDim(s)), Seq("role"), "left_anti")
        .select(col("conv_id"), col("turn_idx"), col("role"))
    }),

    // W1/W2: per-conversation rolling z with min_periods parity
    "q09_rolling_z_violations" -> ((s, dir) => {
      val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
        .rowsBetween(-23, 0)
      Tables.transcripts(s, dir)
        .withColumn("n_win", count(col("value")).over(w))
        .withColumn("roll_mean", avg(col("value")).over(w))
        .withColumn("roll_std", stddev_samp(col("value")).over(w))
        // constant window (std = 0) ⇒ null z, not a violation (ANSI-safe)
        .withColumn("z", when(col("roll_std") > 0,
          (col("value") - col("roll_mean")) / col("roll_std")))
        .where(col("n_win") >= 24 && abs(col("z")) > 3)
        .select(col("conv_id"), col("turn_idx"), col("value"),
          round(col("z"), 4).as("z"))
    }),

    // T1: ts-bucketed turn-rate series
    "q10_turn_rate_bucketing" -> ((s, dir) => {
      Tables.transcripts(s, dir)
        .groupBy(col("conv_id"), date_trunc("hour", col("ts")).as("bucket_ts"))
        .agg(count(lit(1)).as("n_turns"), round(avg(col("value")), 6).as("mean_value"))
    }),

    // W5: cumulative sum per user (reference rainfall total_value)
    "q11_cumsum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(userOrder.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), round(sum(col("value")).over(w), 6).as("cum_value"))
    }),

    // W6: forward fill of injected nulls
    "q12_ffill" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(userOrder.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      eventsWithNulls(s, dir)
        .select(col("event_id"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
    }),

    // T3: classical additive decomposition of the hourly series (period 24,
    // even-period 2xMA trend, phase-mean seasonal) — the pure-DataFrame
    // decomposition path (reference src/decomposition.py:75-109)
    "q13_classical_decomposition" -> ((s, dir) => {
      decomposedHourly(s, dir)
        .select(col("idx"), col("y"), round(col("trend"), 6).as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          round(col("resid"), 6).as("resid"))
    }),

    // T4: trend/seasonal strength (reference src/decomposition.py:183-227)
    "q14_strengths" -> ((s, dir) => {
      Decomposition.strengths(decomposedHourly(s, dir), Seq("k"))
        .select(round(col("trend_strength"), 6).as("trend_strength"),
          round(col("seasonal_strength"), 6).as("seasonal_strength"),
          col("n_resid"))
    }),

    // T10: PSI between first/second half of the month (equal-frequency bins
    // from the baseline side)
    "q15_psi" -> ((s, dir) => {
      val sided = Tables.events(s, dir).withColumn("k", lit("all"))
        .withColumn("side",
          when(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"),
            "baseline").otherwise("current"))
      Drift.psi(sided, "value", "side", Seq("k"))
        .select(round(col("psi"), 6).as("psi"))
    }),

    // T10: exact two-sample KS, error-type values vs the rest
    "q16_ks" -> ((s, dir) => {
      val sided = Tables.events(s, dir).withColumn("k", lit("all"))
        .withColumn("side",
          when(col("event_type") === "error", "current").otherwise("baseline"))
      Drift.ks(sided, "value", "side", Seq("k"))
        .select(round(col("ks"), 6).as("ks"))
    }),

    // O3: top-k by aggregate (TakeOrderedAndProject)
    "q17_topk_users" -> ((s, dir) => {
      Tables.events(s, dir).groupBy(col("user_id"))
        .agg(round(sum(col("value")), 4).as("total"))
        .orderBy(desc("total"), col("user_id"))
        .limit(5)
    }),

    // U1: union of per-table summaries
    "q18_union_summaries" -> ((s, dir) => {
      Seq("orders", "lineitem", "customer").map { t =>
        Tables.read(s, dir, t).agg(count(lit(1)).as("n_rows"))
          .withColumn("table_name", lit(t))
      }.reduce(_ unionByName _).select("table_name", "n_rows")
    }),

    // F8/F9/A13: min-max normalization + level bucketing
    "q19_minmax_levels" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val stats = e.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      withScalars(e, stats)
        // constant column (mx = mn) ⇒ null score → 'normal' (ANSI-safe)
        .withColumn("score", when(col("mx") > col("mn"),
          (col("value") - col("mn")) / (col("mx") - col("mn"))))
        .select(col("event_id"), round(col("score"), 6).as("score"),
          when(col("score") > 0.8, "high").when(col("score") > 0.6, "medium")
            .when(col("score") > 0.3, "low").otherwise("normal").as("level"))
    }),

    // P10: 3σ winsorize — replaced values only (reference src/hive_data_loader.py:19-22)
    "q20_winsorize" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val stats = e.agg(avg(col("value")).as("mu"),
        stddev_samp(col("value")).as("sigma"))
      withScalars(e, stats)
        .where(abs(col("value") - col("mu")) > lit(3) * col("sigma"))
        .select(col("event_id"), col("value"), round(col("mu"), 6).as("clamped"))
    }),

    // A12: ensemble 2-of-3 vote across outlier constraints
    // (reference src/geological_anomaly_detector.py:209-213)
    "q21_ensemble_vote" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val st = e.agg(
        expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"),
        expr("percentile(value, 0.5)").as("med"),
        avg(col("value")).as("mu"),
        stddev_pop(col("value")).as("sigma"))
      val withSt = withScalars(e, st)
      val mad = withSt.agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      val flagged = withScalars(withSt, mad)
        .withColumn("f_iqr",
          (col("value") < col("q1") - lit(1.5) * (col("q3") - col("q1"))) ||
            (col("value") > col("q3") + lit(1.5) * (col("q3") - col("q1"))))
        // degenerate stats (mad/sigma = 0) ⇒ detector contributes no vote
        .withColumn("f_rz", coalesce(when(col("mad") > 0,
          abs(lit(0.6745) * (col("value") - col("med")) / col("mad")) > 3.5),
          lit(false)))
        .withColumn("f_gz", coalesce(when(col("sigma") > 0,
          abs((col("value") - col("mu")) / col("sigma")) > 3.0), lit(false)))
      Drift.ensembleVote(flagged, Seq("f_iqr", "f_rz", "f_gz"), k = 2, "is_anomaly")
        .where(col("is_anomaly"))
        .select(col("event_id"),
          (col("f_iqr").cast("int") + col("f_rz").cast("int") +
            col("f_gz").cast("int")).as("votes"))
    }),

    // A15: feature importance = var_pop(col) * |corr(col, score)|, normalized
    // (reference src/geological_anomaly_detector.py:343-386)
    "q22_feature_importance" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("score", col("l_extendedprice") * (lit(1) - col("l_discount")))
      val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = feats.flatMap(f => Seq(
        var_pop(col(f)).as(s"var_$f"),
        abs(corr(col(f), col("score"))).as(s"corr_$f")))
      val row = li.agg(aggs.head, aggs.tail: _*)
      val stacked = row.select(
        expr("stack(4, " + feats.map(f =>
          s"'$f', var_$f * corr_$f").mkString(", ") + ") as (feature, raw)"))
      val w = Window.partitionBy()
      stacked.select(col("feature"),
        round(col("raw") / sum(col("raw")).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)), 6)
          .as("importance"))
    }),

    // J1: full-outer equi-join of two sparse per-(user, day) aggregates
    "q23_full_outer_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("clicks"))
      val purchases = e.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("purchases"))
      clicks.join(purchases, Seq("user_id", "day"), "full_outer")
        .select(col("user_id"), col("day"),
          coalesce(col("clicks"), lit(0L)).as("clicks"),
          coalesce(col("purchases"), lit(0L)).as("purchases"))
    }),

    // W7: linear time-interpolation of injected nulls, edge-filled
    "q24_interpolate" -> ((s, dir) => {
      val base = eventsWithNulls(s, dir)
        .withColumn("idx", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(userOrder.map(col): _*)))
      Windows.interpolate(base, "v", "idx", Seq("user_id"), Seq("idx"))
        .select(col("event_id"), round(col("v_interp"), 6).as("interp"))
    }),

    // F1-F7: scalar date/string/math function family end-to-end
    "q25_scalar_functions" -> ((s, dir) => {
      Tables.events(s, dir).select(
        col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm").as("ts_str"),
        (col("ts") + expr("INTERVAL 1 DAY")).as("ts_next"),
        format_string("%.2f", col("value")).as("v2"),
        round(col("value") - 273.15, 6).as("v_celsius"),
        abs(col("value") - 100).as("v_abs"),
        concat_ws("_", col("event_type"), pmod(col("event_id"), lit(10))).as("code"))
    }),

    // W3: centered rolling mean (smoothing)
    "q26_centered_smooth" -> ((s, dir) => {
      Windows.centeredMean(Tables.events(s, dir), "value", 5,
        Seq("user_id"), userOrder)
        .select(col("event_id"), round(col("value_smooth"), 6).as("smooth"))
    }),

    // T7: decomposition-based forecast — linear trend extrapolation from the
    // last two trend points + seasonal pattern cycling
    // (reference src/decomposition.py:313-362)
    "q27_forecast" -> ((s, dir) => {
      graft.series.SeriesKernels.forecast(decomposedHourly(s, dir), "k", "idx",
        period = 24, periods = 24)
        .select(col("step"), round(col("forecast"), 6).as("forecast"))
    }),

    // ---- training-data pipeline: documents/embeddings ----------------------

    // Dedup (exact): duplicate pairs by content digest
    "q30_dedup_exact" -> ((s, dir) => {
      Dedup.exactDuplicates(Tables.documents(s, dir), "doc_id", "text")
    }),

    // Dedup (normalized identity): per-doc fingerprint — validates the
    // normalization+digest used by the near-dup family on every document
    "q31_fingerprints" -> ((s, dir) => {
      Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    }),

    // Token counting: whitespace + BPE-ish subword estimate
    "q32_token_counts" -> ((s, dir) => {
      Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"),
        TextAnalysis.bpeishCount(col("text")).as("n_bpeish"))
    }),

    // Language ID (marker-token heuristic)
    "q33_lang_id" -> ((s, dir) => {
      Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
    }),

    // Quality scoring
    "q34_quality" -> ((s, dir) => {
      TextAnalysis.qualityScore(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("n_chars"), col("n_tokens"),
          round(col("mean_token_len"), 6).as("mean_token_len"),
          round(col("punct_ratio"), 6).as("punct_ratio"),
          round(col("digit_ratio"), 6).as("digit_ratio"),
          round(col("stopword_ratio"), 6).as("stopword_ratio"),
          col("quality_score"))
    }),

    // n-gram (token) Jaccard near-dup pairs, exact inverted-index join
    "q35_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(
        Tables.documents(s, dir).where(col("doc_id") < 60),
        "doc_id", "text", shingleK = 1, threshold = 0.5)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // SimHash near-dups. maxHamming = 3 with 4 chunks is the banding-sound
    // configuration (pigeonhole covers the radius exactly — Manku/Google's
    // canonical 64-bit simhash dedup operating point); the md5-anchored
    // reproducible signature lets DuckDB recompute hamming exactly.
    "q36_simhash_neardups" -> ((s, dir) => {
      val sims = Dedup.simhashReproducible(Tables.documents(s, dir), "doc_id", "text")
      Dedup.simhashNearDups(sims, "doc_id", maxHamming = 3)
    }),

    // Brute-force cosine top-k (exact ANN baseline)
    "q37_cosine_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopK(q, e, "q_id", "vec_id", "q_vec", "embedding", 5)
        .select(col("q_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"))
    }),

    // Embedding near-dup pairs, brute force (exact)
    "q38_embedding_neardups" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).where(col("vec_id") < 500)
      val l = e.select(col("vec_id").as("a_id"), col("embedding").as("va"))
      val r = e.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
      l.join(r, col("a_id") < col("b_id"))
        .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
        .where(col("cos") >= 0.4)
        .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
    }),

    // LSH-bucketed ANN (the scale path). The hyperplane matrix is an
    // md5-derived plan-time literal, so the DuckDB oracle replicates the
    // ENTIRE pipeline (buckets → candidate join → cosine re-rank) exactly;
    // EntrySpec separately gates recall vs the exact q37 baseline.
    "q39_ann_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.annTopK(q, e, "q_id", "vec_id", "q_vec", "embedding",
        k = 5, planes = annPlanes, tables = annTables, dims = annDims)
        .select(col("q_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
    }),

    // MinHash LSH candidates → exact-Jaccard verification (the production
    // dedup pipeline shape). 32 bands × 2 rows: P(miss a true 0.7-Jaccard
    // pair) = (1 - 0.7^2)^32 ≈ 4e-10, so the exact all-pairs SQL is a
    // sound oracle. 3-token shingles: near-unique per doc (k=1 would
    // collide every doc through the small vocab).
    "q40_minhash_lsh" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sigs = Dedup.minhashSignatures(docs, "doc_id",
        "text", shingleK = 3, numHashes = 64)
      // banding-only candidates: the est_jaccard >= 0.4 prefilter is
      // strictly dominated by the exact verification at threshold 0.7
      // (the oracle IS the exact pair set — a superset of candidates,
      // exactly verified, is the same output with two fewer joins)
      val cands = Dedup.minhashBandPairs(sigs, "doc_id", bands = 32,
        sigLen = 64)
      Dedup.verifyJaccard(docs, cands, "doc_id", "text", shingleK = 3,
        threshold = 0.7)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // Multimodal plumbing: binary assets → feature extraction. The media
    // bytes are the utf-8 encoding of documents.text, so the DuckDB twin
    // replays the ENTIRE stub codec (rolling byte hash → per-dim mix →
    // signed mod) over the same bytes — a byte-level oracle for the
    // partition-batched kernel. Features are floats of v/1000003 with
    // |v| < 2^20, so round(f·1000003) recovers the integer v exactly.
    "q41_multimodal_features" -> ((s, dir) => {
      val assets = Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(col("doc_id").as("asset_id"),
          encode(col("text"), "utf-8").as("media"))
      val feats = Multimodal.extractFeatures(assets, dim = 4)
      feats.select((col("asset_id") +: (0 until 4).map(d =>
        round(element_at(col("features"), d + 1) * 1000003.0)
          .cast("long").as(s"r$d"))): _*)
    }),

    // W4: exponentially weighted mean (no SQL twin; rows-only oracle)
    "q42_ewm" -> ((s, dir) => {
      Windows.ewm(Tables.events(s, dir), "value", span = 10,
        Seq("user_id"), userOrder)
        .select(col("event_id"), round(col("value_ewm"), 6).as("ewm"))
    }),

    // North-star engine output: per-conversation RI verdict rows, produced
    // by the Validator itself (oracle recomputes them in SQL)
    "q49_verdicts_referential" -> ((s, dir) => {
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("t", Seq(ReferentialIntegrity("role", "role_dim", "role"))),
        Validator.Context(Map("role_dim" -> Tables.roleDim(s))))
      r.verdicts.where(col("partition_key") =!= "(global)")
        .select(col("partition_key"), col("pass"), col("rows"),
          col("violations"),
          round(col("violation_rate"), 6).as("violation_rate"))
    }),

    // Report rollup: the reference's by_method / by_monitor_point report
    // sections (src/geological_anomaly_detector.py:403-454) fused into ONE
    // grouping-sets pass over the violation rows
    "q51_report_rollup" -> ((s, dir) => {
      val v = Tables.transcripts(s, dir)
        .where(col("role") === "invalid_role" || col("tool") === "tool_xx")
        .select(
          when(col("role") === "invalid_role", "ref(role)")
            .otherwise("ref(tool)").as("constraint"),
          col("conv_id"))
      v.rollup(col("constraint"), col("conv_id"))
        .agg(count(lit(1)).as("n_violations"))
    }),

    // T3 multiplicative: ratio decomposition (the reference's mock rainfall
    // path is multiplicative, src/hive_data_loader.py:27-32)
    "q43_mult_decomposition" -> ((s, dir) => {
      Decomposition.multiplicative(hourlySeries(s, dir), "y", 24,
        Seq("k"), Seq("bucket_ts"))
        .select(col("idx"), col("y"), round(col("trend"), 6).as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          round(col("resid"), 6).as("resid"))
    }),

    // T6 ADF stationarity (reference analyze_stationarity,
    // src/decomposition.py:111-138). Fixed lag 0 = the plain DF regression,
    // which has a closed-form OLS t-stat the SQL oracle reproduces; the
    // autolag-AIC path is spec-tested (StationaritySpec differential
    // golden).
    "q44_adf_stationarity" -> ((s, dir) => {
      val series = hourlySeries(s, dir).withColumn("idx",
        row_number().over(Window.partitionBy(col("k")).orderBy(col("bucket_ts"))) - 1)
      graft.series.Stationarity.adf(series, "k", "idx", "y",
        maxlag = 0, autolag = false)
        .select(col("k"), round(col("adf_stat"), 6).as("adf_stat"),
          col("used_lag"), col("nobs"),
          round(col("crit_5pct"), 6).as("crit_5pct"), col("stationary"))
    }),

    // T6 with a FIXED lag 2: exercises the augmented (multi-regressor)
    // OLS path end-to-end against a closed-form SQL twin — the 4-column
    // regression's normal equations are solved in DuckDB by Cramer's rule
    // over centered moments (autolag stays golden-gated in
    // StationaritySpec; q44 covers the lag-0 path)
    "q44b_adf_lag2" -> ((s, dir) => {
      val series = hourlySeries(s, dir).withColumn("idx",
        row_number().over(Window.partitionBy(col("k")).orderBy(col("bucket_ts"))) - 1)
      graft.series.Stationarity.adf(series, "k", "idx", "y",
        maxlag = 2, autolag = false)
        .select(col("k"), round(col("adf_stat"), 6).as("adf_stat"),
          col("used_lag"), col("nobs"),
          round(col("crit_5pct"), 6).as("crit_5pct"), col("stationary"))
    }),

    // Flagship: full suite (uniqueness + RI + completeness + rolling-z +
    // turn-rate drift with STL) → verdict rows (rows-only oracle: STL;
    // q52 is the exact-checked classical twin)
    "q50_validation_suite" -> ((s, dir) => {
      val check = Check("transcripts", Seq(
        NotNull("text"),
        UniqueKey(Seq("conv_id", "turn_idx")),
        ReferentialIntegrity("role", "role_dim", "role"),
        ReferentialIntegrity("tool", "tool_dim", "tool"),
        RollingZDrift("value", window = 24, threshold = 3.0),
        TurnRateDrift(bucket = "1 hour", period = 24, method = "stl",
          seasonal = 7, residThreshold = 3.0)))
      val ctx = Validator.Context(Map(
        "role_dim" -> Tables.roleDim(s), "tool_dim" -> Tables.toolDim(s)))
      Validator.validate(Tables.transcripts(s, dir), check, ctx).verdicts
    }),

    // Flagship twin with the CLASSICAL decomposition drift method: every
    // verdict row — per-conv completeness/uniqueness/RI/rolling-z, the
    // global completeness verdict, and the per-conversation turn-rate
    // drift verdict (2xMA decomposition → residual IQR anomalies → PSI →
    // exact KS) — is reproduced by a full SQL oracle, so the whole
    // validator pipeline is hash-checked end to end.
    "q52_validation_suite_classical" -> ((s, dir) => {
      val check = Check("transcripts", Seq(
        NotNull("text"),
        UniqueKey(Seq("conv_id", "turn_idx")),
        ReferentialIntegrity("role", "role_dim", "role"),
        ReferentialIntegrity("tool", "tool_dim", "tool"),
        RollingZDrift("value", window = 24, threshold = 3.0),
        TurnRateDrift(bucket = "1 hour", period = 24, method = "classical",
          seasonal = 7, residThreshold = 3.0)))
      val ctx = Validator.Context(Map(
        "role_dim" -> Tables.roleDim(s), "tool_dim" -> Tables.toolDim(s)))
      Validator.validate(Tables.transcripts(s, dir), check, ctx).verdicts
        .select(col("partition_key"), col("constraint"), col("pass"),
          col("rows"), col("violations"),
          round(col("violation_rate"), 6).as("violation_rate"))
    }),

    // Resumability math, oracle-checked: StatsState computed on 4 disjoint
    // conv-hash slices then MERGED (commutative counter/min/max unions —
    // the checkpoint-restart path, checkpoint/Checkpoint.scala) equals the
    // direct global aggregation DuckDB computes in one pass. Counters and
    // integer-valued double sums are exact under any merge order; the
    // sketch blobs (t-digest/HLL) are spec-gated instead
    // (StatsStateSpec/SketchesSpec) since approx != exact by design.
    "q45_stats_state_merge" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
      val check = Check("t", Seq(
        MeanBetween("turn_idx", 0, 1e9),
        NotNull("text"), NotNull("tool"),
        DistinctCountBetween("conv_id", 1, Long.MaxValue)))
      val slices = (0 until 4).map(p => graft.compile.StatsState.compute(
        t.where(pmod(xxhash64(col("conv_id")), lit(4)) === p), check))
      graft.compile.StatsState.merge(slices.reduce(_ unionByName _))
        .select(col("column").as("col_name"), col("n"), col("nulls"),
          col("sum"), col("sumsq"), col("mn"), col("mx"))
    }),

    // Skew machinery, oracle-checked: two-stage salted counts (partial on
    // (conv_id, salt), final on conv_id — skew/Salting.scala) equal the
    // plain per-conversation counts.
    "q46_salted_counts" -> ((s, dir) =>
      graft.skew.Salting.saltedCounts(Tables.transcripts(s, dir),
        "conv_id", "turn_idx", salts = 8)),

    // Resume-merge of VIOLATIONS: the suite run independently on 4
    // disjoint conv-hash slices (conversations never straddle slices, so
    // per-conversation constraints are exact per slice) unions to exactly
    // the single-run violation set — per (constraint, conv) counts checked
    // against the global SQL recomputation.
    "q47_sliced_violation_union" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
      val check = Check("t", Seq(
        NotNull("text"),
        UniqueKey(Seq("conv_id", "turn_idx")),
        ReferentialIntegrity("role", "role_dim", "role")))
      val ctx = Validator.Context(Map("role_dim" -> Tables.roleDim(s)))
      // the 4 slice validations are independent (disjoint conv-hash
      // slices) and each runs an eager fused-stats job: build them from
      // a small driver thread pool so those jobs overlap instead of
      // running serially (guide §2.6) — the unioned violation plan, and
      // therefore the result, is identical
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val slices = Await.result(Future.sequence((0 until 4).map(p =>
        Future(Validator.validate(
          t.where(pmod(xxhash64(col("conv_id")), lit(4)) === p), check, ctx)
          .violations))), Duration.Inf)
      slices.reduce(_ unionByName _)
        .groupBy(col("constraint"), col("conv_id"))
        .agg(count(lit(1)).as("n_violations"))
    }),

    // A1 heavy-key census (skew/Salting.megaKeys): conversations whose
    // turn count exceeds factor x mean — decides when drift kernels take
    // the salted/chunked path.
    "q48_mega_keys" -> ((s, dir) =>
      graft.skew.Salting.megaKeys(Tables.transcripts(s, dir), "conv_id",
        factor = 1.2)
        .select(col("conv_id"), col("n"), round(col("mean_n"), 6).as("mean_n"))),

    // §2.10 EllipticEnvelope role (reference
    // src/geological_anomaly_detector.py:195-199): squared Mahalanobis
    // distance as a pure-Column quadratic form from a single fused moment
    // pass; the 2-feature fit + exact-percentile threshold has a complete
    // SQL twin (closed-form 2x2 inverse incl. the ridge term).
    "q53_mahalanobis_outliers" -> ((s, dir) => {
      val f = Tables.events(s, dir).where(col("value").isNotNull)
        .withColumn("hod", hour(col("ts")).cast("double"))
      graft.ml.Mahalanobis.fitScore(f, Seq("value", "hod"),
        contamination = 0.05, approx = false)
        .where(col("maha_anomaly"))
        .select(col("event_id"), round(col("maha_dist_sq"), 2).as("dist_sq"),
          col("maha_anomaly_label").as("label"))
    }),

    // §2.10 DBSCAN role (reference src/anomaly_detection.py:176-217, noise
    // = anomaly): per-conversation kernel inside flatMapSortedGroups; the
    // noise predicate (non-core with no core neighbor) is exactly
    // SQL-expressible, so the whole labeling is hash-checked. eps 3.005 is
    // deliberately OFF the data's 0.01 value grid so sqrt(d²) vs abs(d)
    // 1-ulp differences cannot flip a boundary comparison.
    "q54_dbscan_noise" -> ((s, dir) =>
      graft.ml.Neighborhood.dbscan(Tables.transcripts(s, dir),
        "conv_id", "turn_idx", Seq("value"), eps = 3.005, minSamples = 4)
        .select(col("conv_id"), col("turn_idx"), col("is_noise"))),

    // §2.10 IsolationForest role (reference src/anomaly_detection.py:38-83;
    // contamination/n_estimators/seed as the reference sets them): fit on
    // a deterministic hash-reservoir sample, score distributed. Random
    // trees have no SQL twin → rows-only check; MlSpec carries the
    // behavioural gates (planted outliers, determinism, score range).
    "q55_iforest_outliers" -> ((s, dir) => {
      val f = Tables.events(s, dir).where(col("value").isNotNull)
        .withColumn("hod", hour(col("ts")).cast("double"))
      // event_id salts the reservoir hash: duplicate (value, hod) tuples
      // then sample per-ROW uniformly instead of all-or-nothing
      graft.ml.IsolationForest.fitScore(f, Seq("value", "hod"),
        nTrees = 100, sampleSize = 256, contamination = 0.1, seed = 42L,
        sampleSaltCols = Seq("event_id"))
        .where(col("iforest_anomaly"))
        .select(col("event_id"), round(col("iforest_score"), 6).as("score"),
          col("iforest_anomaly_label").as("label"))
    }),

    // §2.10 LocalOutlierFactor role (reference src/anomaly_detection.py:
    // 85-127, n_neighbors=20): per-conversation exact kernel. Over a
    // single feature the whole Breunig chain (k-distance with ties,
    // reachability, lrd, LOF) is SQL-expressible via a within-conv
    // self-join, so the query is hash-checked; the twin mirrors the
    // kernel's sqrt(d·d) distance bit-for-bit so tie comparisons agree,
    // and round(…,4) absorbs sum-order drift in the lrd/LOF averages.
    // MlSpec + the exact-Breunig golden carry the multi-feature gates.
    "q56_lof_scores" -> ((s, dir) =>
      graft.ml.Neighborhood.lof(Tables.transcripts(s, dir),
        "conv_id", "turn_idx", Seq("value"), k = 20)
        .where(col("lof") > 1.5)
        .select(col("conv_id"), col("turn_idx"), round(col("lof"), 4).as("lof"))),

    // §2.10 OneClassSVM role (reference src/anomaly_detection.py:129-174,
    // nu=0.1 rbf): RFF-approximated RBF one-class SVM, fit on the
    // deterministic sample, scored as a pure-Column cosine expansion.
    // SGD weights have no SQL twin → rows-only; MlSpec gates the RFF
    // kernel approximation and the ν-property.
    "q57_ocsvm_outliers" -> ((s, dir) => {
      val f = Tables.events(s, dir).where(col("value").isNotNull)
        .withColumn("hod", hour(col("ts")).cast("double"))
      graft.ml.OneClassSvm.fitScore(f, Seq("value", "hod"), nu = 0.1)
        .where(col("ocsvm_anomaly"))
        .select(col("event_id"),
          round(col("ocsvm_decision"), 6).as("decision"),
          col("ocsvm_anomaly_label").as("label"))
    }),

    // Scoring-path twin for q55: the SAME array-encoded-tree traversal UDF
    // (IsolationForest.scoreWith — the path fitScore scores through)
    // evaluates a PINNED 2-tree forest, so the distributed scoring leg is
    // hash-checked against a DuckDB CASE-chain twin; the FIT stays
    // golden-gated in MlGoldenSpec (random trees have no SQL twin).
    // round(,4) absorbs the pow() libm ulp (q56 convention).
    "q58_iforest_pinned_scoring" -> ((s, dir) => {
      val f = Tables.events(s, dir).where(col("value").isNotNull)
        .withColumn("hod", hour(col("ts")).cast("double"))
      graft.ml.IsolationForest.scoreWith(f, Seq("value", "hod"),
        graft.ml.PinnedScoring.forest, "s")
        .select(col("event_id"), round(col("s"), 4).as("score"))
    }),

    // Scoring-path twin for q57: OneClassSvm.Model.decision (the exact
    // production cosine-expansion Column, whole-stage codegen, zero UDF)
    // over a PINNED RFF model — hash-checked against a term-by-term DuckDB
    // twin with matching evaluation order; SGD fit stays golden-gated.
    "q59_ocsvm_pinned_scoring" -> ((s, dir) => {
      val f = Tables.events(s, dir).where(col("value").isNotNull)
        .withColumn("hod", hour(col("ts")).cast("double"))
      f.withColumn("d", graft.ml.PinnedScoring.ocsvm.decision)
        .select(col("event_id"),
          (round(col("d"), 4) + lit(0.0)).as("decision")) // −0.0 → 0.0
    }),

    // IVF ANN (the FAISS-style coarse-quantizer scale path, sibling of
    // q39's LSH path): corpus → single home cell, queries probe 2 cells,
    // candidate equi-join on the scalar cell id (no ×tables explode, no
    // pair dedup), exact cosine re-rank. Centroids PINNED (md5-derived,
    // Scala-normalized) so assignment, probe, join, and re-rank are all
    // hash-checked; the k-means FIT is spec-gated in IvfSpec (recall vs
    // brute force), like the detector fits.
    "q60_ann_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Ivf.topK(q, e, "q_id", "vec_id", "q_vec", "embedding", k = 5,
        Ivf.pinnedCentroids(ivfCells, annDims), nprobe = 2)
        .select(col("q_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
    }),

    // §2.10 PCA (reference src/anomaly_detection.py:414-418 uses sklearn
    // PCA(2) for the anomaly scatter figures): fused moment pass → 2×2
    // closed-form eigen at the driver (θ = atan2(2c01, c00−c11)/2 — the
    // exact formula the SQL twin mirrors) → projection as a pure codegen
    // Column. round(,2) absorbs the engines' sum-order drift in the
    // moments (the q53 convention). The d≥3 Jacobi path is numpy-golden-
    // gated in PcaSpec.
    "q61_pca_projection" -> ((s, dir) => {
      val f = Tables.events(s, dir).where(col("value").isNotNull)
        .withColumn("hod", hour(col("ts")).cast("double"))
      val m = graft.ml.Pca.fit(f, Seq("value", "hod"), nComponents = 2)
      val Seq(pc1, pc2) = m.project()
      // + 0.0 normalizes −0.0 → 0.0 (DuckDB's round keeps the sign of a
      // tiny negative; Spark's BigDecimal round does not)
      f.select(col("event_id"),
        (round(pc1, 2) + lit(0.0)).as("pc1"),
        (round(pc2, 2) + lit(0.0)).as("pc2"))
    }),

    // Dedup CLUSTERING: near-dup pairs are only half the operator — groups
    // are transitive closures over the pair graph. q35's exact-Jaccard pair
    // generation (already hash-checked) feeds alternating large-star/
    // small-star connected components; every doc gets (component_id = min
    // doc id of its group, component_size). The DuckDB twin recomputes the
    // same pairs and closes them with a recursive CTE.
    "q62_dup_components" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).where(col("doc_id") < 200)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleK = 1, threshold = 0.9)
      val comp = graft.dedup.ConnectedComponents.assign(
        docs.select("doc_id"), "doc_id", pairs, "a_id", "b_id")
      val sizes = comp.groupBy("component").agg(count(lit(1)).as("component_size"))
      comp.join(sizes, "component")
        .select(col("doc_id"), col("component").as("component_id"),
          col("component_size"))
    }),

    // Mega-conversation census via the mergeable Misra-Gries sketch: pass 1
    // finds candidate heavy conv_ids in O(k) state (guaranteed complete for
    // counts > n/256 since the sketch error is < n/257), pass 2 exact-counts
    // only those candidates — identical to the full groupBy/HAVING at a
    // fraction of the shuffle. The oracle IS that full groupBy/HAVING.
    "q63_heavy_hitters" -> ((s, dir) => {
      graft.agg.FreqItems.heavyHitters(
        Tables.transcripts(s, dir), "conv_id", k = 512, den = 256.0)
    }),

    // The WHOLE dedup pipeline in one call at q40's operating point:
    // minhash signatures -> LSH banding -> exact-Jaccard verify (q40
    // hash-checks that this finds exactly the >= 0.7 pairs) -> connected
    // components -> canonical (doc_id, group_id, group_size). The oracle
    // is the exact pair set transitively closed by a recursive CTE, over
    // ALL documents (sub-3-token docs have no shingles and stay
    // singletons on both sides).
    "q64_dup_groups" -> ((s, dir) => {
      graft.dedup.ConnectedComponents.dupGroups(
        Tables.documents(s, dir), "doc_id", "text",
        shingleK = 3, numHashes = 64, bands = 32,
        estJaccardMin = 0.4, threshold = 0.7)
    }),

    // The skew guard as a CONSTRAINT: MaxKeyShare compiles to the MG
    // sketch + exact candidate recount inside the Validator; per-key FAIL
    // verdicts + one global row. The oracle is the groupBy/HAVING census
    // the sketch pass is guaranteed to equal. 1/512 and the cnt/n division
    // are exact binary, so the rates hash-match.
    "q65_key_share_verdicts" -> ((s, dir) => {
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("share", Seq(MaxKeyShare("conv_id", maxFrac = 1.0 / 512, k = 2048))))
      r.verdicts.select(col("partition_key"), col("constraint"), col("pass"),
        col("rows"), col("violations"),
        round(col("violation_rate"), 9).as("violation_rate"))
    }),

    // Gap-based sessionization: a "conversation" spans days of sporadic
    // activity; per-session bounds/counts at a 30-min inactivity gap. ONE
    // keyed window + one keyed agg — the turn_idx shuffle class.
    "q66_sessions" -> ((s, dir) => {
      graft.series.Sessions.sessionize(
        Tables.transcripts(s, dir), "conv_id", "ts", "turn_idx", 1800L)
    }),

    // As-of (point-in-time) join: every turn picks up the policy version
    // live at its ts — snapshots are every-3rd-day (role, day) entries, so
    // most turns resolve BACKWARD to an earlier day (non-trivial asof).
    // Spark lacks ASOF JOIN: built from interval-bucketed broadcast
    // equi-join (fact side never shuffles). Oracle uses DuckDB's native
    // ASOF LEFT JOIN — an independent implementation of the semantics.
    "q67_asof_versions" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
        .select("conv_id", "turn_idx", "role", "ts")
      graft.join.AsOf.joinAsOf(t, every3rdDaySnapshots(t), Seq("role"),
        "ts", "valid_from", "day", Seq("version"))
        .select("conv_id", "turn_idx", "role", "version")
    }),

    // The as-of SHUFFLE tier (non-broadcastable dims): same semantics and
    // the same snapshot dim as q67 through the union-sentinel
    // carry-forward physical path — both tiers are driver-hash-checked
    // against DuckDB's native ASOF JOIN.
    "q69_asof_shuffled" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
        .select("conv_id", "turn_idx", "role", "ts")
      graft.join.AsOf.joinAsOfShuffle(t, every3rdDaySnapshots(t), Seq("role"),
        "ts", "valid_from", Seq("version"))
        .select("conv_id", "turn_idx", "role", "version")
    }),

    // Deterministic stratified sampling: per-role keep rates via a salted
    // md5 threshold — a pure codegen'd filter (no shuffle, no RNG state),
    // byte-identical across reruns/resumes AND across engines (the oracle
    // recomputes the exact same sample in DuckDB).
    "q68_stratified_sample" -> ((s, dir) => {
      graft.sample.Sampling.stratified(
        Tables.transcripts(s, dir).select("conv_id", "turn_idx", "role"),
        "role", "conv_id",
        Map("user" -> 0.5, "assistant" -> 0.25, "tool" -> 0.1,
          "invalid_role" -> 0.0),
        defaultRate = 1.0, salt = "graft")
    }),

    // Sessionization as a CONSTRAINT (declarative reach for suite
    // configs, VERDICT r4 item 4): MaxSessionGap emits one violation per
    // session boundary past each conversation's first turn — exactly the
    // boundaries Sessions.assign(gap=1800) opens. One pruned keyed
    // window; text never shuffles.
    "q70_session_gap_violations" -> ((s, dir) => {
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("gap", Seq(MaxSessionGap(1800L))))
      r.violations.select(col("conv_id"), col("turn_idx"),
        round(col("observed").cast("double"), 6).as("gap_seconds"))
    }),

    // Point-in-time referential integrity as a CONSTRAINT: every turn's
    // role must have a snapshot at-or-before its ts in the every-3rd-day
    // snapshot dim (q67's dim) — unresolved turns are violations. Rides
    // the broadcast as-of tier; the oracle re-derives the violation set
    // with DuckDB's NATIVE ASOF LEFT JOIN.
    "q71_asof_integrity_violations" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
      // each role's FIRST snapshot is dropped so turns before the second
      // one genuinely fail to resolve — a nonzero violation set (with all
      // snapshots present every turn resolves and the check is vacuous)
      val ctx = Validator.Context(Map(
        "role_snap" -> every3rdDaySnapshots(t).where(col("version") >= 2)))
      val r = Validator.validate(t, Check("asof", Seq(
        AsOfIntegrity("role", "role_snap", "role", "valid_from"))), ctx)
      r.violations.select(col("conv_id"), col("turn_idx"),
        col("observed").as("role"))
    }),

    // Schema conformance — the "schema" half of the engine, differential
    // against DuckDB's independent DESCRIBE of the same parquet. The
    // declared schema deliberately mis-types user_id (int vs bigint),
    // declares an absent column (amount), and disallows extras, so all
    // three violation classes appear. The Spark side is pure driver
    // metadata (zero jobs at any table size).
    "q72_schema_check" -> ((s, dir) => {
      // ts declares timestamp_ntz: the testdata parquet carries
      // isAdjustedToUTC=false, which Spark 4 infers as TIMESTAMP_NTZ and
      // DuckDB as its (equally wall-clock) TIMESTAMP — the twin maps the
      // two spellings of the same semantics together
      val declared = Seq(
        "event_id" -> "bigint", "ts" -> "timestamp_ntz", "user_id" -> "int",
        "event_type" -> "string", "amount" -> "double")
      val r = Validator.validate(Tables.events(s, dir),
        Check("events_schema",
          Seq(ExpectedSchema(declared, allowExtra = false)),
          keyCol = "event_id", orderCol = "event_id", tsCol = "ts"))
      // safe to release immediately: the schema violation rows are local
      // (createDataFrame on the driver), so recompute after unpersist is free
      r.unpersistAll()
      r.violations.select(col("column").as("col_name"),
        col("observed"), col("bound"))
    }),

    // One-permutation MinHash (densified OPH, Shrivastava-Li 2014): the
    // 10^12-doc signature path — ONE hash per shingle instead of one per
    // position. The engine-portable md5-prefix hash lets DuckDB recompute
    // the EXACT signatures (bucketing, mins, and the rotation
    // densification) independently.
    "q73_minhash_oph_signatures" -> ((s, dir) => {
      graft.dedup.Dedup.minhashSignaturesOph(
          Tables.documents(s, dir), "doc_id", "text",
          shingleK = 3, buckets = 64)
        .select(col("doc_id"), col("signature"))
    }),

    // Token-budget sequence packing (next-fit at 256 whitespace tokens):
    // the training-sequence assembly step after dedup/sampling — documents
    // greedily packed into fixed context windows per shard (doc_id mod 8,
    // the per-shard parallel unit real 100-TB packing uses). One keyed
    // Exchange + streaming O(1)-state pass; the oracle replays the exact
    // greedy recurrence as a recursive CTE.
    "q74_pack_assign" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("shard", (col("doc_id") % 8).cast("int"))
        .withColumn("tok", TextAnalysis.tokenCount(col("text")))
        .select("shard", "doc_id", "tok")
      graft.pack.Packing.nextFitPack(d, "shard", "doc_id", "tok", 256L)
        .select("shard", "doc_id", "pack_idx")
    }),

    // Per-pack utilization census over the same assignment — the padding-
    // waste report a packing run is judged by (oversize packs read > 1).
    "q75_pack_fill" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("shard", (col("doc_id") % 8).cast("int"))
        .withColumn("tok", TextAnalysis.tokenCount(col("text")))
        .select("shard", "doc_id", "tok")
      graft.pack.Packing.packSummary(d, "shard", "doc_id", "tok", 256L)
        .select("shard", "pack_idx", "n_rows", "pack_tokens", "fill_ratio")
    }),

    // Sequence grammar as a CONSTRAINT: each (prev→curr) role transition
    // must be in the declared alternation set and conversations must open
    // with user/system. Rides the FUSED sequence pass — one exchange
    // shared by every adjacency constraint in the suite (plan-gated).
    "q76_transition_violations" -> ((s, dir) => {
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("grammar", Seq(AllowedTransitions("role",
          Seq("user" -> "assistant", "assistant" -> "user",
            "assistant" -> "tool", "tool" -> "assistant"),
          firstIn = Some(Seq("user", "system"))))))
      r.violations.select(col("conv_id"), col("turn_idx"),
        col("observed").as("transition"))
    }),

    // Order invariant as a CONSTRAINT: the per-turn measure must be
    // non-decreasing within a conversation — violations observe the value
    // that ran backwards. Same fused sequence pass.
    "q77_monotonic_violations" -> ((s, dir) => {
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("mono", Seq(Monotonic("value"))))
      r.violations.select(col("conv_id"), col("turn_idx"),
        col("observed").cast("double").as("value"))
    }),

    // Stutter detector as a CONSTRAINT: consecutive turns must not carry
    // identical text. Compared via a MAP-SIDE md5 digest — the text
    // payload never rides the exchange; the oracle recomputes the same
    // digests independently.
    "q78_repeat_violations" -> ((s, dir) => {
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("stutter", Seq(NoConsecutiveRepeats("text"))))
      r.violations.select(col("conv_id"), col("turn_idx"),
        col("observed").as("text_md5"))
    }),

    // Functional dependency as a CONSTRAINT: a conversation must sit on
    // one calendar day (conv_id → day). One hash aggregation; violations
    // observe the distinct-day census per offending conversation.
    "q79_fd_violations" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
        .withColumn("day", to_date(col("ts")))
      val r = Validator.validate(t,
        Check("fd", Seq(FunctionalDependency(Seq("conv_id"), "day"))))
      r.violations.select(col("conv_id"),
        col("observed").cast("int").as("n_days"))
    }),

    // Referential integrity, KEY-CENSUS tier: the 10^12-row-fact × huge-dim
    // shape — the fact's DISTINCT keys anti-join the dim (key values only
    // ride the shuffle) and the violating keys broadcast back onto the
    // fact, which never shuffles. Identical violation set to q08's
    // broadcast anti-join; the oracle is the same plain anti-join SQL.
    "q80_ref_census_violations" -> ((s, dir) => {
      val ctx = Validator.Context(Map("roles" -> Tables.roleDim(s)))
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("ref_census", Seq(ReferentialIntegrity("role", "roles", "role",
          keyCensus = true))), ctx)
      r.violations.select(col("conv_id"), col("turn_idx"),
        col("observed").as("role"))
    }),

    // Semi-structured payload extraction: agent tool payloads are JSON —
    // schema-on-read via native from_json (codegen'd, no UDF), then a
    // grouped rollup of the extracted field. The oracle extracts the same
    // field with DuckDB's independent JSON reader.
    "q81_json_field_stats" -> ((s, dir) => {
      Tables.transcripts(s, dir)
        .where(col("text").isNotNull)
        .withColumn("k",
          from_json(col("text"), "k INT",
            Map.empty[String, String]).getField("k"))
        .groupBy("role")
        .agg(count(col("k")).as("n_k"),
          sum(col("k")).as("sum_k"),
          round(avg(col("k")), 6).as("avg_k"))
    }),

    // Index density as a CONSTRAINT: turn_idx within each conversation
    // must be exactly {0..n-1} — the lost-turn detector uniqueness and
    // monotonicity both miss (a partial ingest commit leaves indices that
    // are still unique and still increasing). ONE hash aggregation over
    // (conv_id, turn_idx); transcripts are dense by construction, so the
    // fixture punches deterministic holes (an interior turn for conv
    // digits % 7 == 0, the OPENING turn for digits % 11 == 3 — exercising
    // both the max- and min-side failure) and the oracle replays the same
    // min/max/distinct census.
    "q82_contiguous_violations" -> ((s, dir) => {
      val d = substring(col("conv_id"), 6, 18).cast("int")
      val holed = Tables.transcripts(s, dir).where(
        !(col("turn_idx") === 2 && pmod(d, lit(7)) === 0) &&
          !(col("turn_idx") === 0 && pmod(d, lit(11)) === 3))
      val r = Validator.validate(holed,
        Check("dense", Seq(ContiguousIndex(0))))
      r.violations.select(col("conv_id"), col("observed"))
    }),

    // Keyed snapshot diff — the Iceberg-snapshot regression check
    // ("what changed since the version we validated?"). Both sides
    // project MAP-SIDE to (key, md5 digest of compared columns), so the
    // full-outer equi-join shuffles ~48 bytes/row no matter how wide the
    // text payload is; classification is a null/equality check on the two
    // digests. The fixture derives both versions deterministically from
    // the same table (removed / added / changed slices keyed on the conv
    // digits); the oracle re-derives the change set with DuckDB's own
    // full-outer join comparing the raw columns — digest-free, so it
    // independently proves the digests classify correctly.
    "q83_snapshot_diff" -> ((s, dir) => {
      val base = Tables.transcripts(s, dir)
        .where(col("conv_id").isNotNull)
        .withColumn("d", substring(col("conv_id"), 6, 18).cast("int"))
      val oldDf = base.where(!(pmod(col("d"), lit(19)) === 5 &&
        col("turn_idx") === 0))
      val newDf = base.where(!(pmod(col("d"), lit(13)) === 0 &&
          col("turn_idx") === 1))
        .withColumn("role",
          when(pmod(col("d"), lit(17)) === 2 && col("turn_idx") === 0,
            lit("assistant")).otherwise(col("role")))
      graft.diff.SnapshotDiff.diff(oldDf, newDf,
        Seq("conv_id", "turn_idx"), Seq("role", "text", "tool"))
    }),

    // Distribution-level snapshot regression — the companion to q83's
    // row-level diff: per-role PSI of the turn measure between the
    // validated snapshot (baseline) and the new one (current), where the
    // new version deterministically shifts a third of the conversations'
    // values. Reuses Drift.psi unchanged (equal-frequency bins from the
    // baseline side); the oracle recomputes the full quantile-edge →
    // bin-census → PSI chain per role.
    "q84_snapshot_value_drift" -> ((s, dir) => {
      val base = Tables.transcripts(s, dir)
        .where(col("conv_id").isNotNull && col("value").isNotNull)
        .withColumn("d", substring(col("conv_id"), 6, 18).cast("int"))
        .select("role", "value", "d")
      val oldV = base.withColumn("side", lit("baseline"))
      val newV = base.withColumn("value",
          when(pmod(col("d"), lit(3)) === 0, col("value") * 1.25 + 0.5)
            .otherwise(col("value")))
        .withColumn("side", lit("current"))
      Drift.psi(oldV.unionByName(newV), "value", "side", Seq("role"))
        .select(col("role"), round(col("psi"), 6).as("psi"))
    }),

    // Distribution drift as a CONSTRAINT — q84's check through the
    // declarative path: the blessed snapshot's value distribution is
    // registered as a dimension, the new version validates against it
    // with DistributionDrift, and the emitted global violation row
    // observes the measured PSI. Threshold set below the planted shift
    // so the violation row (and its PSI) is the checked output.
    "q85_distribution_drift_verdicts" -> ((s, dir) => {
      val base = Tables.transcripts(s, dir)
        .where(col("conv_id").isNotNull && col("value").isNotNull)
        .withColumn("d", substring(col("conv_id"), 6, 18).cast("int"))
      val blessed = base.select(col("value").as("ref_value"))
      val current = base.withColumn("value",
        when(pmod(col("d"), lit(3)) === 0, col("value") * 1.25 + 0.5)
          .otherwise(col("value")))
      val ctx = Validator.Context(Map("blessed" -> blessed))
      val r = Validator.validate(current,
        Check("drift", Seq(DistributionDrift("value", "blessed", "ref_value",
          maxPsi = 0.001))), ctx)
      r.violations.select(col("column"),
        round(col("observed").cast("double"), 6).as("psi"))
    }),

    // Duplicate-rate bound as a CONSTRAINT — exact/normalized dedup's
    // declarative face: (n − distinct fingerprints)/n over non-null text,
    // verdict + measured rate from the suite path. maxRate = 0 so any
    // repeated normalized text fails and the verdict's rate is the
    // hash-checked output (the oracle recomputes it over the raw strings,
    // digest-free — independently proving the md5-identity reduction).
    "q86_max_dup_rate_verdicts" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
      val r = Validator.validate(t,
        Check("dups", Seq(MaxDuplicateRate("text", maxRate = 0.0,
          normalized = true))), Validator.Context())
      r.verdicts.where(col("constraint") === "max_dup_rate(text)")
        .select(col("constraint"), col("pass"),
          round(col("violation_rate"), 6).as("dup_rate"))
    }),

    // Arbitrary-predicate compliance — the config-expressible business
    // rule. Fails CLOSED (false OR null predicate both violate); the
    // violation rows carry the predicate's raw truth value so the oracle
    // independently re-evaluates the SQL predicate per row, null branch
    // included.
    "q87_compliance_violations" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
      val r = Validator.validate(t,
        Check("comp", Seq(Compliance("value_floor",
          "value BETWEEN -2.0 AND 2.0 OR role = 'system'",
          maxFailRate = 0.001))), Validator.Context())
      r.violations
        .where(col("constraint") === "compliance(value_floor)")
        .select(col("conv_id"), col("turn_idx"), col("observed"))
        .orderBy(col("conv_id"), col("turn_idx"))
    }),

    // Pearson correlation bound, fused into the one-pass global agg.
    // Bounds set above any real (value, turn_idx) correlation so the
    // constraint FAILS and the emitted global violation row observes the
    // measured r — hash-checked against DuckDB's native corr.
    "q88_correlation_bound" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
      val r = Validator.validate(t,
        Check("corr", Seq(CorrelationBetween("value", "turn_idx",
          lo = 0.999, hi = 1.0))), Validator.Context())
      r.violations.select(col("column"),
        round(col("observed").cast("double"), 6).as("corr"))
    }),

    // Shannon entropy census over the role distribution. lo set far above
    // ln(#roles) so the constraint FAILS and the violation row observes
    // the measured H (nats) — the oracle recomputes −Σ p·ln p from the
    // role frequencies.
    "q89_entropy_census" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
      val r = Validator.validate(t,
        Check("ent", Seq(EntropyBetween("role", lo = 99.0, hi = 100.0))),
        Validator.Context())
      r.violations.select(col("column"),
        round(col("observed").cast("double"), 6).as("entropy"))
    }),

    // Mutual information between the role and the turn phase (turn_idx
    // mod 4) — the dependency census. lo forced above any real MI so the
    // constraint FAILS and the violation row observes the measured MI;
    // the oracle recomputes Σ p(x,y)·ln(p(x,y)/(p(x)·p(y))) from the pair
    // frequencies.
    "q90_mutual_information" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
        .withColumn("phase", pmod(col("turn_idx"), lit(4)))
      val r = Validator.validate(t,
        Check("mi", Seq(MutualInformationBetween("role", "phase",
          lo = 99.0, hi = 100.0))), Validator.Context())
      r.violations.select(col("column"),
        round(col("observed").cast("double"), 6).as("mi"))
    }),

    // Constraint suggestion census — the discovery step that writes a
    // starter suite (profile a blessed snapshot → suggested constraints →
    // SuiteConfig.render YAML). The oracle re-derives every rule
    // (not_null / in_set / matches_regex / value_bounds / unique_key /
    // no_pii) from the same per-column stats; the engine's census is one
    // fused agg with string distincts digest-reduced map-side.
    "q91_suggested_constraints" -> ((s, dir) => {
      Suggestions.suggestDf(s, Tables.transcripts(s, dir))
        .orderBy("column", "suggestion")
    }),

    // Cross-run metric anomaly detection (checkpoint.MetricHistory): each
    // UTC day of the table stands in for one validation run with two
    // tracked metrics (row count, mean value); rate-of-change flags any
    // run whose metric moved >10% vs the previous run. The oracle replays
    // the same lag-window rule.
    "q92_metric_rate_anomalies" -> ((s, dir) => {
      val daily = Tables.transcripts(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("run_ts"))
        .agg(count(lit(1)).cast("double").as("rows"),
          avg(col("value")).as("mean_value"))
      val hist = daily.select(
        date_format(col("run_ts"), "yyyy-MM-dd").as("run_id"),
        col("run_ts"), lit("all").as("constraint"),
        explode(map(lit("rows"), col("rows"),
          lit("mean_value"), col("mean_value"))).as(Seq("metric", "value")))
      graft.checkpoint.MetricHistory.rateOfChange(hist, maxRel = 0.10)
        .select(col("run_id"), col("metric"),
          round(col("value"), 6).as("value"),
          round(col("prev"), 6).as("prev"),
          round(col("rel_change"), 6).as("rel_change"))
        .orderBy("run_id", "metric")
    }),

    // Data-type conformance (ParsableAs): a derived column that holds the
    // JSON payload's numeric field on conversational turns but the tool
    // CODE on tool turns — the tool codes can't cast to int and violate.
    // Exercises the fused try_cast row check end-to-end; the oracle
    // replays the same TRY_CAST rule.
    "q93_parsable_violations" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir).withColumn("maybe_num",
        when(col("role") === "tool", col("tool"))
          .otherwise(get_json_object(col("text"), "$.k")))
      val r = Validator.validate(t,
        Check("pars", Seq(ParsableAs("maybe_num", "int"))),
        Validator.Context())
      r.violations.select(col("conv_id"), col("turn_idx"), col("observed"))
        .orderBy("conv_id", "turn_idx")
    }),

    // Uniqueness + distinctness ratio census — lo forced above 1 so both
    // constraints FAIL and their violation rows observe the measured
    // ratios; the oracle recomputes each from its own key census.
    "q94_uniqueness_distinctness" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
      val r = Validator.validate(t, Check("ratio", Seq(
        UniquenessBetween(Seq("text"), lo = 99.0, hi = 100.0),
        DistinctnessBetween(Seq("role"), lo = 99.0, hi = 100.0))),
        Validator.Context())
      r.violations.select(col("constraint"),
        round(col("observed").cast("double"), 6).as("ratio"))
        .orderBy("constraint")
    }),

    // KS half of DistributionDrift: the same shifted-snapshot fixture as
    // q85, KS bound forced tiny so the constraint FAILS on the KS leg
    // (maxPsi left huge so the single violation row observes measured D);
    // the oracle recomputes the tie-correct two-sample KS independently.
    "q95_distribution_drift_ks" -> ((s, dir) => {
      val base = Tables.transcripts(s, dir)
        .where(col("conv_id").isNotNull && col("value").isNotNull)
        .withColumn("d", substring(col("conv_id"), 6, 18).cast("int"))
      val blessed = base.select(col("value").as("ref_value"))
      val current = base.withColumn("value",
        when(pmod(col("d"), lit(3)) === 0, col("value") * 1.25 + 0.5)
          .otherwise(col("value")))
      val ctx = Validator.Context(Map("blessed" -> blessed))
      val r = Validator.validate(current,
        Check("drift", Seq(DistributionDrift("value", "blessed", "ref_value",
          maxPsi = 1e9, maxKs = Some(1e-6)))), ctx)
      r.violations.select(col("column"),
        round(col("observed").cast("double"), 6).as("ks"))
    }),

    // MetricHistory's SECOND analytic (trailing z-score vs the previous k
    // runs) over the q92 day-bucket pseudo-history — the oracle replays
    // the same excluded-self ROWS-frame mean/stddev rule.
    "q96_metric_trailing_z" -> ((s, dir) => {
      val daily = Tables.transcripts(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("run_ts"))
        .agg(count(lit(1)).cast("double").as("rows"),
          avg(col("value")).as("mean_value"))
      val hist = daily.select(
        date_format(col("run_ts"), "yyyy-MM-dd").as("run_id"),
        col("run_ts"), lit("all").as("constraint"),
        explode(map(lit("rows"), col("rows"),
          lit("mean_value"), col("mean_value"))).as(Seq("metric", "value")))
      graft.checkpoint.MetricHistory.trailingZ(hist, window = 5,
          threshold = 2.0)
        .select(col("run_id"), col("metric"),
          round(col("value"), 6).as("value"),
          round(col("baseline_mean"), 6).as("baseline_mean"),
          round(col("z"), 6).as("z"))
        .orderBy("run_id", "metric")
    }),

    // NoPii constraint: a deterministically PII-laced text column (each
    // turn_idx residue class plants one kind; residue 4 plants a
    // Luhn-INVALID card number that must stay clean) through the
    // declarative path; the oracle re-derives the same column and replays
    // the IDENTICAL pattern strings (graft.text.Pii.patterns, interpolated
    // into the SQL) plus the Luhn fold as a DuckDB list comprehension.
    "q97_pii_violations" -> ((s, dir) => {
      val m = pmod(col("turn_idx"), lit(11))
      val t = Tables.transcripts(s, dir).withColumn("pii_txt",
        when(m === 0, concat(lit("contact "), substring(col("conv_id"), 6, 18),
          lit("@example.com today")))
          .when(m === 1, format_string("call 415-555-%04d now",
            pmod(col("turn_idx") * 7, lit(10000))))
          .when(m === 2, lit("ssn 078-05-1120 retained"))
          .when(m === 3, lit("card 4111111111111111 charged"))
          .when(m === 4, lit("order 4111111111111112 shipped"))
          .when(m === 5, concat(lit("host 10.0."),
            pmod(col("turn_idx"), lit(256)).cast("string"), lit(".7 up")))
          .otherwise(col("text")))
      val r = Validator.validate(t, Check("pii", Seq(NoPii("pii_txt"))),
        Validator.Context())
      r.violations.select(col("conv_id"), col("turn_idx"),
          col("observed").as("kinds"))
        .orderBy("conv_id", "turn_idx")
    }),

    // MaxStaleness: an asOf far past the fixture's newest turn forces the
    // freshness verdict to FAIL and observe the measured lag; the oracle
    // recomputes the identical epoch-micros arithmetic from its own
    // max(ts). The constraint itself is zero-extra-jobs (the max fuses
    // into the one-pass global aggregation).
    "q98_freshness_violation" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
      val r = Validator.validate(t, Check("fresh", Seq(
        MaxStaleness("ts", "2030-01-01T00:00:00", maxLagSeconds = 3600))),
        Validator.Context())
      r.violations.select(col("column"),
        round(col("observed").cast("double"), 6).as("lag_s"))
    }),

    // MaxNearDuplicateRate: the WHOLE minhash→LSH→verify chain as one
    // declarative bound over the documents table (q64's operating point,
    // where LSH recall is exact-equivalent); the oracle recomputes the
    // rate from ITS exact all-pairs Jaccard census — engine candidates ≡
    // exact pairs or the rates diverge and the hash check fails.
    "q99_near_dup_rate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val r = Validator.validate(docs, Check("nd", Seq(
        MaxNearDuplicateRate("text", maxRate = 0.0)),
        keyCol = "doc_id", orderCol = "doc_id"), Validator.Context())
      r.violations.select(col("column"),
        round(col("observed").cast("double"), 6).as("near_dup_rate"))
    }),

    // MinTextQuality: q34's score formula as a declarative row-level
    // bound over the documents table — violations observe the SCORE, not
    // the text; the oracle replays the identical feature CTEs + the same
    // deterministic floor-half-up rounding and filters at the same bar
    "q100_quality_violations" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val r = Validator.validate(docs, Check("q", Seq(
        MinTextQuality("text", minScore = 0.6)),
        keyCol = "doc_id", orderCol = "doc_id"), Validator.Context())
      // row-check violations carry the suite key as conv_id (stringified
      // doc_id here) — cast back to the oracle's BIGINT doc id
      r.violations.select(col("conv_id").cast("bigint").as("doc_id"),
        col("observed").cast("double").as("quality_score"))
        .orderBy("doc_id")
    }),

    // LanguageShare: q33's langId as a declarative mix bound — the en
    // share of the documents fixture (~0.91) sits below the 0.95 floor,
    // so the verdict fails and observes the measured share; the oracle
    // recomputes the share from ITS lang_pred chain and emits the row
    // under the SAME condition (conditional twin — parity at any SF)
    "q101_language_share" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val r = Validator.validate(docs, Check("l", Seq(
        LanguageShare("text", "en", lo = 0.95)),
        keyCol = "doc_id", orderCol = "doc_id"), Validator.Context())
      r.violations.select(col("column"),
        round(col("observed").cast("double"), 6).as("en_share"))
    }),

    // VectorShape: the embedding-column well-formedness battery as a
    // declarative row check over a deterministically corrupted copy of
    // the embeddings table — vec_id % 7 == 0 → truncated to 60 dims,
    // else % 11 == 3 → NaN first element, else % 13 == 5 → ×4 norm
    // explosion (a power of two is exact in float AND double, so the
    // oracle's arithmetic matches bit-for-bit whatever width it folds
    // in). Violation rows observe WHICH legs fired (dim=/element/norm=),
    // never the vector itself; the NaN guard keeps the norm leg from
    // double-firing on poisoned vectors.
    "q102_vector_shape_violations" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val laced = e.withColumn("embedding",
        when(pmod(col("vec_id"), lit(7)) === 0,
          slice(col("embedding"), 1, 60))
          .when(pmod(col("vec_id"), lit(11)) === 3,
            transform(col("embedding"),
              (x, i) => when(i === 0, lit(Float.NaN)).otherwise(x)))
          .when(pmod(col("vec_id"), lit(13)) === 5,
            transform(col("embedding"), x => x * lit(4.0f)))
          .otherwise(col("embedding")))
      val r = Validator.validate(laced, Check("v", Seq(
        VectorShape("embedding", dim = Some(64), normLo = Some(0.5),
          normHi = Some(1.5))),
        keyCol = "vec_id", orderCol = "vec_id"), Validator.Context())
      r.violations.select(col("conv_id").cast("bigint").as("vec_id"),
        col("observed"))
        .orderBy("vec_id")
    }),

    // TurnCountBetween: the conversation-length bound over the
    // transcripts view — at sf0.01 per-conversation counts span 49..86,
    // so [55, 80] flags both tails (conditional twin: the oracle derives
    // the same census, so parity holds at any SF); violations observe
    // the census count
    "q103_turn_count_violations" -> ((s, dir) => {
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("tc", Seq(TurnCountBetween(55L, 80L))))
      r.violations.select(col("conv_id"), col("observed"))
        .orderBy("conv_id")
    }),

    // Constraint suggestion over a table WITH an embedding column: the
    // vector census (dim range, poisoned count, norm range over clean
    // vectors) fuses into the same one-pass profile, and the constant-dim
    // observed-clean embedding column earns a vector_shape suggestion
    // with the padded norm window; the oracle re-derives every rule from
    // its own per-column census exactly like q91's
    "q104_suggested_vector_constraints" -> ((s, dir) => {
      Suggestions.suggestDf(s, Tables.embeddings(s, dir))
        .orderBy("column", "suggestion")
    }),

    // ValueShareBetween: the categorical-mix bound — the user-role share
    // of the transcripts view (~0.20 by generator design) sits below the
    // 0.5 floor, so the verdict fails and observes the measured share;
    // the oracle recomputes the share from its own census and emits under
    // the SAME condition (conditional twin — parity at any SF)
    "q105_value_share_violation" -> ((s, dir) => {
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("sh", Seq(ValueShareBetween("role", "user", lo = 0.5))))
      r.violations.select(col("column"),
        round(col("observed").cast("double"), 6).as("user_share"))
    }),

    // TimeBucketCoverage: the ingest-gap detector — every hour between
    // the table's first and last turn must hold >= 8 turns (the fixture's
    // hourly counts span 4..30, so the thin tail flags); the oracle walks
    // the same span-complete hourly axis with generate_series and emits
    // the same "bucket-ts n=count" strings
    "q106_time_coverage_violations" -> ((s, dir) => {
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("cov", Seq(TimeBucketCoverage("ts", "hour", minRows = 8L))))
      r.violations.select(col("observed")).orderBy("observed")
    }),

    // LengthBounds: the Deequ hasMinLength/hasMaxLength shape over the
    // documents table — lengths span 48..553 at sf0.01, so [60, 400]
    // flags both tails; violations observe the LENGTH, never the text
    "q107_length_violations" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val r = Validator.validate(docs, Check("len", Seq(
        LengthBounds("text", lo = Some(60L), hi = Some(400L))),
        keyCol = "doc_id", orderCol = "doc_id"), Validator.Context())
      r.violations.select(col("conv_id").cast("bigint").as("doc_id"),
        col("observed").cast("bigint").as("text_length"))
        .orderBy("doc_id")
    }),

    // Graded membership: InSet's rate-bound face — ~20% of the transcript
    // view's roles are the injected invalid_role, so a 0.15 ceiling FAILS
    // with the measured rate; the twin recomputes the same census
    // (unconditional single-row verdict — parity at any SF)
    "q108_graded_inset_verdict" -> ((s, dir) => {
      val r = Validator.validate(Tables.transcripts(s, dir),
        Check("g", Seq(InSet("role",
          Seq("user", "assistant", "system", "tool"), maxFailRate = 0.15))))
      r.verdicts.where(col("constraint") === "in_set(role)[global]")
        .select(col("pass"), col("violations"),
          round(col("violation_rate"), 6).as("rate"))
    })
  )

  /** Queries whose semantics SQL can't express — only the STL-decomposition
    * flagship remains (its loess kernel has no SQL twin); the classical
    * flagship twin q52 carries the exact check for the same pipeline.
    * Driver applies the weaker rows-only check here.
    */
  val oracleExempt: Set[String] = Set("q50_validation_suite",
    // random isolation trees / SGD-trained SVM weights have no SQL twin;
    // behavioural gates live in MlSpec (planted outliers, determinism,
    // RFF kernel bound), fits are golden-gated in MlGoldenSpec, and the
    // production SCORING paths are hash-checked via the pinned-model twins
    // q58/q59; siblings q53 (Mahalanobis), q54 (DBSCAN noise) and q56
    // (1-D LOF) are hash-checked end-to-end
    "q55_iforest_outliers", "q57_ocsvm_outliers")

  // ---- DuckDB oracles -----------------------------------------------------

  private val T = Tables.transcriptsSql

  /** SQL twin of TextAnalysis.normalized. */
  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"""

  /** The exact 3-token-shingle Jaccard pair census — the d / sh / sz /
    * pairs / good CTE chain shared by the q40 / q64 / q99 oracles. ONE
    * copy: a change to shingle semantics edited here re-twins all three
    * at once instead of silently desynchronizing hand-kept duplicates.
    * `docFilter` narrows the doc census (q99 bounds its rate to non-null
    * docs, mirroring the engine pass's isNotNull pre-filter); `sh`
    * DISTINCTs (doc_id, shingle) — the same set-union doc collapse the
    * engine's minhashSignatures and verifyJaccard apply.
    */
  private def shingleCensusSql(docFilter: String = ""): String =
    s"""d AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS tk FROM documents$docFilter),
       |sh AS (SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
       |      i -> concat_ws(' ', tk[i+1], tk[i+2], tk[i+3]))) AS sh
       |    FROM d WHERE len(tk) >= 3)),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::DOUBLE AS inter
       |  FROM sh a JOIN sh b USING (sh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       |good AS (SELECT a_id, b_id, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
       |  FROM pairs JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
       |  WHERE inter / (sa.sz + sb.sz - inter) >= 0.7)""".stripMargin

  /** langId's SQL twin — the toks / h / b / pred CTE chain ending in a
    * per-doc `lang_pred`, shared by the q33 and q101 oracles (ONE copy of
    * the marker sets and the tie-break order, like [[shingleCensusSql]]).
    */
  private def langPredSql(docFilter: String = ""): String =
    s"""toks AS (SELECT doc_id,
       |    string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents$docFilter),
       |h AS (SELECT doc_id,
       |  len(list_filter(tk, t -> t IN ('the','a','of','and','to','in','is','that','it','for'))) AS h_en,
       |  len(list_filter(tk, t -> t IN ('der','die','das','und','ist','ein','nicht','mit','sich','auf'))) AS h_de,
       |  len(list_filter(tk, t -> t IN ('el','la','los','y','es','un','una','en','que','por'))) AS h_es,
       |  len(list_filter(tk, t -> t IN ('le','la','les','et','est','un','une','dans','que','pour'))) AS h_fr
       |  FROM toks),
       |b AS (SELECT doc_id, h_en, h_de, h_es, h_fr,
       |  greatest(h_en, h_de, h_es, h_fr) AS best FROM h),
       |pred AS (SELECT doc_id,
       |  CASE WHEN h_en > 0 AND h_en = best THEN 'en'
       |       WHEN h_de > 0 AND h_de = best THEN 'de'
       |       WHEN h_es > 0 AND h_es = best THEN 'es'
       |       WHEN h_fr > 0 AND h_fr = best THEN 'fr'
       |       ELSE 'und' END AS lang_pred
       |  FROM b)""".stripMargin

  /** Quality-feature CTE chain (f raw counts → g ratios), shared by the
    * q34 and q100 oracles.
    */
  private def qualityFgSql(docFilter: String = ""): String =
    s"""f AS (SELECT doc_id, text,
       |    length(text) AS n_chars,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS n_tokens,
       |    length(regexp_replace(text, '[\\p{L}0-9\\s]', '', 'g'))::DOUBLE AS punct_n,
       |    length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS digit_n,
       |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |      t -> t IN ('the','a','of','and','to','in','is','that','it','for')))::DOUBLE AS stop_n
       |  FROM documents$docFilter),
       |g AS (SELECT doc_id, n_chars, n_tokens,
       |    CASE WHEN n_tokens > 0 THEN length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE / n_tokens END AS mean_token_len,
       |    CASE WHEN n_chars > 0 THEN punct_n / n_chars ELSE 0 END AS punct_ratio,
       |    CASE WHEN n_chars > 0 THEN digit_n / n_chars ELSE 0 END AS digit_ratio,
       |    CASE WHEN n_tokens > 0 THEN stop_n / n_tokens ELSE 0 END AS stopword_ratio
       |  FROM f)""".stripMargin

  /** The quality-score expression over `g`'s columns — ONE SQL copy of
    * TextAnalysis.qualityScoreCol's formula. floor(x*1e6+0.5)/1e6 =
    * deterministic half-up (scores land exactly on round()
    * half-boundaries, where engine round() semantics diverge).
    */
  private val qualityScoreSqlExpr: String =
    """floor(greatest(0.0, least(1.0,
      |    least(coalesce(n_tokens, 0) / 64.0, 1.0) * 0.3 +
      |    coalesce(1.0 - least(abs(mean_token_len - 5.0) / 5.0, 1.0), 0.0) * 0.3 +
      |    least(stopword_ratio * 5.0, 1.0) * 0.2 +
      |    (1.0 - least(punct_ratio * 3.0 + digit_ratio * 2.0, 1.0)) * 0.2)) * 1e6 + 0.5) / 1e6""".stripMargin

  /** SQL twin of the classical decomposition CTE chain (period 24). */
  private val decompSql =
    """series AS (
      |  SELECT date_trunc('hour', ts) AS bucket_ts, count(*)::DOUBLE AS y
      |  FROM events GROUP BY 1),
      |idxd AS (
      |  SELECT CAST(row_number() OVER (ORDER BY bucket_ts) - 1 AS INT) AS idx, y
      |  FROM series),
      |tr AS (
      |  SELECT idx, y,
      |    CASE WHEN count(y) OVER w = 25 THEN
      |      (sum(y) OVER w - 0.5 * (first_value(y) OVER w + last_value(y) OVER w)) / 24
      |    END AS trend
      |  FROM idxd
      |  WINDOW w AS (ORDER BY idx ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
      |det AS (SELECT idx, y, trend, idx % 24 AS phase, y - trend AS d FROM tr),
      |pm AS (SELECT phase, avg(d) AS pmean FROM det GROUP BY 1),
      |g AS (SELECT avg(pmean) AS grand FROM pm),
      |dc AS (
      |  SELECT idx, y, trend, pmean - grand AS seasonal,
      |    y - trend - (pmean - grand) AS resid
      |  FROM det JOIN pm USING (phase), g)""".stripMargin

  /** SQL: does `v` contain ANY kind of the graft.text.Pii battery? The
    * q97 patterns (interpolated from the ONE Scala source) as a single
    * boolean — used by the q91 census's no_pii rule. Card candidates are
    * Luhn-verified exactly like the engine (every 13–19-digit run).
    */
  private def piiAnySql(v: String): String = {
    val p = graft.text.Pii.patterns.toMap
    s"""(regexp_matches($v, '${p("email")}')
       |  OR regexp_matches($v, '${p("phone")}')
       |  OR regexp_matches($v, '${p("ssn")}')
       |  OR regexp_matches($v, '${p("ipv4")}')
       |  OR len(list_filter(regexp_extract_all($v, '(${p("card")})', 1),
       |    c -> list_sum(list_transform(range(1, length(c) + 1), i ->
       |      CASE WHEN i % 2 = 0 THEN
       |        CASE WHEN 2 * (ascii(substr(reverse(c), i, 1)) - 48) > 9
       |             THEN 2 * (ascii(substr(reverse(c), i, 1)) - 48) - 9
       |             ELSE 2 * (ascii(substr(reverse(c), i, 1)) - 48) END
       |      ELSE ascii(substr(reverse(c), i, 1)) - 48 END)) % 10 = 0))
       |    > 0)""".stripMargin
  }

  /** q91 twin: per-column census rows over the transcripts view. One UNION
    * branch per column, mirroring Suggestions.census — string columns carry
    * a sorted distinct-value list for the in_set rule (gated later).
    */
  private val q91StatsSql: String = {
    val cols = Seq( // (name, isString, isNumeric)
      ("conv_id", true, false), ("turn_idx", false, true),
      ("role", true, false), ("text", true, false), ("tool", true, false),
      ("ts", false, false), ("value", false, true))
    val battery = graft.compile.Suggestions.shapeBattery
    val branches = cols.map { case (c, isStr, isNum) =>
      val mn = if (isNum) s"min($c)::DOUBLE" else "NULL::DOUBLE"
      val mx = if (isNum) s"max($c)::DOUBLE" else "NULL::DOUBLE"
      val vals =
        if (isStr)
          s"""(SELECT string_agg(v, ',' ORDER BY v)
             |     FROM (SELECT DISTINCT $c AS v FROM transcripts
             |           WHERE $c IS NOT NULL))""".stripMargin
        else "NULL::VARCHAR"
      // shape battery: values BREAKING each candidate pattern (the SAME
      // ordered battery the engine fuses into its census pass)
      val shapes = battery.zipWithIndex.map { case (p, i) =>
        if (isStr)
          "sum(CASE WHEN " + c + " IS NOT NULL AND NOT regexp_matches(" +
            c + ", '" + p + "') THEN 1 ELSE 0 END) AS shape" + i
        else s"NULL::BIGINT AS shape$i"
      }.mkString(", ")
      // pii census: non-null values hitting the full battery (the same
      // interpolated patterns + Luhn fold the q97 twin replays)
      val pii =
        if (isStr)
          s"sum(CASE WHEN $c IS NOT NULL AND ${piiAnySql(c)} " +
            "THEN 1 ELSE 0 END) AS piihits"
        else "NULL::BIGINT AS piihits"
      // length census: the string analog of min/max (engine's
      // length_bounds suggestion rule)
      val lmin = if (isStr) s"min(length($c))::BIGINT" else "NULL::BIGINT"
      val lmax = if (isStr) s"max(length($c))::BIGINT" else "NULL::BIGINT"
      s"""SELECT '$c' AS c, count(*) AS n, count(*) - count($c) AS nulls,
         |       count(DISTINCT $c) AS dist, $mn AS mn, $mx AS mx,
         |       $isStr AS is_str, $isNum AS is_num, $vals AS vals,
         |       $shapes, $pii,
         |       $lmin AS lmin, $lmax AS lmax
         |FROM transcripts""".stripMargin
    }
    s"stats AS (\n${branches.mkString("\nUNION ALL\n")}\n)"
  }

  /** q91 twin: the matches_regex rule — first battery hit wins. */
  private val q91ShapeSql: String = {
    val battery = graft.compile.Suggestions.shapeBattery
    val firstHit = battery.zipWithIndex
      .map { case (p, i) => s"WHEN shape$i = 0 THEN '" + p + "'" }
      .mkString(" ")
    val anyHit = battery.indices.map(i => s"shape$i = 0").mkString(" OR ")
    s"""SELECT c, 'matches_regex', NULL, NULL,
       |       CASE $firstHit END
       |FROM stats
       |WHERE n > 0 AND is_str AND n - nulls > 0 AND dist > 20
       |  AND ($anyHit)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q01_scan_project_filter" ->
      """SELECT event_id, user_id, event_type, value, ts FROM events
        |WHERE value IS NOT NULL AND event_type IN ('click','view','purchase')
        |  AND ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-22 00:00:00'""".stripMargin,

    "q02_summary_agg" ->
      """SELECT user_id, count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts,
        |  count(DISTINCT event_type) AS n_types, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY user_id""".stripMargin,

    "q03_column_stats" ->
      """SELECT count(*) AS rows, count(*) - count(value) AS nulls,
        |  round(avg(value), 6) AS mean, round(stddev_samp(value), 6) AS stddev,
        |  round(var_pop(value), 6) AS var_pop_v, min(value) AS vmin, max(value) AS vmax
        |FROM events""".stripMargin,

    "q04_quantiles" ->
      """SELECT round(quantile_cont(value, 0.25), 6) AS q1,
        |  round(quantile_cont(value, 0.5), 6) AS med,
        |  round(quantile_cont(value, 0.75), 6) AS q3,
        |  round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6) AS iqr
        |FROM events""".stripMargin,

    "q05_robust_z_outliers" ->
      """WITH m AS (SELECT median(value) AS med FROM events),
        |  d AS (SELECT median(abs(value - med)) AS mad FROM events, m)
        |SELECT event_id, value,
        |  round(CASE WHEN mad > 0 THEN 0.6745 * (value - med) / mad END, 4) AS rz
        |FROM events, m, d
        |WHERE abs(CASE WHEN mad > 0 THEN 0.6745 * (value - med) / mad END) > 3.5""".stripMargin,

    "q06_iqr_outliers" ->
      """WITH q AS (SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM events)
        |SELECT event_id, value,
        |  round(q1 - 1.5 * (q3 - q1), 6) AS lo, round(q3 + 1.5 * (q3 - q1), 6) AS hi
        |FROM events, q
        |WHERE value < q1 - 1.5 * (q3 - q1) OR value > q3 + 1.5 * (q3 - q1)""".stripMargin,

    "q07_uniqueness_violations" ->
      """SELECT user_id, event_type, date_trunc('hour', ts) AS bucket_ts, count(*) AS n
        |FROM events GROUP BY 1, 2, 3 HAVING count(*) > 1""".stripMargin,

    "q08_referential_violations" ->
      s"""WITH $T
         |SELECT conv_id, turn_idx, role FROM transcripts
         |WHERE role NOT IN ('user','assistant','system','tool')""".stripMargin,

    "q09_rolling_z_violations" ->
      s"""WITH $T,
         |w AS (
         |  SELECT conv_id, turn_idx, value,
         |    count(value) OVER win AS n_win,
         |    avg(value) OVER win AS roll_mean,
         |    stddev_samp(value) OVER win AS roll_std
         |  FROM transcripts
         |  WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
         |)
         |SELECT conv_id, turn_idx, value,
         |  round(CASE WHEN roll_std > 0 THEN (value - roll_mean) / roll_std END, 4) AS z
         |FROM w WHERE n_win >= 24
         |  AND abs(CASE WHEN roll_std > 0 THEN (value - roll_mean) / roll_std END) > 3""".stripMargin,

    "q10_turn_rate_bucketing" ->
      s"""WITH $T
         |SELECT conv_id, date_trunc('hour', ts) AS bucket_ts, count(*) AS n_turns,
         |  round(avg(value), 6) AS mean_value
         |FROM transcripts GROUP BY 1, 2""".stripMargin,

    "q11_cumsum" ->
      """SELECT event_id, round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_value
        |FROM events""".stripMargin,

    "q12_ffill" ->
      """WITH base AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v FROM events)
        |SELECT event_id, last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM base""".stripMargin,

    "q13_classical_decomposition" ->
      s"""WITH $decompSql
         |SELECT idx, y, round(trend, 6) AS trend, round(seasonal, 6) AS seasonal,
         |  round(resid, 6) AS resid
         |FROM dc""".stripMargin,

    "q14_strengths" ->
      s"""WITH $decompSql,
         |v AS (SELECT var_pop(trend) AS vt, var_pop(seasonal) AS vs,
         |  var_pop(resid) AS vr, count(resid) AS n_resid FROM dc)
         |SELECT
         |  round(CASE WHEN vr = 0 THEN 1.0 ELSE least(1.0, greatest(0.0, vt / (vt + vr))) END, 6) AS trend_strength,
         |  round(CASE WHEN vr = 0 THEN 1.0 ELSE least(1.0, greatest(0.0, vs / (vs + vr))) END, 6) AS seasonal_strength,
         |  n_resid
         |FROM v""".stripMargin,

    "q15_psi" ->
      """WITH base AS (SELECT value,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'baseline' ELSE 'current' END AS side
        |  FROM events),
        |e AS (SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
        |  FROM base WHERE side = 'baseline'),
        |binned AS (SELECT side,
        |    (value > qs[1])::INT + (value > qs[2])::INT + (value > qs[3])::INT +
        |    (value > qs[4])::INT + (value > qs[5])::INT + (value > qs[6])::INT +
        |    (value > qs[7])::INT + (value > qs[8])::INT + (value > qs[9])::INT AS bin
        |  FROM base, e),
        |counts AS (SELECT bin,
        |    sum(CASE WHEN side = 'baseline' THEN 1 ELSE 0 END)::DOUBLE AS nb,
        |    sum(CASE WHEN side = 'current' THEN 1 ELSE 0 END)::DOUBLE AS nc
        |  FROM binned GROUP BY bin),
        |tot AS (SELECT sum(nb) AS tb, sum(nc) AS tc FROM counts)
        |SELECT round(sum((greatest(nb/tb, 1e-4) - greatest(nc/tc, 1e-4)) *
        |  ln(greatest(nb/tb, 1e-4) / greatest(nc/tc, 1e-4))), 6) AS psi
        |FROM counts, tot""".stripMargin,

    "q16_ks" ->
      """WITH base AS (SELECT value,
        |    CASE WHEN event_type = 'error' THEN 'current' ELSE 'baseline' END AS side
        |  FROM events),
        |c AS (SELECT
        |    sum(CASE WHEN side = 'baseline' THEN 1 ELSE 0 END) OVER w AS cb,
        |    sum(CASE WHEN side = 'current' THEN 1 ELSE 0 END) OVER w AS cc
        |  FROM base
        |  WINDOW w AS (ORDER BY value RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT sum(CASE WHEN side = 'baseline' THEN 1 ELSE 0 END)::DOUBLE AS tb,
        |    sum(CASE WHEN side = 'current' THEN 1 ELSE 0 END)::DOUBLE AS tc FROM base)
        |SELECT round(max(abs(cb / tb - cc / tc)), 6) AS ks FROM c, t""".stripMargin,

    "q17_topk_users" ->
      """SELECT user_id, total FROM (
        |  SELECT user_id, round(sum(value), 4) AS total FROM events GROUP BY 1)
        |ORDER BY total DESC, user_id LIMIT 5""".stripMargin,

    "q18_union_summaries" ->
      """SELECT 'orders' AS table_name, count(*) AS n_rows FROM orders
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |UNION ALL SELECT 'customer', count(*) FROM customer""".stripMargin,

    "q19_minmax_levels" ->
      """WITH s AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
        |n AS (SELECT event_id,
        |  CASE WHEN mx > mn THEN (value - mn) / (mx - mn) END AS score FROM events, s)
        |SELECT event_id, round(score, 6) AS score,
        |  CASE WHEN score > 0.8 THEN 'high' WHEN score > 0.6 THEN 'medium'
        |       WHEN score > 0.3 THEN 'low' ELSE 'normal' END AS level
        |FROM n""".stripMargin,

    "q20_winsorize" ->
      """WITH s AS (SELECT avg(value) AS mu, stddev_samp(value) AS sigma FROM events)
        |SELECT event_id, value, round(mu, 6) AS clamped FROM events, s
        |WHERE abs(value - mu) > 3 * sigma""".stripMargin,

    "q21_ensemble_vote" ->
      """WITH s AS (SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3,
        |    median(value) AS med, avg(value) AS mu, stddev_pop(value) AS sigma FROM events),
        |d AS (SELECT median(abs(value - med)) AS mad FROM events, s),
        |f AS (SELECT event_id,
        |    (value < q1 - 1.5 * (q3 - q1) OR value > q3 + 1.5 * (q3 - q1))::INT AS f_iqr,
        |    coalesce(mad > 0 AND abs(0.6745 * (value - med) / mad) > 3.5, false)::INT AS f_rz,
        |    coalesce(sigma > 0 AND abs((value - mu) / sigma) > 3.0, false)::INT AS f_gz
        |  FROM events, s, d)
        |SELECT event_id, CAST(f_iqr + f_rz + f_gz AS INT) AS votes FROM f
        |WHERE f_iqr + f_rz + f_gz >= 2""".stripMargin,

    "q22_feature_importance" ->
      """WITH li AS (SELECT *, l_extendedprice * (1 - l_discount) AS score FROM lineitem),
        |raw AS (
        |  SELECT 'l_quantity' AS feature, var_pop(l_quantity) * abs(corr(l_quantity, score)) AS raw FROM li
        |  UNION ALL SELECT 'l_extendedprice', var_pop(l_extendedprice) * abs(corr(l_extendedprice, score)) FROM li
        |  UNION ALL SELECT 'l_discount', var_pop(l_discount) * abs(corr(l_discount, score)) FROM li
        |  UNION ALL SELECT 'l_tax', var_pop(l_tax) * abs(corr(l_tax, score)) FROM li),
        |t AS (SELECT sum(raw) AS total FROM raw)
        |SELECT feature, round(raw / total, 6) AS importance FROM raw, t""".stripMargin,

    "q23_full_outer_join" ->
      """WITH c AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS clicks
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT user_id, day, coalesce(clicks, 0) AS clicks,
        |  coalesce(purchases, 0) AS purchases
        |FROM c FULL OUTER JOIN p USING (user_id, day)""".stripMargin,

    "q24_interpolate" ->
      """WITH base AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v FROM events),
        |idxd AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx FROM base),
        |w AS (SELECT event_id, v, idx,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER wp AS pi,
        |    first_value(v IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER wn AS ni
        |  FROM idxd
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY user_id ORDER BY idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, round(CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv + (nv - pv) * (idx - pi)::DOUBLE / (ni - pi)
        |    WHEN pv IS NOT NULL THEN pv ELSE nv END, 6) AS interp
        |FROM w""".stripMargin,

    "q25_scalar_functions" ->
      """SELECT event_id, floor(epoch(ts))::BIGINT AS epoch_s,
        |  strftime(ts, '%Y-%m-%d %H:%M') AS ts_str,
        |  ts + INTERVAL 1 DAY AS ts_next,
        |  printf('%.2f', value) AS v2,
        |  round(value - 273.15, 6) AS v_celsius,
        |  abs(value - 100) AS v_abs,
        |  event_type || '_' || (event_id % 10)::VARCHAR AS code
        |FROM events""".stripMargin,

    "q26_centered_smooth" ->
      """SELECT event_id,
        |  round(CASE WHEN count(value) OVER w = 5 THEN avg(value) OVER w END, 6) AS smooth
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)""".stripMargin,

    "q27_forecast" ->
      s"""WITH $decompSql,
         |tl AS (SELECT trend, row_number() OVER (ORDER BY idx DESC) AS rn
         |  FROM dc WHERE trend IS NOT NULL),
         |tslope AS (SELECT max(CASE WHEN rn = 1 THEN trend END) AS t1,
         |  max(CASE WHEN rn = 2 THEN trend END) AS t2 FROM tl WHERE rn <= 2),
         |seas AS (SELECT seasonal, row_number() OVER (ORDER BY idx DESC) AS rn
         |  FROM dc WHERE seasonal IS NOT NULL),
         |steps AS (SELECT CAST(unnest(range(1, 25)) AS INT) AS step)
         |SELECT step, round(t1 + (t1 - t2) * step + s.seasonal, 6) AS forecast
         |FROM steps, tslope
         |JOIN seas s ON s.rn = 24 - ((step - 1) % 24)""".stripMargin,

    "q30_dedup_exact" ->
      """WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
        |k AS (SELECT digest, min(doc_id) AS kept_id FROM d GROUP BY 1)
        |SELECT kept_id, doc_id AS dup_id, digest FROM d JOIN k USING (digest)
        |WHERE doc_id != kept_id""".stripMargin,

    "q31_fingerprints" ->
      s"""SELECT doc_id, md5($normSql) AS fp FROM documents""",

    "q32_token_counts" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS n_ws,
        |  CAST(list_sum(list_transform(string_split_regex(trim(lower(text)), '\s+'),
        |      w -> CAST(ceil(length(regexp_replace(w, '[^\p{L}]', '', 'g')) / 4.0) AS INT)))
        |    + length(regexp_replace(text, '[^0-9]', '', 'g'))
        |    + length(regexp_replace(text, '[\p{L}0-9\s]', '', 'g')) AS INT) AS n_bpeish
        |FROM documents""".stripMargin,

    "q33_lang_id" ->
      s"""WITH ${langPredSql()}
         |SELECT doc_id, lang_pred FROM pred""".stripMargin,

    "q34_quality" ->
      s"""WITH ${qualityFgSql()}
         |SELECT doc_id, n_chars, n_tokens,
         |  round(mean_token_len, 6) AS mean_token_len,
         |  round(punct_ratio, 6) AS punct_ratio,
         |  round(digit_ratio, 6) AS digit_ratio,
         |  round(stopword_ratio, 6) AS stopword_ratio,
         |  $qualityScoreSqlExpr AS quality_score
         |FROM g""".stripMargin,

    "q35_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, $normSql AS nt FROM documents WHERE doc_id < 60),
         |-- nt <> '' mirrors shingleHashes' empty-normalized guard (k=1:
         |-- split('') would yield a phantom '' token)
         |tok AS (SELECT DISTINCT doc_id, unnest(string_split(nt, ' ')) AS tk
         |  FROM d WHERE nt <> ''),
         |sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::DOUBLE AS inter
         |  FROM tok a JOIN tok b USING (tk) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT a_id, b_id, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
         |FROM pairs JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
         |WHERE inter / (sa.sz + sb.sz - inter) >= 0.5""".stripMargin,

    // SQL twin of the md5-anchored reproducible simhash: identical token
    // hash (first 15 md5 hex chars = 60 bits), identical bit votes, then
    // exact all-pairs hamming — catches any silently-dropped banding pair.
    "q36_simhash_neardups" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
         |  FROM documents),
         |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
         |bitsum AS (SELECT doc_id, b.b AS b,
         |    sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM h, (SELECT unnest(range(60)) AS b) b GROUP BY 1, 2),
         |sim AS (SELECT doc_id,
         |    sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash
         |  FROM bitsum GROUP BY 1)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,

    // Full SQL twin of the LSH-ANN pipeline: regenerates the identical
    // md5-derived hyperplane matrix, rebuilds every (table, bucket) id with
    // the same FP summation order, joins candidates, and re-ranks by exact
    // cosine — any banding, dedup, or rejoin defect breaks the hash match.
    "q39_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |pl AS (SELECT t, p, list(c ORDER BY i) AS cl FROM (
         |    SELECT tt.range AS t, pp.range AS p, ii.range AS i,
         |      (('0x' || substr(md5('plane_' || tt.range || '_' || pp.range || '_' || ii.range), 1, 15))::BIGINT
         |        % 2000001 - 1000000) / 1000000.0 AS c
         |    FROM range($annTables) tt, range($annPlanes) pp, range($annDims) ii)
         |  GROUP BY 1, 2),
         |pr AS (SELECT vec_id, t, p,
         |    list_sum(list_transform(range($annDims), i -> v[i+1] * cl[i+1])) AS proj
         |  FROM e, pl),
         |bk AS (SELECT vec_id, t,
         |    sum(CASE WHEN proj >= 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS b
         |  FROM pr GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS neighbor_id
         |  FROM (SELECT * FROM bk WHERE vec_id < 10) q
         |  JOIN bk c USING (t, b) WHERE c.vec_id != q.vec_id),
         |s AS (SELECT q_id, neighbor_id, list_cosine_similarity(qe.v, ce.v) AS c
         |  FROM cand JOIN e qe ON qe.vec_id = q_id JOIN e ce ON ce.vec_id = neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) AS rn FROM s)
         |SELECT q_id, neighbor_id, round(c, 6) AS cos, CAST(rn AS INT) AS rank
         |FROM r WHERE rn <= 5""".stripMargin,

    // Exact all-pairs 3-token-shingle Jaccard >= 0.7 — the minhash-LSH +
    // exact-verify pipeline must reproduce this set (miss prob ~4e-10).
    "q40_minhash_lsh" ->
      s"""WITH ${shingleCensusSql()}
         |SELECT a_id, b_id, jaccard FROM good""".stripMargin,

    // Finite-window adjusted EWM (cap 138 = the engine's 1e-12 truncation
    // bound for span 10), replayed per row over the trailing value list in
    // engine summation order (newest term first).
    "q42_ewm" ->
      """WITH ord AS (SELECT event_id, value,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 137 PRECEDING AND CURRENT ROW) AS l
        |  FROM events),
        |t AS (SELECT event_id,
        |    list_sum(list_transform(range(len(l)),
        |      i -> CASE WHEN l[len(l) - i] IS NOT NULL
        |           THEN l[len(l) - i] * pow(1.0 - 2.0/11.0, i) ELSE 0.0 END)) AS num,
        |    list_sum(list_transform(range(len(l)),
        |      i -> CASE WHEN l[len(l) - i] IS NOT NULL
        |           THEN pow(1.0 - 2.0/11.0, i) ELSE 0.0 END)) AS den
        |  FROM ord)
        |SELECT event_id, round(CASE WHEN den > 0 THEN num / den END, 6) AS ewm
        |FROM t""".stripMargin,

    "q37_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT q_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.q_vec::DOUBLE[], e.embedding::DOUBLE[]) AS c
        |  FROM q, embeddings e WHERE e.vec_id != q.q_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) AS rn FROM s)
        |SELECT q_id, neighbor_id, round(c, 6) AS cos FROM r WHERE rn <= 5""".stripMargin,

    "q38_embedding_neardups" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id AND a.vec_id < 500 AND b.vec_id < 500
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4""".stripMargin,

    "q51_report_rollup" ->
      s"""WITH $T,
         |v AS (SELECT CASE WHEN role = 'invalid_role' THEN 'ref(role)'
         |             ELSE 'ref(tool)' END AS "constraint", conv_id
         |  FROM transcripts
         |  WHERE role = 'invalid_role' OR tool = 'tool_xx')
         |SELECT "constraint", conv_id, count(*) AS n_violations
         |FROM v GROUP BY ROLLUP ("constraint", conv_id)""".stripMargin,

    "q49_verdicts_referential" ->
      s"""WITH $T,
         |v AS (SELECT conv_id, count(*) AS rows,
         |    sum(CASE WHEN role NOT IN ('user','assistant','system','tool') THEN 1 ELSE 0 END) AS viol
         |  FROM transcripts GROUP BY 1)
         |SELECT conv_id AS partition_key, viol = 0 AS pass, rows,
         |  CAST(viol AS BIGINT) AS violations,
         |  round(viol::DOUBLE / rows, 6) AS violation_rate
         |FROM v""".stripMargin,

    // Byte-level replay of the multimodal stub codec: rolling 64-bit byte
    // hash (h = 31h + b mod 2^64) over utf-8(text), per-dim golden-ratio
    // mix, signed truncated mod — integers, so the hash match is exact.
    "q41_multimodal_features" ->
      """WITH h AS (SELECT doc_id AS asset_id,
        |    list_reduce(list_prepend(1125899906842597::HUGEINT,
        |      list_transform(generate_series(1, length(text)), i -> ord(substr(text, i, 1))::HUGEINT)),
        |      (a, b) -> (31*a + b) % 18446744073709551616::HUGEINT) AS h0
        |  FROM documents WHERE text IS NOT NULL),
        |x AS (SELECT asset_id,
        |    xor(h0::UBIGINT, ((11400714819323198485::HUGEINT * 1) % 18446744073709551616::HUGEINT)::UBIGINT) AS x0,
        |    xor(h0::UBIGINT, ((11400714819323198485::HUGEINT * 2) % 18446744073709551616::HUGEINT)::UBIGINT) AS x1,
        |    xor(h0::UBIGINT, ((11400714819323198485::HUGEINT * 3) % 18446744073709551616::HUGEINT)::UBIGINT) AS x2,
        |    xor(h0::UBIGINT, ((11400714819323198485::HUGEINT * 4) % 18446744073709551616::HUGEINT)::UBIGINT) AS x3
        |  FROM h)
        |SELECT asset_id,
        |  CAST((CASE WHEN x0 >= 9223372036854775808::HUGEINT THEN x0::HUGEINT - 18446744073709551616::HUGEINT ELSE x0::HUGEINT END) % 1000003 AS BIGINT) AS r0,
        |  CAST((CASE WHEN x1 >= 9223372036854775808::HUGEINT THEN x1::HUGEINT - 18446744073709551616::HUGEINT ELSE x1::HUGEINT END) % 1000003 AS BIGINT) AS r1,
        |  CAST((CASE WHEN x2 >= 9223372036854775808::HUGEINT THEN x2::HUGEINT - 18446744073709551616::HUGEINT ELSE x2::HUGEINT END) % 1000003 AS BIGINT) AS r2,
        |  CAST((CASE WHEN x3 >= 9223372036854775808::HUGEINT THEN x3::HUGEINT - 18446744073709551616::HUGEINT ELSE x3::HUGEINT END) % 1000003 AS BIGINT) AS r3
        |FROM x""".stripMargin,

    // Multiplicative twin of the classical decomposition chain: ratios for
    // detrending/seasonal centring, resid = y / (trend * seasonal).
    "q43_mult_decomposition" ->
      """WITH series AS (
        |  SELECT date_trunc('hour', ts) AS bucket_ts, count(*)::DOUBLE AS y
        |  FROM events GROUP BY 1),
        |idxd AS (
        |  SELECT CAST(row_number() OVER (ORDER BY bucket_ts) - 1 AS INT) AS idx, y
        |  FROM series),
        |tr AS (
        |  SELECT idx, y,
        |    CASE WHEN count(y) OVER w = 25 THEN
        |      (sum(y) OVER w - 0.5 * (first_value(y) OVER w + last_value(y) OVER w)) / 24
        |    END AS trend
        |  FROM idxd
        |  WINDOW w AS (ORDER BY idx ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |-- NULLIF mirrors the engine's zero-divisor guards (a zero trend/
        |-- seasonal degrades to null components instead of erroring)
        |det AS (SELECT idx, y, trend, idx % 24 AS phase, y / nullif(trend, 0) AS d FROM tr),
        |pm AS (SELECT phase, avg(d) AS pmean FROM det GROUP BY 1),
        |g AS (SELECT avg(pmean) AS grand FROM pm),
        |dc AS (
        |  SELECT idx, y, trend, pmean / nullif(grand, 0) AS seasonal,
        |    y / nullif(trend * (pmean / nullif(grand, 0)), 0) AS resid
        |  FROM det JOIN pm USING (phase), g)
        |SELECT idx, y, round(trend, 6) AS trend, round(seasonal, 6) AS seasonal,
        |  round(resid, 6) AS resid
        |FROM dc""".stripMargin,

    // Lag-0 Dickey-Fuller: closed-form OLS t-stat of the level coefficient
    // in dy_t = a + b*y_{t-1}, plus the MacKinnon(2010) tau_c 5% response
    // surface — the exact arithmetic Stationarity.adfStat performs.
    "q44_adf_stationarity" ->
      """WITH series AS (SELECT date_trunc('hour', ts) AS bucket_ts, count(*)::DOUBLE AS y
        |  FROM events GROUP BY 1),
        |ord AS (SELECT y, row_number() OVER (ORDER BY bucket_ts) AS rn FROM series),
        |pairs AS (SELECT cur.y - prev.y AS d, prev.y AS x
        |  FROM ord cur JOIN ord prev ON cur.rn = prev.rn + 1),
        |s AS (SELECT count(*)::DOUBLE AS n, regr_sxx(d, x) AS sxx,
        |    regr_syy(d, x) AS syy, regr_sxy(d, x) AS sxy FROM pairs),
        |t AS (SELECT n, sxy/sxx AS b,
        |    sqrt(((syy - sxy*sxy/sxx) / (n - 2)) / sxx) AS se,
        |    -2.86154 - 2.8903/n - 4.234/(n*n) - 40.040/(n*n*n) AS crit FROM s)
        |SELECT 'all' AS k, round(b / se, 6) AS adf_stat, 0 AS used_lag,
        |  CAST(n AS INT) AS nobs, round(crit, 6) AS crit_5pct,
        |  (b / se) < crit AS stationary
        |FROM t""".stripMargin,

    // ADF with fixed lag 2: regression Δy_t = α + ρ·y_{t-1} + b1·Δy_{t-1}
    // + b2·Δy_{t-2}. With an intercept, the slope block of (X'X)⁻¹ equals
    // the inverse of the CENTERED 3×3 moment matrix, so ρ̂ and se(ρ̂) have
    // a Cramer's-rule closed form over covar_pop moments; σ̂² uses
    // df = n − 4 (const + 3 regressors), matching the OLS kernel.
    "q44b_adf_lag2" ->
      """WITH series AS (SELECT date_trunc('hour', ts) AS bucket_ts, count(*)::DOUBLE AS y
        |  FROM events GROUP BY 1),
        |ord AS (SELECT y, row_number() OVER (ORDER BY bucket_ts) AS rn FROM series),
        |reg AS (SELECT cur.y - p1.y AS dd, p1.y AS x1, p1.y - p2.y AS dl1,
        |    p2.y - p3.y AS dl2
        |  FROM ord cur
        |  JOIN ord p1 ON cur.rn = p1.rn + 1
        |  JOIN ord p2 ON cur.rn = p2.rn + 2
        |  JOIN ord p3 ON cur.rn = p3.rn + 3),
        |m AS (SELECT count(*)::DOUBLE AS n,
        |    covar_pop(x1,x1)*count(*) AS m11, covar_pop(x1,dl1)*count(*) AS m12,
        |    covar_pop(x1,dl2)*count(*) AS m13, covar_pop(dl1,dl1)*count(*) AS m22,
        |    covar_pop(dl1,dl2)*count(*) AS m23, covar_pop(dl2,dl2)*count(*) AS m33,
        |    covar_pop(x1,dd)*count(*) AS v1, covar_pop(dl1,dd)*count(*) AS v2,
        |    covar_pop(dl2,dd)*count(*) AS v3, covar_pop(dd,dd)*count(*) AS sdd
        |  FROM reg),
        |sol AS (SELECT n, sdd, v1, v2, v3,
        |    m11*(m22*m33 - m23*m23) - m12*(m12*m33 - m23*m13)
        |      + m13*(m12*m23 - m22*m13) AS det,
        |    m22*m33 - m23*m23 AS c11,
        |    v1*(m22*m33 - m23*m23) - m12*(v2*m33 - m23*v3)
        |      + m13*(v2*m23 - m22*v3) AS det1,
        |    m11*(v2*m33 - v3*m23) - v1*(m12*m33 - m23*m13)
        |      + m13*(m12*v3 - v2*m13) AS det2,
        |    m11*(m22*v3 - m23*v2) - m12*(m12*v3 - v2*m13)
        |      + v1*(m12*m23 - m22*m13) AS det3
        |  FROM m),
        |t AS (SELECT n,
        |    det1/det AS rho,
        |    (sdd - (det1/det)*v1 - (det2/det)*v2 - (det3/det)*v3) / (n - 4)
        |      AS sig2,
        |    c11/det AS invc11,
        |    -2.86154 - 2.8903/n - 4.234/(n*n) - 40.040/(n*n*n) AS crit
        |  FROM sol)
        |SELECT 'all' AS k, round(rho / sqrt(sig2 * invc11), 6) AS adf_stat,
        |  2 AS used_lag, CAST(n AS INT) AS nobs, round(crit, 6) AS crit_5pct,
        |  (rho / sqrt(sig2 * invc11)) < crit AS stationary
        |FROM t""".stripMargin,

    // Full SQL twin of the flagship validator suite (classical drift
    // method): per-conv verdicts for 5 constraints, the global
    // completeness verdict, and the per-conversation drift verdict
    // (classical 2xMA decomposition -> residual IQR anomalies -> PSI over
    // baseline-quantile bins -> exact tie-aware KS, first vs second half).
    "q52_validation_suite_classical" ->
      s"""WITH $T,
         |cr AS (SELECT conv_id, count(*) AS rows FROM transcripts GROUP BY 1),
         |tot AS (SELECT count(*) AS n,
         |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS nulls FROM transcripts),
         |vall AS (
         |  SELECT conv_id, 'not_null(text)' AS c, count(*) AS v
         |    FROM transcripts WHERE text IS NULL GROUP BY 1
         |  UNION ALL
         |  SELECT conv_id, 'unique(conv_id,turn_idx)' AS c, count(*) AS v FROM (
         |    SELECT conv_id, turn_idx FROM transcripts GROUP BY 1, 2 HAVING count(*) > 1)
         |    GROUP BY 1
         |  UNION ALL
         |  SELECT conv_id, 'ref(role->role_dim)' AS c, count(*) AS v
         |    FROM transcripts
         |    WHERE role IS NOT NULL AND role NOT IN ('user','assistant','system','tool')
         |    GROUP BY 1
         |  UNION ALL
         |  SELECT conv_id, 'ref(tool->tool_dim)' AS c, count(*) AS v
         |    FROM transcripts
         |    WHERE tool IS NOT NULL AND tool NOT IN (
         |      'tool_00','tool_01','tool_02','tool_03','tool_04','tool_05','tool_06','tool_07',
         |      'tool_08','tool_09','tool_10','tool_11','tool_12','tool_13','tool_14','tool_15')
         |    GROUP BY 1
         |  UNION ALL
         |  SELECT conv_id, 'rolling_z(value)' AS c, count(*) AS v FROM (
         |    SELECT conv_id,
         |      count(value) OVER win AS n_win,
         |      (value - avg(value) OVER win) / stddev_samp(value) OVER win AS z
         |    FROM transcripts
         |    WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
         |    WHERE n_win >= 24 AND abs(z) > 3 GROUP BY 1),
         |cons AS (SELECT * FROM (VALUES ('not_null(text)'), ('unique(conv_id,turn_idx)'),
         |    ('ref(role->role_dim)'), ('ref(tool->tool_dim)'), ('rolling_z(value)')) c(c)),
         |perconv AS (
         |  SELECT cr.conv_id AS partition_key, cons.c AS "constraint",
         |    coalesce(v, 0) = 0 AS pass, cr.rows,
         |    CAST(coalesce(v, 0) AS BIGINT) AS violations,
         |    round(coalesce(v, 0)::DOUBLE / cr.rows, 6) AS violation_rate
         |  FROM cr CROSS JOIN cons
         |  LEFT JOIN vall ON vall.conv_id = cr.conv_id AND vall.c = cons.c),
         |gv AS (SELECT '(global)' AS partition_key,
         |    'not_null(text)[global]' AS "constraint",
         |    nulls::DOUBLE / greatest(1, n) <= 0.0 AS pass, n AS rows,
         |    CAST(nulls AS BIGINT) AS violations,
         |    round(nulls::DOUBLE / greatest(1, n), 6) AS violation_rate
         |  FROM tot),
         |series AS (SELECT conv_id, date_trunc('hour', ts) AS bucket_ts,
         |    count(*)::DOUBLE AS y
         |  FROM transcripts GROUP BY 1, 2),
         |idxd AS (SELECT conv_id,
         |    CAST(row_number() OVER (PARTITION BY conv_id ORDER BY bucket_ts) - 1 AS INT) AS idx, y
         |  FROM series),
         |tr AS (SELECT conv_id, idx, y,
         |    CASE WHEN count(y) OVER w = 25 THEN
         |      (sum(y) OVER w - 0.5 * (first_value(y) OVER w + last_value(y) OVER w)) / 24
         |    END AS trend
         |  FROM idxd
         |  WINDOW w AS (PARTITION BY conv_id ORDER BY idx ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
         |det AS (SELECT conv_id, idx, y, trend, idx % 24 AS phase, y - trend AS d FROM tr),
         |pm AS (SELECT conv_id, phase, avg(d) AS pmean FROM det GROUP BY 1, 2),
         |g AS (SELECT conv_id, sum(pmean) / count(*) AS grand FROM pm GROUP BY 1),
         |dc AS (SELECT det.conv_id, idx, y, trend, pmean - grand AS seasonal,
         |    y - trend - (pmean - grand) AS resid
         |  FROM det JOIN pm USING (conv_id, phase) JOIN g USING (conv_id)),
         |rq AS (SELECT conv_id, quantile_cont(resid, 0.25) AS rq1,
         |    quantile_cont(resid, 0.75) AS rq3
         |  FROM dc WHERE resid IS NOT NULL GROUP BY 1),
         |raf AS (SELECT dc.conv_id, resid,
         |    rq1 - 3.0 * (rq3 - rq1) AS lo, rq3 + 3.0 * (rq3 - rq1) AS hi
         |  FROM dc JOIN rq USING (conv_id)),
         |ra AS (SELECT conv_id, count(*) AS resid_anomalies FROM raf
         |  WHERE resid < lo - 1e-9 * greatest(abs(lo), abs(hi), 1.0)
         |     OR resid > hi + 1e-9 * greatest(abs(lo), abs(hi), 1.0)
         |  GROUP BY 1),
         |sided AS (SELECT conv_id, y,
         |    CASE WHEN idx * 2 <= max(idx) OVER (PARTITION BY conv_id)
         |         THEN 'baseline' ELSE 'current' END AS side
         |  FROM idxd),
         |edges AS (SELECT conv_id,
         |    quantile_cont(y, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
         |  FROM sided WHERE side = 'baseline' GROUP BY 1),
         |binned AS (SELECT s.conv_id, side, len(list_filter(qs, e -> y > e)) AS bin
         |  FROM sided s JOIN edges USING (conv_id)),
         |pcounts AS (SELECT conv_id, bin,
         |    sum(CASE WHEN side = 'baseline' THEN 1 ELSE 0 END)::DOUBLE AS nb,
         |    sum(CASE WHEN side = 'current' THEN 1 ELSE 0 END)::DOUBLE AS nc
         |  FROM binned GROUP BY 1, 2),
         |ptot AS (SELECT conv_id, sum(nb) AS tb, sum(nc) AS tc FROM pcounts GROUP BY 1),
         |psiv AS (SELECT conv_id,
         |    sum(CASE WHEN tb > 0 AND tc > 0 THEN
         |      (greatest(nb/tb, 1e-4) - greatest(nc/tc, 1e-4)) *
         |      ln(greatest(nb/tb, 1e-4) / greatest(nc/tc, 1e-4)) END) AS psi
         |  FROM pcounts JOIN ptot USING (conv_id) GROUP BY 1),
         |kc AS (SELECT conv_id,
         |    sum(CASE WHEN side = 'baseline' THEN 1 ELSE 0 END) OVER wo AS cb,
         |    sum(CASE WHEN side = 'current' THEN 1 ELSE 0 END) OVER wo AS cc,
         |    sum(CASE WHEN side = 'baseline' THEN 1 ELSE 0 END) OVER wk AS tbk,
         |    sum(CASE WHEN side = 'current' THEN 1 ELSE 0 END) OVER wk AS tck
         |  FROM sided
         |  WINDOW wo AS (PARTITION BY conv_id ORDER BY y RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wk AS (PARTITION BY conv_id)),
         |ksv AS (SELECT conv_id,
         |    max(abs(CASE WHEN tbk > 0 THEN cb::DOUBLE / tbk END -
         |            CASE WHEN tck > 0 THEN cc::DOUBLE / tck END)) AS ks
         |  FROM kc GROUP BY 1),
         |bc AS (SELECT conv_id, count(*) AS rows FROM idxd GROUP BY 1),
         |drift AS (SELECT bc.conv_id AS partition_key,
         |    'turn_rate_drift' AS "constraint",
         |    (coalesce(resid_anomalies, 0) = 0 AND coalesce(psi <= 0.25, true)
         |      AND coalesce(ks <= 0.5, true)) AS pass,
         |    bc.rows, CAST(coalesce(resid_anomalies, 0) AS BIGINT) AS violations,
         |    round(coalesce(resid_anomalies, 0)::DOUBLE / bc.rows, 6) AS violation_rate
         |  FROM bc LEFT JOIN psiv USING (conv_id) LEFT JOIN ksv USING (conv_id)
         |  LEFT JOIN ra USING (conv_id))
         |SELECT * FROM perconv UNION ALL SELECT * FROM gv
         |UNION ALL SELECT * FROM drift""".stripMargin,

    // merged-of-4-slices state == direct global aggregation (exact fields)
    "q45_stats_state_merge" ->
      s"""WITH $T
         |SELECT 'conv_id' AS col_name, count(*) AS n,
         |  count(*) - count(conv_id) AS nulls,
         |  CAST(NULL AS DOUBLE) AS sum, CAST(NULL AS DOUBLE) AS sumsq,
         |  CAST(NULL AS DOUBLE) AS mn, CAST(NULL AS DOUBLE) AS mx
         |FROM transcripts
         |UNION ALL
         |SELECT 'text', count(*), count(*) - count(text),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
         |FROM transcripts
         |UNION ALL
         |SELECT 'tool', count(*), count(*) - count(tool),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
         |FROM transcripts
         |UNION ALL
         |SELECT 'turn_idx', count(*), count(*) - count(turn_idx),
         |  sum(CAST(turn_idx AS DOUBLE)),
         |  sum(CAST(turn_idx AS DOUBLE) * CAST(turn_idx AS DOUBLE)),
         |  min(CAST(turn_idx AS DOUBLE)), max(CAST(turn_idx AS DOUBLE))
         |FROM transcripts""".stripMargin,

    "q46_salted_counts" ->
      s"""WITH $T
         |SELECT conv_id, count(*) AS n FROM transcripts GROUP BY conv_id""".stripMargin,

    "q47_sliced_violation_union" ->
      s"""WITH $T,
         |v AS (
         |  SELECT 'not_null(text)' AS "constraint", conv_id
         |    FROM transcripts WHERE text IS NULL
         |  UNION ALL
         |  SELECT 'unique(conv_id,turn_idx)', conv_id FROM (
         |    SELECT conv_id, turn_idx FROM transcripts
         |    GROUP BY 1, 2 HAVING count(*) > 1)
         |  UNION ALL
         |  SELECT 'ref(role->role_dim)', conv_id
         |    FROM transcripts
         |    WHERE role IS NOT NULL
         |      AND role NOT IN ('user','assistant','system','tool'))
         |SELECT "constraint", conv_id, count(*) AS n_violations
         |FROM v GROUP BY 1, 2""".stripMargin,

    "q48_mega_keys" ->
      s"""WITH $T,
         |c AS (SELECT conv_id, count(*) AS n FROM transcripts GROUP BY 1),
         |m AS (SELECT avg(n) AS mean_n FROM c)
         |SELECT conv_id, n, round(mean_n, 6) AS mean_n
         |FROM c, m WHERE n > mean_n * 1.2""".stripMargin,

    // closed-form 2-feature Mahalanobis twin: MLE moments, ridge
    // 1e-9*max(var) on the diagonal (exactly what Mahalanobis.invert
    // adds), 2x2 inverse, exact 95th-percentile threshold
    "q53_mahalanobis_outliers" ->
      """WITH f AS (
        |  SELECT event_id, value AS a, CAST(hour(ts) AS DOUBLE) AS b
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT count(*)::DOUBLE AS n, avg(a) AS ma, avg(b) AS mb,
        |    sum(a*a) AS saa, sum(a*b) AS sab, sum(b*b) AS sbb FROM f),
        |c AS (SELECT ma, mb,
        |    saa/n - ma*ma AS caa, sab/n - ma*mb AS cab, sbb/n - mb*mb AS cbb
        |  FROM m),
        |cr AS (SELECT ma, mb, cab, caa, cbb,
        |    1e-9 * greatest(caa, cbb) AS ridge FROM c),
        |inv AS (SELECT ma, mb,
        |    (cbb+ridge) / ((caa+ridge)*(cbb+ridge) - cab*cab) AS i11,
        |    -cab / ((caa+ridge)*(cbb+ridge) - cab*cab) AS i12,
        |    (caa+ridge) / ((caa+ridge)*(cbb+ridge) - cab*cab) AS i22
        |  FROM cr),
        |scored AS (SELECT event_id,
        |    (a-ma)*(a-ma)*i11 + 2*(a-ma)*(b-mb)*i12 + (b-mb)*(b-mb)*i22 AS d
        |  FROM f, inv),
        |thr AS (SELECT quantile_cont(d, 0.95) AS t FROM scored)
        |SELECT event_id, round(d, 2) AS dist_sq, -1 AS label
        |FROM scored, thr WHERE d > t""".stripMargin,

    // DBSCAN noise predicate: noise ⟺ not core ∧ no core neighbor within
    // eps (cluster ids need recursion, the noise/anomaly label does not)
    "q54_dbscan_noise" ->
      s"""WITH $T,
         |t AS (SELECT conv_id, turn_idx, value AS v FROM transcripts),
         |nc AS (SELECT a.conv_id, a.turn_idx, count(*) AS n
         |  FROM t a JOIN t b ON a.conv_id = b.conv_id
         |    AND abs(a.v - b.v) <= 3.005
         |  GROUP BY 1, 2),
         |core AS (SELECT conv_id, turn_idx, v FROM nc
         |  JOIN t USING (conv_id, turn_idx) WHERE n >= 4)
         |SELECT a.conv_id, a.turn_idx,
         |  (NOT EXISTS (SELECT 1 FROM core c
         |     WHERE c.conv_id = a.conv_id AND c.turn_idx = a.turn_idx))
         |  AND (NOT EXISTS (SELECT 1 FROM core c
         |     WHERE c.conv_id = a.conv_id AND abs(c.v - a.v) <= 3.005))
         |  AS is_noise
         |FROM t a""".stripMargin,

    // Exact Breunig LOF over the 1-D feature: k-distance (k-th smallest,
    // QUALIFY row_number = k) → tie-inclusive neighborhoods (d <= kdist)
    // → reachability lrd (count/sum of max(kdist_j, d), 0-sum ⇒ inf) →
    // LOF = avg(neighbor lrd, inf ⇒ 1e12)/lrd (inf lrd ⇒ 1.0). Distance
    // is sqrt(d*d), NOT abs(d), to match the kernel's FP bit-for-bit on
    // tie comparisons; turn_idx is unique per conv (row_number-derived)
    // so it doubles as the point id. Groups need n >= 3 like the kernel.
    "q56_lof_scores" ->
      s"""WITH $T,
         |pts AS (
         |  SELECT conv_id, turn_idx AS i, value AS v,
         |         count(*) OVER (PARTITION BY conv_id) AS n
         |  FROM transcripts WHERE value IS NOT NULL),
         |pp AS (
         |  SELECT a.conv_id, a.i, b.i AS j,
         |         sqrt((a.v - b.v) * (a.v - b.v)) AS d,
         |         least(20, a.n - 1) AS k
         |  FROM pts a JOIN pts b USING (conv_id)
         |  WHERE a.i <> b.i AND a.n >= 3),
         |kd AS (
         |  SELECT conv_id, i, d AS kdist
         |  FROM pp
         |  QUALIFY row_number() OVER (PARTITION BY conv_id, i ORDER BY d) = k),
         |nb AS (
         |  SELECT pp.conv_id, pp.i, pp.j, pp.d, kd.kdist
         |  FROM pp JOIN kd USING (conv_id, i)
         |  WHERE pp.d <= kd.kdist),
         |lrdv AS (
         |  SELECT nb.conv_id, nb.i,
         |         CASE WHEN sum(greatest(kj.kdist, nb.d)) <= 0
         |              THEN 'infinity'::DOUBLE
         |              ELSE count(*) / sum(greatest(kj.kdist, nb.d)) END AS lrd
         |  FROM nb JOIN kd kj ON kj.conv_id = nb.conv_id AND kj.i = nb.j
         |  GROUP BY 1, 2),
         |lofv AS (
         |  SELECT nb.conv_id, nb.i,
         |         CASE WHEN isinf(lp.lrd) THEN 1.0
         |              ELSE avg(CASE WHEN isinf(lo.lrd) THEN 1e12
         |                            ELSE lo.lrd END) / lp.lrd
         |         END AS lof
         |  FROM nb
         |  JOIN lrdv lp ON lp.conv_id = nb.conv_id AND lp.i = nb.i
         |  JOIN lrdv lo ON lo.conv_id = nb.conv_id AND lo.i = nb.j
         |  GROUP BY nb.conv_id, nb.i, lp.lrd)
         |SELECT conv_id, i AS turn_idx, round(lof, 4) AS lof
         |FROM lofv WHERE lof > 1.5""".stripMargin,

    // generated from the pinned forest so the literals are identical
    // binary64 on both sides (shortest-round-trip printing ↔ strtod)
    "q58_iforest_pinned_scoring" ->
      s"""SELECT event_id, round(${graft.ml.PinnedScoring.forestScoreSql(
            Seq("value", "CAST(hour(ts) AS DOUBLE)"))}, 4) AS score
         |FROM events WHERE value IS NOT NULL""".stripMargin,

    "q59_ocsvm_pinned_scoring" ->
      s"""SELECT event_id, round(${graft.ml.PinnedScoring.ocsvmDecisionSql(
            Seq("value", "CAST(hour(ts) AS DOUBLE)"))}, 4) + 0 AS decision
         |FROM events WHERE value IS NOT NULL""".stripMargin,

    // full IVF search-path twin: literal centroid lists (normalized doubles
    // inlined from the pinned matrix), left-to-right dot via
    // list_sum(list_transform(...)) — the q39-proven FP identity — then
    // cell assignment (rn=1) / probe (rn<=2), candidate join, cosine
    // re-rank. Same doubles ⇒ same ties ⇒ same cells in both engines.
    "q60_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT * FROM (VALUES ${Ivf.centroidsSqlValues(
             Ivf.pinnedCentroids(ivfCells, annDims))}) AS t(cid, c)),
         |asgn AS (SELECT vec_id, cid,
         |    list_sum(list_transform(range($annDims), i -> v[i+1] * c[i+1])) AS d
         |  FROM e, cent),
         |ord AS (SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
         |  FROM asgn),
         |ccell AS (SELECT vec_id, cid AS cell FROM ord WHERE rn = 1),
         |qcell AS (SELECT vec_id, cid AS cell FROM ord WHERE rn <= 2 AND vec_id < 10),
         |cand AS (SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id
         |  FROM qcell q JOIN ccell c USING (cell) WHERE c.vec_id != q.vec_id),
         |s AS (SELECT q_id, neighbor_id, list_cosine_similarity(qe.v, ce.v) AS cs
         |  FROM cand JOIN e qe ON qe.vec_id = q_id JOIN e ce ON ce.vec_id = neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, neighbor_id) AS rn FROM s)
         |SELECT q_id, neighbor_id, round(cs, 6) AS cos, CAST(rn AS INT) AS rank
         |FROM r WHERE rn <= 5""".stripMargin,

    // closed-form 2-feature PCA twin: MLE moments (sum/n, like the Scala
    // moment pass), principal angle atan2(2c01, c00−c11)/2, projections
    // (x−μ)·(cos θ, sin θ) / (x−μ)·(−sin θ, cos θ) in the same term order
    "q61_pca_projection" ->
      """WITH f AS (
        |  SELECT event_id, value AS a, CAST(hour(ts) AS DOUBLE) AS b
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT count(*)::DOUBLE AS n, sum(a) AS sa, sum(b) AS sb,
        |    sum(a*a) AS saa, sum(a*b) AS sab, sum(b*b) AS sbb FROM f),
        |c AS (SELECT sa/n AS ma, sb/n AS mb,
        |    saa/n - (sa/n)*(sa/n) AS caa,
        |    sab/n - (sa/n)*(sb/n) AS cab,
        |    sbb/n - (sb/n)*(sb/n) AS cbb FROM m),
        |e AS (SELECT ma, mb, atan2(2.0 * cab, caa - cbb) / 2.0 AS th FROM c)
        |SELECT event_id,
        |  round((a - ma) * cos(th) + (b - mb) * sin(th), 2) + 0 AS pc1,
        |  round((a - ma) * (-sin(th)) + (b - mb) * cos(th), 2) + 0 AS pc2
        |FROM f, e""".stripMargin,

    // q35's exact-Jaccard pair twin + recursive-CTE transitive closure:
    // component_id = min reachable doc_id (reach is the full reachability
    // set per doc; UNION dedup terminates it on cyclic graphs)
    "q62_dup_components" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, $normSql AS nt FROM documents WHERE doc_id < 200),
         |tok AS (SELECT DISTINCT doc_id, unnest(string_split(nt, ' ')) AS tk
         |  FROM d WHERE nt <> ''),
         |sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::DOUBLE AS inter
         |  FROM tok a JOIN tok b USING (tk) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (SELECT a_id, b_id
         |  FROM pairs JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
         |  WHERE inter / (sa.sz + sb.sz - inter) >= 0.9),
         |edges AS (SELECT a_id AS a, b_id AS b FROM good
         |  UNION ALL SELECT b_id, a_id FROM good),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM d
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b),
         |comp AS (SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY 1),
         |szc AS (SELECT component_id, count(*) AS component_size FROM comp GROUP BY 1)
         |SELECT doc_id, component_id, component_size
         |FROM comp JOIN szc USING (component_id)""".stripMargin,

    // the exact census the two-pass sketch query must reproduce; the
    // threshold n/256.0 is the same double on both sides (n * 2^-8)
    "q63_heavy_hitters" ->
      s"""WITH $T
         |SELECT conv_id, count(*) AS cnt FROM transcripts GROUP BY 1
         |HAVING count(*) > (SELECT count(*) FROM transcripts) / 256.0""".stripMargin,

    // q40's exact >=0.7 pair twin, transitively closed over all docs
    "q64_dup_groups" ->
      s"""WITH RECURSIVE ${shingleCensusSql()},
         |edges AS (SELECT a_id AS a, b_id AS b FROM good
         |  UNION ALL SELECT b_id, a_id FROM good),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM d
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b),
         |comp AS (SELECT a AS doc_id, min(b) AS group_id FROM reach GROUP BY 1),
         |szc AS (SELECT group_id, count(*) AS group_size FROM comp GROUP BY 1)
         |SELECT doc_id, group_id, group_size
         |FROM comp JOIN szc USING (group_id)""".stripMargin,

    // the exact census MaxKeyShare's sketch pass is guaranteed to equal,
    // as verdict rows (per offending key + one global)
    "q65_key_share_verdicts" ->
      s"""WITH $T,
         |tot AS (SELECT count(*) AS n FROM transcripts),
         |hot AS (SELECT conv_id, count(*) AS cnt FROM transcripts GROUP BY 1
         |  HAVING count(*) > (SELECT n FROM tot) / 512.0)
         |SELECT conv_id AS partition_key,
         |  'max_key_share(conv_id)' AS "constraint", false AS pass,
         |  cnt AS rows, cnt AS violations,
         |  round(cnt / (SELECT n::DOUBLE FROM tot), 9) AS violation_rate
         |FROM hot
         |UNION ALL
         |SELECT '(global)', 'max_key_share(conv_id)',
         |  (SELECT count(*) FROM hot) = 0,
         |  (SELECT n FROM tot), (SELECT count(*) FROM hot),
         |  round((SELECT count(*) FROM hot) /
         |        greatest(1.0, (SELECT n::DOUBLE FROM tot)), 9)""".stripMargin,

    // gap sessionization twin: same lag/flag/running-sum chain; whole-
    // second diffs (date_diff('second') == the unix_timestamp difference)
    "q66_sessions" ->
      s"""WITH $T,
         |lagged AS (
         |  SELECT conv_id, turn_idx, ts,
         |    lag(ts) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS prev
         |  FROM transcripts),
         |flags AS (
         |  SELECT conv_id, turn_idx, ts,
         |    -- epoch_us: microsecond-exact, mirroring Sessions.assign
         |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800 * 1000000
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM lagged),
         |sess AS (
         |  SELECT conv_id, ts,
         |    CAST(sum(is_new) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
         |      ROWS UNBOUNDED PRECEDING) - 1 AS INT) AS session_idx
         |  FROM flags)
         |SELECT conv_id, session_idx, count(*) AS n_turns,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  date_diff('second', min(ts), max(ts)) AS span_seconds
         |FROM sess GROUP BY 1, 2""".stripMargin,

    // as-of twin: DuckDB's NATIVE ASOF LEFT JOIN — an independent
    // implementation of backward-inclusive point-in-time semantics against
    // which the interval-bucketed Spark composition is hash-checked
    "q67_asof_versions" ->
      s"""WITH $T,
         |days AS (SELECT DISTINCT role, date_trunc('day', ts) AS valid_from
         |  FROM transcripts),
         |snaps AS (
         |  SELECT role, valid_from,
         |    CAST(row_number() OVER (PARTITION BY role ORDER BY valid_from) AS INT) AS version
         |  FROM days
         |  WHERE date_diff('day', DATE '2000-01-01', CAST(valid_from AS DATE)) % 3 = 0)
         |SELECT t.conv_id, t.turn_idx, t.role, s.version
         |FROM transcripts t ASOF LEFT JOIN snaps s
         |  ON t.role = s.role AND t.ts >= s.valid_from""".stripMargin,

    // shuffle-tier as-of: identical semantics, same native-ASOF oracle
    "q69_asof_shuffled" ->
      s"""WITH $T,
         |days AS (SELECT DISTINCT role, date_trunc('day', ts) AS valid_from
         |  FROM transcripts),
         |snaps AS (
         |  SELECT role, valid_from,
         |    CAST(row_number() OVER (PARTITION BY role ORDER BY valid_from) AS INT) AS version
         |  FROM days
         |  WHERE date_diff('day', DATE '2000-01-01', CAST(valid_from AS DATE)) % 3 = 0)
         |SELECT t.conv_id, t.turn_idx, t.role, s.version
         |FROM transcripts t ASOF LEFT JOIN snaps s
         |  ON t.role = s.role AND t.ts >= s.valid_from""".stripMargin,

    // stratified-sample twin: the EXACT same md5 thresholds (interpolated
    // from the one Scala constant), so the selected row set hash-matches
    "q68_stratified_sample" ->
      s"""WITH $T
         |SELECT conv_id, turn_idx, role FROM transcripts
         |WHERE CASE role
         |  WHEN 'user' THEN substr(md5('graft|' || conv_id), 1, 12) < '${graft.sample.Sampling.hexThreshold(0.5)}'
         |  WHEN 'assistant' THEN substr(md5('graft|' || conv_id), 1, 12) < '${graft.sample.Sampling.hexThreshold(0.25)}'
         |  WHEN 'tool' THEN substr(md5('graft|' || conv_id), 1, 12) < '${graft.sample.Sampling.hexThreshold(0.1)}'
         |  WHEN 'invalid_role' THEN FALSE
         |  ELSE conv_id IS NOT NULL END""".stripMargin,

    // session-gap constraint twin: the same lag/threshold chain as q66's
    // boundary flags, microsecond-exact
    "q70_session_gap_violations" ->
      s"""WITH $T,
         |lagged AS (
         |  SELECT conv_id, turn_idx, ts,
         |    lag(ts) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS prev
         |  FROM transcripts)
         |SELECT conv_id, turn_idx,
         |  round((epoch_us(ts) - epoch_us(prev)) / 1000000.0, 6) AS gap_seconds
         |FROM lagged
         |WHERE epoch_us(ts) - epoch_us(prev) > 1800 * 1000000""".stripMargin,

    // as-of-integrity twin: unresolved = native ASOF LEFT JOIN misses
    // (no snapshot at or before the turn's ts); null roles skipped
    // (nullOk); each role's first snapshot dropped like the Spark side
    "q71_asof_integrity_violations" ->
      s"""WITH $T,
         |days AS (SELECT DISTINCT role, date_trunc('day', ts) AS valid_from
         |  FROM transcripts),
         |snaps AS (
         |  SELECT role, valid_from,
         |    CAST(row_number() OVER (PARTITION BY role ORDER BY valid_from) AS INT) AS version
         |  FROM days
         |  WHERE date_diff('day', DATE '2000-01-01', CAST(valid_from AS DATE)) % 3 = 0),
         |snaps2 AS (SELECT * FROM snaps WHERE version >= 2),
         |resolved AS (
         |  SELECT t.conv_id, t.turn_idx, t.role, s.version
         |  FROM (SELECT * FROM transcripts WHERE role IS NOT NULL) t
         |  ASOF LEFT JOIN snaps2 s
         |    ON t.role = s.role AND t.ts >= s.valid_from)
         |SELECT conv_id, turn_idx, role FROM resolved WHERE version IS NULL""".stripMargin,

    // schema-conformance twin: DuckDB's own DESCRIBE of the same parquet,
    // type names mapped to Spark simpleStrings, full-outer-joined against
    // the identical declared list
    "q72_schema_check" ->
      """WITH actual AS (
        |  SELECT column_name AS col_name,
        |    CASE column_type
        |      WHEN 'VARCHAR' THEN 'string' WHEN 'BIGINT' THEN 'bigint'
        |      WHEN 'INTEGER' THEN 'int' WHEN 'DOUBLE' THEN 'double'
        |      WHEN 'TIMESTAMP' THEN 'timestamp_ntz' ELSE lower(column_type) END AS typ
        |  FROM (DESCRIBE events)),
        |declared(col_name, typ) AS (VALUES
        |  ('event_id','bigint'),('ts','timestamp_ntz'),('user_id','int'),
        |  ('event_type','string'),('amount','double'))
        |SELECT coalesce(d.col_name, a.col_name) AS col_name,
        |  CASE WHEN a.col_name IS NULL THEN '(missing)' ELSE a.typ END AS observed,
        |  CASE WHEN d.col_name IS NULL THEN '(not declared)' ELSE d.typ END AS bound
        |FROM declared d FULL OUTER JOIN actual a ON d.col_name = a.col_name
        |WHERE a.col_name IS NULL OR d.col_name IS NULL OR d.typ <> a.typ""".stripMargin,

    // densified-OPH twin: identical portable shingle hash (60-bit md5
    // prefix), identical h-mod-64 bucketing and per-bucket mins, and the
    // rotation densification re-derived relationally (nearest non-empty
    // bucket at forward cyclic distance, row_number over the distance) —
    // the EXACT signature arrays must agree element-for-element
    "q73_minhash_oph_signatures" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS tk FROM documents),
         |sh AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
         |    i -> concat_ws(' ', tk[i+1], tk[i+2], tk[i+3]))) AS sh
         |  FROM d WHERE len(tk) >= 3),
         |h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM sh),
         |mins AS (SELECT doc_id, h % 64 AS b, min(h) AS mh FROM h GROUP BY 1, 2),
         |pos AS (SELECT DISTINCT doc_id FROM mins),
         |cand AS (
         |  SELECT p.doc_id, pb.b AS pos, m.mh,
         |    row_number() OVER (PARTITION BY p.doc_id, pb.b
         |      ORDER BY ((m.b - pb.b) % 64 + 64) % 64) AS rn
         |  FROM pos p
         |  CROSS JOIN (SELECT unnest(range(64)) AS b) pb
         |  JOIN mins m ON m.doc_id = p.doc_id),
         |filled AS (SELECT doc_id, pos, mh FROM cand WHERE rn = 1)
         |SELECT doc_id, list(mh ORDER BY pos) AS signature
         |FROM filled GROUP BY doc_id""".stripMargin,

    // next-fit packing twin: the greedy recurrence (pack_idx, acc) replayed
    // exactly as a recursive CTE stepping through each shard's documents
    // in doc_id order
    "q74_pack_assign" ->
      """WITH RECURSIVE tok AS (SELECT CAST(doc_id % 8 AS INT) AS shard, doc_id,
        |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS tok,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |p AS (
        |  SELECT shard, doc_id, rn, tok, 0 AS pack_idx, tok AS acc
        |  FROM tok WHERE rn = 1
        |  UNION ALL
        |  SELECT t.shard, t.doc_id, t.rn, t.tok,
        |    CASE WHEN p.acc > 0 AND p.acc + t.tok > 256
        |         THEN p.pack_idx + 1 ELSE p.pack_idx END,
        |    CASE WHEN p.acc > 0 AND p.acc + t.tok > 256
        |         THEN t.tok ELSE p.acc + t.tok END
        |  FROM tok t JOIN p ON t.shard = p.shard AND t.rn = p.rn + 1)
        |SELECT shard, doc_id, pack_idx FROM p""".stripMargin,

    "q75_pack_fill" ->
      """WITH RECURSIVE tok AS (SELECT CAST(doc_id % 8 AS INT) AS shard, doc_id,
        |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS tok,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |p AS (
        |  SELECT shard, doc_id, rn, tok, 0 AS pack_idx, tok AS acc
        |  FROM tok WHERE rn = 1
        |  UNION ALL
        |  SELECT t.shard, t.doc_id, t.rn, t.tok,
        |    CASE WHEN p.acc > 0 AND p.acc + t.tok > 256
        |         THEN p.pack_idx + 1 ELSE p.pack_idx END,
        |    CASE WHEN p.acc > 0 AND p.acc + t.tok > 256
        |         THEN t.tok ELSE p.acc + t.tok END
        |  FROM tok t JOIN p ON t.shard = p.shard AND t.rn = p.rn + 1)
        |SELECT shard, pack_idx, count(*) AS n_rows,
        |  sum(tok) AS pack_tokens,
        |  round(sum(tok) / 256.0, 6) AS fill_ratio
        |FROM p GROUP BY 1, 2""".stripMargin,

    // sequence-grammar twin: the same lag/row_number chain; the pair
    // membership spelled out as the equivalent boolean
    "q76_transition_violations" ->
      s"""WITH $T,
         |l AS (
         |  SELECT conv_id, turn_idx, role,
         |    lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS prev,
         |    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS rn
         |  FROM transcripts)
         |SELECT conv_id, turn_idx,
         |  CASE WHEN rn = 1 THEN role ELSE prev || '->' || role END AS transition
         |FROM l
         |WHERE CASE WHEN rn = 1 THEN role IS NOT NULL AND role NOT IN ('user','system')
         |  ELSE prev IS NOT NULL AND role IS NOT NULL AND NOT (
         |    (prev = 'user' AND role = 'assistant') OR
         |    (prev = 'assistant' AND role = 'user') OR
         |    (prev = 'assistant' AND role = 'tool') OR
         |    (prev = 'tool' AND role = 'assistant')) END""".stripMargin,

    // monotonic twin: rows where the measure runs backwards in turn order
    "q77_monotonic_violations" ->
      s"""WITH $T,
         |l AS (
         |  SELECT conv_id, turn_idx, value,
         |    lag(value) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS prev
         |  FROM transcripts)
         |SELECT conv_id, turn_idx, value FROM l
         |WHERE prev IS NOT NULL AND value IS NOT NULL AND value < prev""".stripMargin,

    // stutter twin: DuckDB recomputes the md5 digests independently and
    // compares consecutive ones, exactly as the engine's map-side digests
    "q78_repeat_violations" ->
      s"""WITH $T,
         |l AS (
         |  SELECT conv_id, turn_idx, md5(text) AS h,
         |    lag(md5(text)) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS ph
         |  FROM transcripts)
         |SELECT conv_id, turn_idx, h AS text_md5 FROM l
         |WHERE ph IS NOT NULL AND h IS NOT NULL AND h = ph""".stripMargin,

    // functional-dependency twin: offending determinant groups with the
    // distinct-dependent census
    "q79_fd_violations" ->
      s"""WITH $T
         |SELECT conv_id,
         |  CAST(count(DISTINCT CAST(ts AS DATE)) AS INT) AS n_days
         |FROM transcripts
         |WHERE conv_id IS NOT NULL
         |GROUP BY conv_id
         |HAVING count(DISTINCT CAST(ts AS DATE)) > 1""".stripMargin,

    // key-census RI twin: the violation SET is tier-independent — the same
    // plain anti-join as q08
    "q80_ref_census_violations" ->
      s"""WITH $T
         |SELECT conv_id, turn_idx, role FROM transcripts
         |WHERE role NOT IN ('user','assistant','system','tool')""".stripMargin,

    // JSON-extraction twin via DuckDB's own JSON reader — an independent
    // parser agreeing with Spark's from_json
    "q81_json_field_stats" ->
      s"""WITH $T
         |SELECT role,
         |  count(CAST(json_extract_string(text, '$$.k') AS INT)) AS n_k,
         |  sum(CAST(json_extract_string(text, '$$.k') AS INT)) AS sum_k,
         |  round(avg(CAST(json_extract_string(text, '$$.k') AS INT)), 6) AS avg_k
         |FROM transcripts WHERE text IS NOT NULL
         |GROUP BY role""".stripMargin,

    // index-density twin: the same hole-punched view, the same
    // min/max/count-distinct census per conversation, the same
    // dense-from-0 predicate
    "q82_contiguous_violations" ->
      s"""WITH $T,
         |holed AS (
         |  SELECT conv_id, turn_idx FROM transcripts
         |  WHERE NOT (turn_idx = 2 AND CAST(substr(conv_id, 6) AS INT) % 7 = 0)
         |    AND NOT (turn_idx = 0 AND CAST(substr(conv_id, 6) AS INT) % 11 = 3)),
         |c AS (
         |  SELECT conv_id, min(turn_idx) AS mn, max(turn_idx) AS mx,
         |    count(DISTINCT turn_idx) AS nd
         |  FROM holed WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
         |  GROUP BY conv_id)
         |SELECT conv_id,
         |  'min=' || mn || ',max=' || mx || ',distinct=' || nd AS observed
         |FROM c WHERE mn <> 0 OR mx <> nd - 1""".stripMargin,

    // snapshot-diff twin: DuckDB re-derives the change set with its own
    // full-outer join comparing the RAW columns (IS DISTINCT FROM) — no
    // digests involved, so a hash-set match independently proves the
    // engine's map-side md5 classification correct
    "q83_snapshot_diff" ->
      s"""WITH $T,
         |base AS (
         |  SELECT conv_id, turn_idx, role, text, tool,
         |    CAST(substr(conv_id, 6) AS INT) AS d
         |  FROM transcripts WHERE conv_id IS NOT NULL),
         |oldv AS (SELECT * FROM base WHERE NOT (d % 19 = 5 AND turn_idx = 0)),
         |newv AS (
         |  SELECT conv_id, turn_idx,
         |    CASE WHEN d % 17 = 2 AND turn_idx = 0 THEN 'assistant' ELSE role END AS role,
         |    text, tool
         |  FROM base WHERE NOT (d % 13 = 0 AND turn_idx = 1))
         |SELECT * FROM (
         |  SELECT coalesce(o.conv_id, n.conv_id) AS conv_id,
         |    coalesce(o.turn_idx, n.turn_idx) AS turn_idx,
         |    CASE WHEN n.conv_id IS NULL THEN 'removed'
         |         WHEN o.conv_id IS NULL THEN 'added'
         |         WHEN o.role IS DISTINCT FROM n.role
         |           OR o.text IS DISTINCT FROM n.text
         |           OR o.tool IS DISTINCT FROM n.tool THEN 'changed' END AS change
         |  FROM oldv o FULL OUTER JOIN newv n
         |    ON o.conv_id = n.conv_id AND o.turn_idx = n.turn_idx)
         |WHERE change IS NOT NULL""".stripMargin,

    // snapshot-drift twin: the same per-role quantile edges (baseline
    // side), the same bin census and epsilon-clamped PSI sum — q15's
    // proven chain, grouped by role across two derived snapshot versions
    "q84_snapshot_value_drift" ->
      s"""WITH $T,
         |base AS (SELECT role, value, CAST(substr(conv_id, 6) AS INT) AS d
         |  FROM transcripts WHERE conv_id IS NOT NULL AND value IS NOT NULL),
         |sided AS (
         |  SELECT role, value, 'baseline' AS side FROM base
         |  UNION ALL
         |  SELECT role, CASE WHEN d % 3 = 0 THEN value * 1.25 + 0.5 ELSE value END,
         |    'current' FROM base),
         |e AS (SELECT role,
         |    quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
         |  FROM sided WHERE side = 'baseline' GROUP BY role),
         |binned AS (SELECT s.role, s.side,
         |    (s.value > qs[1])::INT + (s.value > qs[2])::INT + (s.value > qs[3])::INT +
         |    (s.value > qs[4])::INT + (s.value > qs[5])::INT + (s.value > qs[6])::INT +
         |    (s.value > qs[7])::INT + (s.value > qs[8])::INT + (s.value > qs[9])::INT AS bin
         |  FROM sided s JOIN e ON s.role = e.role),
         |counts AS (SELECT role, bin,
         |    sum(CASE WHEN side = 'baseline' THEN 1 ELSE 0 END)::DOUBLE AS nb,
         |    sum(CASE WHEN side = 'current' THEN 1 ELSE 0 END)::DOUBLE AS nc
         |  FROM binned GROUP BY role, bin),
         |tot AS (SELECT role, sum(nb) AS tb, sum(nc) AS tc FROM counts GROUP BY role)
         |SELECT c.role, round(sum((greatest(nb/tb, 1e-4) - greatest(nc/tc, 1e-4)) *
         |  ln(greatest(nb/tb, 1e-4) / greatest(nc/tc, 1e-4))), 6) AS psi
         |FROM counts c JOIN tot t ON c.role = t.role
         |GROUP BY c.role""".stripMargin,

    // declarative-drift twin: the q15-proven single-key PSI chain over the
    // same blessed-vs-shifted snapshot pair; the engine's violation row
    // must observe exactly this PSI
    "q85_distribution_drift_verdicts" ->
      s"""WITH $T,
         |base AS (SELECT value, CAST(substr(conv_id, 6) AS INT) AS d
         |  FROM transcripts WHERE conv_id IS NOT NULL AND value IS NOT NULL),
         |sided AS (
         |  SELECT value, 'baseline' AS side FROM base
         |  UNION ALL
         |  SELECT CASE WHEN d % 3 = 0 THEN value * 1.25 + 0.5 ELSE value END,
         |    'current' FROM base),
         |e AS (SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
         |  FROM sided WHERE side = 'baseline'),
         |binned AS (SELECT side,
         |    (value > qs[1])::INT + (value > qs[2])::INT + (value > qs[3])::INT +
         |    (value > qs[4])::INT + (value > qs[5])::INT + (value > qs[6])::INT +
         |    (value > qs[7])::INT + (value > qs[8])::INT + (value > qs[9])::INT AS bin
         |  FROM sided, e),
         |counts AS (SELECT bin,
         |    sum(CASE WHEN side = 'baseline' THEN 1 ELSE 0 END)::DOUBLE AS nb,
         |    sum(CASE WHEN side = 'current' THEN 1 ELSE 0 END)::DOUBLE AS nc
         |  FROM binned GROUP BY bin),
         |tot AS (SELECT sum(nb) AS tb, sum(nc) AS tc FROM counts)
         |SELECT 'value' AS "column",
         |  round(sum((greatest(nb/tb, 1e-4) - greatest(nc/tc, 1e-4)) *
         |    ln(greatest(nb/tb, 1e-4) / greatest(nc/tc, 1e-4))), 6) AS psi
         |FROM counts, tot""".stripMargin,

    // dup-rate twin: DuckDB counts distinct NORMALIZED STRINGS while the
    // engine counts distinct md5 fingerprints — agreement proves the
    // digest reduction loses nothing (modulo md5 collisions)
    "q86_max_dup_rate_verdicts" ->
      s"""WITH $T,
         |nn AS (SELECT $normSql AS norm FROM transcripts
         |  WHERE text IS NOT NULL)
         |SELECT 'max_dup_rate(text)' AS "constraint",
         |  (count(*) - count(DISTINCT norm)) = 0 AS pass,
         |  round((count(*) - count(DISTINCT norm)) / count(*)::DOUBLE, 6)
         |    AS dup_rate
         |FROM nn""".stripMargin,

    // compliance twin: DuckDB re-evaluates the SAME SQL predicate per row
    // — a failing row is one where the predicate is false OR null (fails
    // closed), and `observed` is the predicate's raw truth value
    "q87_compliance_violations" ->
      s"""WITH $T
         |SELECT conv_id, turn_idx,
         |  CAST(value BETWEEN -2.0 AND 2.0 OR role = 'system' AS VARCHAR)
         |    AS observed
         |FROM transcripts
         |WHERE NOT coalesce(value BETWEEN -2.0 AND 2.0 OR role = 'system',
         |  FALSE)
         |ORDER BY conv_id, turn_idx""".stripMargin,

    // correlation twin: DuckDB's native sample Pearson over the same
    // (value, turn_idx) pairs — null pairs skipped on both engines
    "q88_correlation_bound" ->
      s"""WITH $T
         |SELECT 'value,turn_idx' AS "column",
         |  round(corr(value, turn_idx), 6) AS corr
         |FROM transcripts""".stripMargin,

    // entropy twin: −Σ p·ln p from the role frequency census (the engine
    // computes the algebraically-equal ln N − Σ n·ln n / N)
    "q89_entropy_census" ->
      s"""WITH $T,
         |freq AS (SELECT count(*)::DOUBLE AS n FROM transcripts
         |  WHERE role IS NOT NULL GROUP BY role)
         |SELECT 'role' AS "column",
         |  round(-sum(p * ln(p)), 6) AS entropy
         |FROM (SELECT n / (sum(n) OVER ()) AS p FROM freq)""".stripMargin,

    // mutual-information twin: Σ p(x,y)·ln(p(x,y)/(p(x)·p(y))) from the
    // (role, turn_idx % 4) pair census — marginals via window sums, the
    // same O(distinct pairs) shape the engine uses
    "q90_mutual_information" ->
      s"""WITH $T,
         |pairs AS (SELECT role AS x, turn_idx % 4 AS y,
         |    count(*)::DOUBLE AS n
         |  FROM transcripts WHERE role IS NOT NULL AND turn_idx IS NOT NULL
         |  GROUP BY 1, 2),
         |m AS (SELECT n,
         |    sum(n) OVER (PARTITION BY x) AS nx,
         |    sum(n) OVER (PARTITION BY y) AS ny,
         |    sum(n) OVER () AS tot
         |  FROM pairs)
         |SELECT 'role,phase' AS "column",
         |  round(greatest(sum(n / tot * ln(n * tot / (nx * ny))), 0), 6) AS mi
         |FROM m""".stripMargin,

    // suggestion twin: re-derive each rule from the per-column census —
    // not_null when rate <= 0.5 (bound = observed rate rounded UP to 4dp,
    // same op order as Suggestions: rate*10000 -> ceil -> /10000);
    // in_set for repeating small-set strings; value_bounds for numerics;
    // unique_key for fully-unique non-null columns
    "q91_suggested_constraints" ->
      s"""WITH $T,
         |$q91StatsSql,
         |sugg AS (
         |  SELECT c, 'not_null' AS suggestion, NULL::DOUBLE AS lo,
         |         ceil((nulls::DOUBLE / n) * 10000) / 10000 AS hi,
         |         NULL::VARCHAR AS details
         |  FROM stats WHERE n > 0 AND nulls::DOUBLE / n <= 0.5
         |  UNION ALL
         |  SELECT c, 'in_set', NULL, NULL, vals FROM stats
         |  WHERE n > 0 AND is_str AND dist >= 2 AND dist <= 20
         |    AND dist < n - nulls
         |  UNION ALL
         |  $q91ShapeSql
         |  UNION ALL
         |  SELECT c, 'value_bounds', mn, mx, NULL FROM stats
         |  WHERE n > 0 AND is_num AND mn IS NOT NULL
         |  UNION ALL
         |  SELECT c, 'unique_key', NULL, NULL, NULL FROM stats
         |  WHERE nulls = 0 AND dist = n AND n > 1
         |  UNION ALL
         |  SELECT c, 'no_pii', NULL, NULL,
         |         '${graft.text.Pii.allKinds.mkString(",")}' FROM stats
         |  WHERE n > 0 AND is_str AND n - nulls > 0 AND piihits = 0
         |  UNION ALL
         |  SELECT c, 'length_bounds', lmin::DOUBLE, lmax::DOUBLE, NULL
         |  FROM stats WHERE n > 0 AND is_str AND n - nulls > 0)
         |SELECT c AS "column", suggestion, round(lo, 6) AS lo,
         |       round(hi, 6) AS hi, details
         |FROM sugg ORDER BY "column", suggestion""".stripMargin,

    // metric-history twin: the same day-bucket pseudo-runs, the same
    // lag-window rate-of-change rule (>10% vs previous run; a zero
    // baseline flags any nonzero value and keeps rel_change null)
    "q92_metric_rate_anomalies" ->
      s"""WITH $T,
         |daily AS (
         |  SELECT date_trunc('day', ts) AS run_ts, count(*)::DOUBLE AS rows_v,
         |         avg(value) AS mean_value
         |  FROM transcripts GROUP BY 1),
         |hist AS (
         |  SELECT strftime(run_ts, '%Y-%m-%d') AS run_id, run_ts,
         |         'rows' AS metric, rows_v AS value FROM daily
         |  UNION ALL
         |  SELECT strftime(run_ts, '%Y-%m-%d'), run_ts, 'mean_value',
         |         mean_value FROM daily),
         |lagged AS (
         |  SELECT run_id, metric, value,
         |    lag(value) OVER (PARTITION BY metric ORDER BY run_ts, run_id)
         |      AS prev
         |  FROM hist)
         |SELECT run_id, metric, round(value, 6) AS value,
         |  round(prev, 6) AS prev,
         |  round(CASE WHEN abs(prev) > 0
         |             THEN abs(value - prev) / abs(prev) END, 6) AS rel_change
         |FROM lagged
         |WHERE prev IS NOT NULL AND
         |  ((abs(prev) > 0 AND abs(value - prev) / abs(prev) > 0.10)
         |   OR (abs(prev) = 0 AND value <> 0))
         |ORDER BY run_id, metric""".stripMargin,

    // parsable_as twin: the same derived column, the same TRY_CAST rule —
    // non-null values DuckDB can't convert either are the violations
    "q93_parsable_violations" ->
      s"""WITH $T,
         |derived AS (
         |  SELECT conv_id, turn_idx,
         |    CASE WHEN role = 'tool' THEN tool
         |         ELSE json_extract_string(text, '$$.k') END AS maybe_num
         |  FROM transcripts)
         |SELECT conv_id, turn_idx, maybe_num AS observed
         |FROM derived
         |WHERE maybe_num IS NOT NULL AND TRY_CAST(maybe_num AS INT) IS NULL
         |ORDER BY conv_id, turn_idx""".stripMargin,

    // ratio twins: uniqueness = singleton rows / complete rows of the text
    // census; distinctness = groups / complete rows of the role census
    "q94_uniqueness_distinctness" ->
      s"""WITH $T,
         |tk AS (SELECT text, count(*) AS n FROM transcripts
         |       WHERE text IS NOT NULL GROUP BY 1),
         |rk AS (SELECT role, count(*) AS n FROM transcripts
         |       WHERE role IS NOT NULL GROUP BY 1),
         |u AS (SELECT 'uniqueness(text)' AS "constraint",
         |        round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE
         |          / sum(n), 6) AS ratio FROM tk),
         |d AS (SELECT 'distinctness(role)' AS "constraint",
         |        round(count(*)::DOUBLE / sum(n), 6) AS ratio FROM rk)
         |SELECT * FROM u UNION ALL SELECT * FROM d
         |ORDER BY "constraint"""".stripMargin,

    // KS drift twin: the q85 sided fixture + the q16 tie-correct
    // RANGE-frame CDF pattern
    "q95_distribution_drift_ks" ->
      s"""WITH $T,
         |base AS (SELECT value, CAST(substr(conv_id, 6) AS INT) AS d
         |  FROM transcripts WHERE conv_id IS NOT NULL AND value IS NOT NULL),
         |sided AS (
         |  SELECT value, 'baseline' AS side FROM base
         |  UNION ALL
         |  SELECT CASE WHEN d % 3 = 0 THEN value * 1.25 + 0.5 ELSE value END,
         |    'current' FROM base),
         |c AS (SELECT
         |    sum(CASE WHEN side = 'baseline' THEN 1 ELSE 0 END) OVER w AS cb,
         |    sum(CASE WHEN side = 'current' THEN 1 ELSE 0 END) OVER w AS cc
         |  FROM sided
         |  WINDOW w AS (ORDER BY value RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |t AS (SELECT sum(CASE WHEN side = 'baseline' THEN 1 ELSE 0 END)::DOUBLE AS tb,
         |    sum(CASE WHEN side = 'current' THEN 1 ELSE 0 END)::DOUBLE AS tc FROM sided)
         |SELECT 'value' AS "column", round(max(abs(cb / tb - cc / tc)), 6) AS ks
         |FROM c, t""".stripMargin,

    // trailing-z twin: the q92 pseudo-history, stddev_samp/avg over the
    // PREVIOUS 5 runs (ROWS frame excluding the current row), flag |z| > 2
    // with a full window and a positive baseline stddev
    "q96_metric_trailing_z" ->
      s"""WITH $T,
         |daily AS (
         |  SELECT date_trunc('day', ts) AS run_ts, count(*)::DOUBLE AS rows_v,
         |         avg(value) AS mean_value
         |  FROM transcripts GROUP BY 1),
         |hist AS (
         |  SELECT strftime(run_ts, '%Y-%m-%d') AS run_id, run_ts,
         |         'rows' AS metric, rows_v AS value FROM daily
         |  UNION ALL
         |  SELECT strftime(run_ts, '%Y-%m-%d'), run_ts, 'mean_value',
         |         mean_value FROM daily),
         |w AS (
         |  SELECT run_id, metric, value,
         |    count(value) OVER tw AS n,
         |    avg(value) OVER tw AS mu,
         |    stddev_samp(value) OVER tw AS sd
         |  FROM hist
         |  WINDOW tw AS (PARTITION BY metric ORDER BY run_ts, run_id
         |                ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING))
         |SELECT run_id, metric, round(value, 6) AS value,
         |  round(mu, 6) AS baseline_mean,
         |  round((value - mu) / sd, 6) AS z
         |FROM w
         |WHERE n >= 5 AND sd > 0 AND abs((value - mu) / sd) > 2
         |ORDER BY run_id, metric""".stripMargin,

    // no_pii twin: the same derived pii_txt, the IDENTICAL pattern strings
    // (interpolated from graft.text.Pii.patterns — one source of truth for
    // both engines; the patterns avoid lookaround so Java regex and RE2
    // read them identically), and the Luhn fold replayed as a DuckDB list
    // comprehension over every 13-19-digit candidate
    "q97_pii_violations" -> {
      val p = graft.text.Pii.patterns.toMap
      s"""WITH $T,
         |derived AS (
         |  SELECT conv_id, turn_idx,
         |    CASE turn_idx % 11
         |      WHEN 0 THEN 'contact ' || substr(conv_id, 6) || '@example.com today'
         |      WHEN 1 THEN printf('call 415-555-%04d now', (turn_idx * 7) % 10000)
         |      WHEN 2 THEN 'ssn 078-05-1120 retained'
         |      WHEN 3 THEN 'card 4111111111111111 charged'
         |      WHEN 4 THEN 'order 4111111111111112 shipped'
         |      WHEN 5 THEN 'host 10.0.' || (turn_idx % 256) || '.7 up'
         |      ELSE text END AS pii_txt
         |  FROM transcripts),
         |flagged AS (
         |  SELECT conv_id, turn_idx,
         |    concat_ws(',',
         |      CASE WHEN regexp_matches(pii_txt, '${p("email")}') THEN 'email' END,
         |      CASE WHEN regexp_matches(pii_txt, '${p("phone")}') THEN 'phone' END,
         |      CASE WHEN regexp_matches(pii_txt, '${p("ssn")}') THEN 'ssn' END,
         |      CASE WHEN regexp_matches(pii_txt, '${p("ipv4")}') THEN 'ipv4' END,
         |      CASE WHEN len(list_filter(
         |          regexp_extract_all(pii_txt, '(${p("card")})', 1),
         |          c -> list_sum(list_transform(range(1, length(c) + 1), i ->
         |            CASE WHEN i % 2 = 0 THEN
         |              CASE WHEN 2 * (ascii(substr(reverse(c), i, 1)) - 48) > 9
         |                   THEN 2 * (ascii(substr(reverse(c), i, 1)) - 48) - 9
         |                   ELSE 2 * (ascii(substr(reverse(c), i, 1)) - 48) END
         |            ELSE ascii(substr(reverse(c), i, 1)) - 48 END)) % 10 = 0))
         |        > 0 THEN 'card' END) AS kinds
         |  FROM derived
         |  WHERE pii_txt IS NOT NULL)
         |SELECT conv_id, turn_idx, kinds FROM flagged WHERE kinds <> ''
         |ORDER BY conv_id, turn_idx""".stripMargin
    },

    // freshness twin: the same wall-clock-as-UTC epoch-micros lag from
    // DuckDB's own max(ts)
    "q98_freshness_violation" ->
      s"""WITH $T
         |SELECT 'ts' AS "column",
         |  round((epoch_us(TIMESTAMP '2030-01-01 00:00:00')
         |    - max(epoch_us(ts))) / 1e6, 6) AS lag_s
         |FROM transcripts""".stripMargin,

    // near-dup-rate twin: q64's exact shingle-Jaccard pair census without
    // the transitive closure — rate = docs appearing in >=1 exact pair at
    // j >= 0.7 over non-null doc NODES (count DISTINCT doc_id: the engine
    // census counts distinct (key, ord) nodes, so the twin must collapse
    // duplicate keys the same way or the rates diverge under dup rows)
    "q99_near_dup_rate" ->
      s"""WITH ${shingleCensusSql(" WHERE text IS NOT NULL")},
         |ends AS (SELECT a_id AS x FROM good UNION SELECT b_id FROM good),
         |n AS (SELECT count(DISTINCT doc_id) AS n FROM d)
         |SELECT 'text' AS "column",
         |  round((SELECT count(*) FROM ends)::DOUBLE / (SELECT n FROM n), 6)
         |    AS near_dup_rate""".stripMargin,

    // min_quality twin: q34's shared feature CTEs + the identical
    // floor-half-up score, filtered at the same bar the engine's row
    // check uses (non-null text only — null content is NotNull's finding)
    "q100_quality_violations" ->
      s"""WITH ${qualityFgSql(" WHERE text IS NOT NULL")},
         |s AS (SELECT doc_id, $qualityScoreSqlExpr AS quality_score FROM g)
         |SELECT doc_id, quality_score FROM s WHERE quality_score < 0.6
         |ORDER BY doc_id""".stripMargin,

    // language-share twin: q33's shared lang_pred chain aggregated to the
    // en share over non-null docs, emitted under the SAME failure
    // condition as the engine verdict (conditional twin — parity at any
    // scale factor, not just the one where the fixture's share is known)
    "q101_language_share" ->
      s"""WITH ${langPredSql(" WHERE text IS NOT NULL")},
         |sh AS (SELECT count(CASE WHEN lang_pred = 'en' THEN 1 END)::DOUBLE
         |    / count(*) AS share FROM pred)
         |SELECT 'text' AS "column", round(share, 6) AS en_share
         |FROM sh WHERE share < 0.95""".stripMargin,

    // vector-shape twin: the SAME deterministic lacing (first matching
    // rule wins, ×4 scale exact in any float width), then an independent
    // replay of all three legs — length, null/NaN element scan, double
    // L2 norm with the NaN guard — and the same concat_ws observed string
    "q102_vector_shape_violations" ->
      """WITH laced AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 7 = 0 THEN embedding[1:60]
        |         WHEN vec_id % 11 = 3 THEN
        |           list_transform(embedding, (x, i) ->
        |             CASE WHEN i = 1 THEN 'nan'::FLOAT ELSE x END)
        |         WHEN vec_id % 13 = 5 THEN
        |           list_transform(embedding, x -> (x * 4.0)::FLOAT)
        |         ELSE embedding END AS v
        |  FROM embeddings),
        |legs AS (
        |  SELECT vec_id, len(v) AS dim_len, len(v) <> 64 AS bad_dim,
        |    len(list_filter(v, x -> x IS NULL OR isnan(x))) > 0 AS bad_elem,
        |    sqrt(list_sum(list_transform(v, x -> x::DOUBLE * x::DOUBLE)))
        |      AS norm
        |  FROM laced),
        |f AS (
        |  SELECT vec_id, dim_len, bad_dim, bad_elem,
        |    NOT bad_elem AND (norm < 0.5 OR norm > 1.5) AS bad_norm, norm
        |  FROM legs)
        |SELECT vec_id,
        |  concat_ws(',',
        |    CASE WHEN bad_dim THEN 'dim=' || dim_len::VARCHAR END,
        |    CASE WHEN bad_elem THEN 'element' END,
        |    CASE WHEN bad_norm THEN 'norm=' || round(norm, 6)::VARCHAR END)
        |    AS observed
        |FROM f WHERE bad_dim OR bad_elem OR bad_norm
        |ORDER BY vec_id""".stripMargin,

    // turn-count twin: the same keyed census (null keys skipped), the
    // same bounds, the same observed string — conditional at any SF
    "q103_turn_count_violations" ->
      s"""WITH $T,
         |c AS (SELECT conv_id, count(*) AS n FROM transcripts
         |  WHERE conv_id IS NOT NULL GROUP BY 1)
         |SELECT conv_id, 'n=' || n::VARCHAR AS observed
         |FROM c WHERE n < 55 OR n > 80 ORDER BY conv_id""".stripMargin,

    // vector-suggestion twin: an independent per-column census of the
    // embeddings table (scalar columns like q91's stats; the embedding
    // column gets the dim/poisoned/norm census) and the same
    // deterministic rules — incl. the floor/ceil 4-decimal norm padding
    "q104_suggested_vector_constraints" ->
      """WITH vc AS (
        |  SELECT count(*) AS n,
        |    count(CASE WHEN embedding IS NULL THEN 1 END) AS nulls,
        |    count(DISTINCT embedding) AS dist,
        |    min(CASE WHEN embedding IS NOT NULL THEN len(embedding) END)
        |      AS dimmin,
        |    max(CASE WHEN embedding IS NOT NULL THEN len(embedding) END)
        |      AS dimmax,
        |    count(CASE WHEN embedding IS NOT NULL AND len(list_filter(
        |      embedding, x -> x IS NULL OR isnan(x))) > 0 THEN 1 END)
        |      AS vbad,
        |    min(CASE WHEN embedding IS NOT NULL AND len(list_filter(
        |      embedding, x -> x IS NULL OR isnan(x))) = 0 THEN
        |      sqrt(list_sum(list_transform(embedding,
        |        x -> x::DOUBLE * x::DOUBLE))) END) AS normmin,
        |    max(CASE WHEN embedding IS NOT NULL AND len(list_filter(
        |      embedding, x -> x IS NULL OR isnan(x))) = 0 THEN
        |      sqrt(list_sum(list_transform(embedding,
        |        x -> x::DOUBLE * x::DOUBLE))) END) AS normmax
        |  FROM embeddings),
        |ic AS (
        |  SELECT 'vec_id' AS c, count(*) AS n,
        |    count(CASE WHEN vec_id IS NULL THEN 1 END) AS nulls,
        |    count(DISTINCT vec_id) AS dist,
        |    min(vec_id)::DOUBLE AS mn, max(vec_id)::DOUBLE AS mx
        |  FROM embeddings
        |  UNION ALL
        |  SELECT 'label', count(*),
        |    count(CASE WHEN label IS NULL THEN 1 END),
        |    count(DISTINCT label), min(label)::DOUBLE, max(label)::DOUBLE
        |  FROM embeddings),
        |sugg AS (
        |  SELECT c, 'not_null' AS suggestion, NULL::DOUBLE AS lo,
        |    ceil((nulls::DOUBLE / n) * 10000) / 10000 AS hi,
        |    NULL::VARCHAR AS details
        |  FROM ic WHERE n > 0 AND nulls::DOUBLE / n <= 0.5
        |  UNION ALL
        |  SELECT 'embedding', 'not_null', NULL,
        |    ceil((nulls::DOUBLE / n) * 10000) / 10000, NULL
        |  FROM vc WHERE n > 0 AND nulls::DOUBLE / n <= 0.5
        |  UNION ALL
        |  SELECT c, 'value_bounds', mn, mx, NULL FROM ic
        |  WHERE n > 0 AND mn IS NOT NULL
        |  UNION ALL
        |  SELECT c, 'unique_key', NULL, NULL, NULL FROM ic
        |  WHERE nulls = 0 AND dist = n AND n > 1
        |  UNION ALL
        |  SELECT 'embedding', 'unique_key', NULL, NULL, NULL FROM vc
        |  WHERE nulls = 0 AND dist = n AND n > 1
        |  UNION ALL
        |  SELECT 'embedding', 'vector_shape',
        |    floor(normmin * 10000) / 10000, ceil(normmax * 10000) / 10000,
        |    'dim=' || dimmin::VARCHAR
        |  FROM vc WHERE n - nulls > 0 AND vbad = 0 AND dimmin = dimmax
        |    AND dimmin IS NOT NULL AND normmin IS NOT NULL)
        |SELECT c AS "column", suggestion, round(lo, 6) AS lo,
        |  round(hi, 6) AS hi, details
        |FROM sugg ORDER BY "column", suggestion""".stripMargin,

    // value-share twin: the same non-null census, the same string-form
    // equality, emitted under the same failure condition as the verdict
    "q105_value_share_violation" ->
      s"""WITH $T,
         |sh AS (SELECT count(CASE WHEN role = 'user' THEN 1 END)::DOUBLE
         |    / count(CASE WHEN role IS NOT NULL THEN 1 END) AS share
         |  FROM transcripts)
         |SELECT 'role' AS "column", round(share, 6) AS user_share
         |FROM sh WHERE share < 0.5""".stripMargin,

    // time-coverage twin: the same hourly census, the same span-complete
    // axis (generate_series from the census' own min to max), missing
    // buckets joined in at count 0, the same formatted observed string
    "q106_time_coverage_violations" ->
      s"""WITH $T,
         |c AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n
         |  FROM transcripts WHERE ts IS NOT NULL GROUP BY 1),
         |span AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
         |allb AS (SELECT unnest(generate_series(
         |    (SELECT lo FROM span), (SELECT hi FROM span),
         |    INTERVAL 1 HOUR)) AS h),
         |j AS (SELECT a.h, coalesce(c.n, 0) AS n
         |  FROM allb a LEFT JOIN c ON a.h = c.h)
         |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') || ' n=' || n::VARCHAR
         |  AS observed
         |FROM j WHERE n < 8 ORDER BY observed""".stripMargin,

    // length-bounds twin: DuckDB's own character length, the same bounds,
    // nulls excluded like the engine's NotNull-owns-nulls rule
    "q107_length_violations" ->
      """SELECT doc_id, length(text) AS text_length
        |FROM documents
        |WHERE text IS NOT NULL AND (length(text) < 60 OR length(text) > 400)
        |ORDER BY doc_id""".stripMargin,

    // graded-membership twin: the same census (non-null values outside
    // the set), the same rate over ALL rows, the same 0.15 ceiling
    "q108_graded_inset_verdict" ->
      s"""WITH $T,
         |c AS (SELECT count(*) AS n,
         |  count(CASE WHEN role IS NOT NULL AND role NOT IN
         |    ('user','assistant','system','tool') THEN 1 END) AS bad
         |  FROM transcripts)
         |SELECT bad::DOUBLE / n <= 0.15 AS pass, bad AS violations,
         |  round(bad::DOUBLE / n, 6) AS rate
         |FROM c""".stripMargin
  )
}
