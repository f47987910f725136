package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, fingerprinting. All pure
  * Column expressions (whole-stage codegen'd, no UDFs) so they fuse into
  * the scan projection — at 100 TB these run at parquet-read speed.
  */
object TextAnalysis {

  /** Whitespace tokens of lowercased text. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text)))

  /** BPE-ish subword count: words split further at ~4 chars per piece,
    * digits and punctuation one piece each (a cheap, deterministic stand-in
    * for a real tokenizer's piece count).
    */
  def bpeishCount(text: Column): Column = {
    val words = tokens(text)
    val alnumPieces = aggregate(words, lit(0),
      (acc, w) => acc + ceil(length(regexp_replace(w, "[^\\p{L}]", "")) / lit(4.0)).cast("int"))
    val digitCount = length(regexp_replace(text, "[^0-9]", ""))
    val punctCount = length(regexp_replace(text, "[\\p{L}0-9\\s]", ""))
    alnumPieces + digitCount + punctCount
  }

  /** Language marker stopwords (tiny high-frequency sets). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "sich", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "que", "por"))

  private def markerHits(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isin(stopwords(lang): _*)))

  /** N-gram-heuristic language ID: argmax of marker-token hits, 'und'
    * (undetermined) when nothing matches. Ties break in fixed language
    * order (en, de, es, fr — deterministic).
    *
    * Single-pass shape: lambda subtrees are excluded from Catalyst's
    * common-subexpression elimination, so the naive per-language
    * `size(filter(tokens(...)))` form re-splits the text up to 8× per
    * row. Here ONE aggregate walks the token array once accumulating all
    * four counts, and the argmax runs over that array bound to a lambda
    * variable (evaluated once) via a 1-element transform.
    */
  def langId(text: Column): Column = TextKernels.langIdCol(text)

  /** The original fold — parity-spec reference for [[TextKernels.langId]]. */
  private[text] def langIdComposable(text: Column): Column = {
    val langs = Seq("en", "de", "es", "fr")
    val counts = aggregate(tokens(text),
      array(langs.map(_ => lit(0)): _*),
      (acc, t) => array(langs.zipWithIndex.map { case (l, i) =>
        element_at(acc, i + 1) +
          when(t.isin(stopwords(l): _*), 1).otherwise(0)
      }: _*))
    element_at(transform(array(counts), c => {
      val best = array_max(c)
      langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), acc) =>
        when(best > 0 && element_at(c, i + 1) === best, lit(l)).otherwise(acc)
      }
    }), 1)
  }

  /** Quality features: lengths, punctuation/digit/stopword ratios, mean
    * word length — the standard cheap pre-filters for web corpora.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTok = tokenCount(t)
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTok)
      .withColumn("mean_token_len",
        when(nTok > 0, (length(regexp_replace(t, "\\s", "")).cast("double")) / nTok))
      .withColumn("punct_ratio",
        when(nChars > 0,
          length(regexp_replace(t, "[\\p{L}0-9\\s]", "")).cast("double") / nChars)
          .otherwise(0.0))
      .withColumn("digit_ratio",
        when(nChars > 0,
          length(regexp_replace(t, "[^0-9]", "")).cast("double") / nChars)
          .otherwise(0.0))
      .withColumn("stopword_ratio",
        when(nTok > 0, markerHits(t, "en").cast("double") / nTok).otherwise(0.0))
  }

  /** Scalar quality score in [0,1] as ONE Column expression (the single
    * source of the formula — the DataFrame face below and the
    * MinTextQuality constraint both compile it): rewards mid-length docs
    * with natural word lengths, some stopwords, low punctuation/digit
    * noise.
    */
  def qualityScoreCol(t: Column): Column = TextKernels.qualityScoreCol(t)

  /** The original expression tree — parity-spec reference for
    * [[TextKernels.qualityScore]].
    */
  private[text] def qualityScoreColComposable(t: Column): Column = {
    val nChars = length(t)
    val nTok = tokenCount(t)
    val meanTokenLen =
      when(nTok > 0, length(regexp_replace(t, "\\s", "")).cast("double") / nTok)
    val punctRatio = when(nChars > 0,
      length(regexp_replace(t, "[\\p{L}0-9\\s]", "")).cast("double") / nChars)
      .otherwise(0.0)
    val digitRatio = when(nChars > 0,
      length(regexp_replace(t, "[^0-9]", "")).cast("double") / nChars)
      .otherwise(0.0)
    val stopwordRatio =
      when(nTok > 0, markerHits(t, "en").cast("double") / nTok).otherwise(0.0)
    // coalesce BEFORE least: least() skips nulls, so a NULL text's null
    // n_tokens would otherwise make lenScore 1.0 and gift contentless
    // rows a 0.5 score; with 0 they score like empty strings (~0.2)
    val lenScore = least(coalesce(nTok.cast("double"), lit(0.0)) / 64.0, lit(1.0))
    val wordScore = lit(1.0) - least(abs(meanTokenLen - 5.0) / 5.0, lit(1.0))
    val stopScore = least(stopwordRatio * 5.0, lit(1.0))
    val noise = least(punctRatio * 3.0 + digitRatio * 2.0, lit(1.0))
    // deterministic half-up rounding at 6 decimals: floor(x*1e6 + 0.5)/1e6.
    // The weight/ratio arithmetic lands scores EXACTLY on rounding half-
    // boundaries (e.g. 0.5223125), where engines' round() disagree (Spark
    // HALF_UP on the shortest decimal repr vs DuckDB/C nearbyint half-even);
    // explicit floor arithmetic is identical on identical doubles.
    val raw = greatest(lit(0.0), least(lit(1.0),
      lenScore * 0.3 + coalesce(wordScore, lit(0.0)) * 0.3 +
        stopScore * 0.2 + (lit(1.0) - noise) * 0.2))
    floor(raw * 1e6 + 0.5) / 1e6
  }

  /** [[qualityScoreCol]] alongside the [[qualityFeatures]] columns. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityFeatures(df, textCol)
      .withColumn("quality_score", qualityScoreCol(col(textCol)))

  /** Normalization for fingerprinting: lowercase, strip punctuation,
    * collapse whitespace. Single-pass kernel ([[TextKernels]]); the
    * composable regex form it provably equals is kept below for the
    * parity spec.
    */
  def normalized(text: Column): Column = TextKernels.normalizeCol(text)

  /** The original two-regex composition — parity-spec reference only. */
  private[text] def normalizedComposable(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^\\p{L}0-9\\s]", " "),
      "\\s+", " "))

  /** Document fingerprint: md5 of normalized text (cheap exact-after-
    * normalization identity; cross-engine reproducible).
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Rolling (Karp–Rabin style) k-token shingle hashes: one 64-bit hash
    * per consecutive k-token window of the normalized text. The input to
    * minhash/jaccard dedup.
    */
  def shingleHashes(text: Column, k: Int): Column =
    TextKernels.shingleHashCol(text, k, portable = false)

  /** [[shingleHashes]] with the engine-portable md5-prefix hash — the
    * signatures an independent engine must reproduce (q73's OPH twin).
    */
  def shingleHashesPortable(text: Column, k: Int): Column =
    TextKernels.shingleHashCol(text, k, portable = true)

  /** The original composable form (interpreted lambda per shingle) — kept
    * as the parity-spec reference for [[TextKernels]] and for exotic
    * caller-supplied hashes.
    */
  private[graft] def shingleHashesWith(text: Column, k: Int,
      hash: Column => Column): Column = {
    require(k >= 1, s"shingle k must be >= 1, got $k")
    val s = normalized(text)
    val toks = split(s, " ")
    val n = size(toks)
    // the empty-normalized guard matters at k = 1: split("", " ") is [""]
    // (size 1), which would otherwise hash a phantom "" shingle shared by
    // every punctuation-only/empty doc — spurious duplicate clusters
    when(length(s) > 0 && n >= k,
      transform(sequence(lit(0), n - k),
        i => hash(concat_ws(" ",
          slice(toks, i + 1, lit(k)))).cast("long")))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Engine-portable 60-bit hash: the first 15 hex chars of md5, a value
    * both Spark (`conv`) and e.g. DuckDB (`('0x' || …)::BIGINT`) compute
    * identically — the cross-engine-reproducibility family shared by
    * simhashReproducible and the OPH signatures.
    */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Character n-gram hashes (for short/CJK-ish text where token shingles
    * are too coarse).
    */
  def charNgramHashes(text: Column, n: Int): Column = {
    require(n >= 1, s"char n-gram n must be >= 1, got $n")
    val s = normalized(text)
    val len = length(s)
    when(len >= n,
      transform(sequence(lit(1), len - n + 1),
        i => xxhash64(s.substr(i, lit(n)))))
      .otherwise(array().cast("array<bigint>"))
  }
}
