package graft.text

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernels for the text-normalization / shingle-hash hot path
  * (optimization guide §1.2 step 2 "per-task work" + §4 "prefer codegen-
  * friendly expressions").
  *
  * The composable forms — `trim(regexp_replace(regexp_replace(lower(t),
  * "[^\\p{L}0-9\\s]", " "), "\\s+", " "))` and `transform(sequence(...),
  * i => hash(concat_ws(" ", slice(split(s, " "), i+1, k))))` — cost two
  * full Java-regex passes per row plus an INTERPRETED lambda per shingle
  * (HigherOrderFunction lambdas are excluded from codegen; each shingle
  * pays slice-copy + concat + boxed eval). Measured at sf0.1: the shingle
  * explode alone was 5.3–6.4 s for 240k shingles (~22 µs/shingle) — pure
  * expression-interpretation overhead, not data cost.
  *
  * These kernels compute byte-identical results in one pass per row:
  *
  *  - normalization: `UTF8String.toLowerCase` (the exact `lower()` code
  *    path), then a single code-point loop mapping every char that is not
  *    a Unicode letter (`Character.isLetter` ≡ regex `\p{L}`) or ASCII
  *    digit to a separator, collapsing separator runs and trimming — the
  *    provably identical composition of the two regexes + trim;
  *  - shingle hashes: token boundaries are byte offsets into the
  *    normalized UTF-8 buffer (tokens are single-space-joined, so the
  *    k-token shingle string IS the contiguous byte range), hashed with
  *    Spark's own XXH64 at the xxhash64() default seed 42, or with the
  *    md5-prefix 60-bit portable hash (first 15 hex chars == first 8
  *    digest bytes >>> 4) — bit-for-bit the values the composable form
  *    produces, so every oracle twin (incl. q73's exact OPH signature
  *    replay) is untouched.
  *
  * TextAnalysisSpec asserts kernel == composable on fixture + edge cases.
  */
object TextKernels {

  /** Normalized form of `lower(s)`: every non-(Unicode letter | ASCII
    * digit) code point is a separator; separator runs collapse to one
    * space; leading/trailing separators drop.
    */
  def normalizeString(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val n = lowered.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSep = false
    while (i < n) {
      val cp = lowered.codePointAt(i)
      val keep = (cp >= '0' && cp <= '9') || Character.isLetter(cp)
      if (keep) {
        if (pendingSep && sb.length > 0) sb.append(' ')
        sb.appendCodePoint(cp)
        pendingSep = false
      } else pendingSep = true
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  private val emptyLongs = new GenericArrayData(Array.empty[Long])

  /** First 60 bits of md5 over a byte range — equals
    * `conv(substring(md5(x), 1, 15), 16, 10)` (15 hex chars = first 8
    * digest bytes shifted right a nibble).
    */
  private def md5Prefix60(bytes: Array[Byte], from: Int, len: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(bytes, from, len)
    val d = md.digest()
    val hi8 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi8 >>> 4
  }

  /** All k-token shingle hashes of the normalized text, or an EMPTY array
    * when the text is null / normalizes to empty / has fewer than k
    * tokens (the composable form's `when(...).otherwise(array())` shape).
    */
  def shingleHashLongs(s: UTF8String, k: Int, portable: Boolean): ArrayData = {
    if (s == null) return emptyLongs
    val norm = normalizeString(s)
    val numBytes = norm.numBytes()
    if (numBytes == 0) return emptyLongs
    val bytes = norm.getBytes // compact copy; token spaces are 0x20 bytes
    // token start offsets (single-space-separated by construction)
    var nTok = 1
    var i = 0
    while (i < numBytes) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    if (nTok < k) return emptyLongs
    val starts = new Array[Int](nTok + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < numBytes) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = numBytes + 1 // sentinel: end-of-shingle = starts(i+k)-1
    val out = new Array[Long](nTok - k + 1)
    var j = 0
    while (j <= nTok - k) {
      val from = starts(j)
      val len = starts(j + k) - 1 - from
      out(j) =
        if (portable) md5Prefix60(bytes, from, len)
        else XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from,
          len, 42L)
      j += 1
    }
    new GenericArrayData(out)
  }

  private val wsPattern = UTF8String.fromString("\\s+")

  /** `split(trim(lower(t)), "\\s+")` via the exact same UTF8String code
    * paths the builtin chain uses — the token array feeding tokenCount /
    * quality / langId (edge semantics incl. the leading-empty-token quirk
    * of Java split are therefore identical by construction).
    */
  private def tokensOf(s: UTF8String): Array[UTF8String] =
    s.toLowerCase.trim.split(wsPattern, -1)

  /** Is the code point an ASCII whitespace char (Java regex `\s`)? */
  @inline private def isAsciiWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' ||
      cp == '\r'

  /** [[graft.text.TextAnalysis.qualityScoreCol]] as one per-row pass: the
    * IDENTICAL double arithmetic over the identical counts (char census
    * replaces three regexp_replace+length passes; the stopword count
    * replaces the interpreted filter lambda). Null text scores exactly
    * like the composable form's null-propagation (0.2).
    */
  def qualityScore(s: UTF8String): Double = {
    var nChars = 0
    var nonWs = 0      // length(regexp_replace(t, "\\s", ""))
    var punct = 0      // length(regexp_replace(t, "[\\p{L}0-9\\s]", ""))
    var digits = 0     // length(regexp_replace(t, "[^0-9]", ""))
    var nTok = 0
    var stopHits = 0
    var tokNull = s == null
    if (s != null) {
      val str = s.toString
      var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        nChars += 1
        val ws = isAsciiWs(cp)
        if (!ws) nonWs += 1
        if (cp >= '0' && cp <= '9') digits += 1
        else if (!ws && !Character.isLetter(cp)) punct += 1
        i += Character.charCount(cp)
      }
      // tokenCount: when(length(trim(t)) === 0, 0) else size(tokens)
      if (s.trim.numChars() == 0) nTok = 0
      else {
        val toks = tokensOf(s)
        nTok = toks.length
        var j = 0
        while (j < toks.length) {
          if (enStopwordSet.contains(toks(j).toString)) stopHits += 1
          j += 1
        }
      }
    }
    // from here: the EXACT expression-tree arithmetic, null branches
    // folded to the values they produce
    val lenScore = math.min(nTok.toDouble / 64.0, 1.0) // coalesce(nTok,0)
    val wordScore =
      if (nTok > 0 && !tokNull) {
        val meanTokenLen = nonWs.toDouble / nTok.toDouble
        1.0 - math.min(math.abs(meanTokenLen - 5.0) / 5.0, 1.0)
      } else 0.0 // least() skips the null meanTokenLen → 1 - 1.0 = 0.0
    val punctRatio = if (nChars > 0 && s != null)
      punct.toDouble / nChars.toDouble else 0.0
    val digitRatio = if (nChars > 0 && s != null)
      digits.toDouble / nChars.toDouble else 0.0
    val stopwordRatio = if (nTok > 0 && !tokNull)
      stopHits.toDouble / nTok.toDouble else 0.0
    val stopScore = math.min(stopwordRatio * 5.0, 1.0)
    val noise = math.min(punctRatio * 3.0 + digitRatio * 2.0, 1.0)
    val raw = math.max(0.0, math.min(1.0,
      lenScore * 0.3 + wordScore * 0.3 + stopScore * 0.2 +
        (1.0 - noise) * 0.2))
    math.floor(raw * 1e6 + 0.5) / 1e6
  }

  private val langIdLangs = Seq("en", "de", "es", "fr")
  private lazy val enStopwordSet: Set[String] =
    TextAnalysis.stopwords("en").toSet
  private lazy val langIdSets: Array[Set[String]] =
    langIdLangs.map(l => TextAnalysis.stopwords(l).toSet).toArray
  private val langIdResults: Array[UTF8String] =
    (langIdLangs :+ "und").map(UTF8String.fromString).toArray

  /** [[graft.text.TextAnalysis.langId]] as one per-row pass: count marker
    * hits per language over the shared token array, argmax with ties
    * broken in the fixed (en, de, es, fr) order, 'und' when nothing
    * matches — byte-identical to the aggregate/transform fold.
    */
  def langId(s: UTF8String): UTF8String = {
    val counts = new Array[Int](langIdLangs.size)
    // null text: tokens(null) → null fold → null counts → the argmax
    // when-chain falls through every (null > 0) condition to 'und'
    if (s != null) {
      val toks = tokensOf(s)
      var j = 0
      while (j < toks.length) {
        val t = toks(j).toString
        var l = 0
        while (l < counts.length) {
          if (langIdSets(l).contains(t)) counts(l) += 1
          l += 1
        }
        j += 1
      }
    }
    var best = 0
    var i = 0
    while (i < counts.length) { if (counts(i) > best) best = counts(i); i += 1 }
    if (best == 0) return langIdResults(counts.length)
    i = 0
    while (counts(i) != best) i += 1
    langIdResults(i)
  }

  /** Any Luhn-valid candidate in the array? Replicates
    * `exists(cands, luhnValid)` where luhnValid is the right-to-left
    * double-every-second-digit fold with the length >= 13 guard — one
    * primitive loop instead of an interpreted aggregate-over-sequence per
    * candidate. Null array → null (exists on null), null element → the
    * lambda's null (skipped by exists' tri-state unless no true exists).
    */
  def luhnAny(arr: ArrayData): Any = {
    if (arr == null) return null
    var sawNull = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) sawNull = true
      else {
        val s = arr.getUTF8String(i).toString
        if (s.length >= 13) {
          var sum = 0
          var j = 0 // j-th char from the right, 1-based position in fold
          while (j < s.length) {
            val d = s.charAt(s.length - 1 - j) - '0'
            sum += (if (j % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t }
              else d)
            j += 1
          }
          if (sum % 10 == 0) return true
        }
      }
      i += 1
    }
    if (sawNull) null else false
  }

  /** Per-row simhash bit votes: for each bit b of the token hash, +1 if
    * set else −1, summed over THIS row's tokens (duplicate-id rows are
    * vote-summed by the caller's groupBy, preserving the exploded form's
    * semantics). Tokens are `split(normalized(text), " ")` — note the
    * empty normalized string contributes ONE empty token, exactly like
    * the composable split. Null text → null (caller filters, matching
    * explode-of-null dropping the row).
    */
  def simhashVotes(s: UTF8String, bits: Int, portable: Boolean): ArrayData = {
    if (s == null) return null
    val norm = normalizeString(s)
    val toks = norm.split(spacePattern, -1)
    val votes = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      val bytes = toks(i).getBytes
      val h =
        if (portable) md5Prefix60(bytes, 0, bytes.length)
        else XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 42L)
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >>> b) & 1L) != 0L) 1 else -1)
        b += 1
      }
      i += 1
    }
    new GenericArrayData(votes)
  }

  private val spacePattern = UTF8String.fromString(" ")

  /** Per-row MinHash partial signature: for each seed s in 0..n-1, the
    * min over this row's shingles of `xxhash64(shingle, lit(s))` — exactly
    * `XXH64.hashInt(s, XXH64.hashLong(shingle, 42))`, the value the
    * two-child xxhash64 expression folds (the seed literal is an INT
    * child, so the second fold step is hashInt). The inner hash is computed
    * ONCE per shingle (the expression recomputed it per seed), and the
    * exchange then carries one n-long array per doc ROW instead of one
    * row per shingle (guide §2.3); the caller's groupBy takes
    * elementwise mins so duplicate-id union semantics are preserved.
    * Empty/null shingle sets → null (caller filters, matching the
    * explode emitting no rows).
    */
  def minhashPartial(shingles: ArrayData, numHashes: Int): ArrayData = {
    if (shingles == null || shingles.numElements() == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      val inner = XXH64.hashLong(shingles.getLong(i), 42L)
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashInt(s, inner)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column face of [[minhashPartial]]. */
  def minhashPartialCol(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(
      MinHashPartial(GraftBridge.expression(shingles), numHashes))

  /** Column face of [[normalizeString]] — drop-in for the regex form. */
  def normalizeCol(c: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(c)))

  /** Column face of [[luhnAny]]. */
  def luhnAnyCol(c: Column): Column =
    GraftBridge.column(LuhnAny(GraftBridge.expression(c)))

  /** Column face of [[simhashVotes]]. */
  def simhashVotesCol(c: Column, bits: Int, portable: Boolean): Column =
    GraftBridge.column(
      SimHashVotes(GraftBridge.expression(c), bits, portable))

  /** Column face of [[qualityScore]]. */
  def qualityScoreCol(c: Column): Column =
    GraftBridge.column(QualityScoreExpr(GraftBridge.expression(c)))

  /** Column face of [[langId]]. */
  def langIdCol(c: Column): Column =
    GraftBridge.column(LangIdExpr(GraftBridge.expression(c)))

  /** Column face of [[shingleHashLongs]]. */
  def shingleHashCol(c: Column, k: Int, portable: Boolean): Column =
    GraftBridge.column(
      ShingleHashLongs(GraftBridge.expression(c), k, portable))
}

/** `trim(regexp_replace(regexp_replace(lower(t), "[^\\p{L}0-9\\s]", " "),
  * "\\s+", " "))` as one code-point pass (null in → null out).
  */
case class NormalizeText(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override def nullSafeEval(input: Any): Any =
    TextKernels.normalizeString(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** [[TextKernels.qualityScore]] as an expression. Declared nullable for
  * schema parity with the composable form (which never actually produces
  * null either — null text folds to the 0.2 floor score).
  */
case class QualityScoreExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quality_score"
  override def eval(input: InternalRow): Any =
    TextKernels.qualityScore(child.eval(input).asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** [[TextKernels.langId]] as an expression. Null text yields 'und' (the
  * composable argmax chain falls through its null conditions), so the
  * result is never null; declared nullable for schema parity.
  */
case class LangIdExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_id"
  override def eval(input: InternalRow): Any =
    TextKernels.langId(child.eval(input).asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** [[TextKernels.minhashPartial]] as an expression (array<bigint>). */
case class MinHashPartial(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_partial"
  override def eval(input: InternalRow): Any =
    TextKernels.minhashPartial(child.eval(input).asInstanceOf[ArrayData],
      numHashes)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** [[TextKernels.luhnAny]] as an expression over array<string>. */
case class LuhnAny(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "luhn_any"
  override def eval(input: InternalRow): Any =
    TextKernels.luhnAny(child.eval(input).asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** [[TextKernels.simhashVotes]] as an expression (array<int> votes). */
case class SimHashVotes(child: Expression, bits: Int, portable: Boolean)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_votes"
  override def eval(input: InternalRow): Any =
    TextKernels.simhashVotes(child.eval(input).asInstanceOf[UTF8String],
      bits, portable)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** k-token shingle hashes of the normalized text as array<bigint>; empty
  * array (never null) on null/empty/short input — the composable
  * `when(...).otherwise(array())` contract.
  */
case class ShingleHashLongs(child: Expression, k: Int, portable: Boolean)
  extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"shingle k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_hashes"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    TextKernels.shingleHashLongs(v.asInstanceOf[UTF8String], k, portable)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
