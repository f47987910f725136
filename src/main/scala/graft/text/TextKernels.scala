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

  /** Column face of [[normalizeString]] — drop-in for the regex form. */
  def normalizeCol(c: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(c)))

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
