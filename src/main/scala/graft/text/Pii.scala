package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection battery over a text column — the safety census a
  * training-data pipeline runs before anything ships: email addresses,
  * NANP-shaped phone numbers, US SSNs, IPv4 addresses, and payment-card
  * numbers (regex candidates verified with the Luhn checksum, so a random
  * 16-digit id doesn't flag). The reference validates column SHAPES via
  * per-column regex/range rules (reference: src/hive_data_loader.py:180-225);
  * this is that idea aimed at the content-safety problem transcripts
  * actually have.
  *
  * Everything here is pure Column composition (codegen'd, zero UDFs,
  * streaming-legal): `rlike` / `regexp_extract_all` for the patterns and a
  * higher-order `aggregate` for the Luhn digit fold. The patterns avoid
  * lookaround on purpose — they stay inside the regex subset Java's engine
  * (Spark) and RE2 (DuckDB, the oracle) interpret identically, so the
  * oracle can replay the EXACT same pattern strings (q97).
  *
  * ANSI-safe by construction: digits fold via `ascii(ch) − 48` (never a
  * string→int cast, which throws under Spark 4's default ANSI mode on any
  * non-numeric slice).
  */
object Pii {

  /** kind → pattern, in battery order. `card` is the CANDIDATE pattern —
    * a 13–19 digit run flags only if some candidate passes [[luhnValid]].
    */
  val patterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "phone" -> """\b\d{3}[-.]\d{3}[-.]\d{4}\b""",
    "ssn" -> """\b\d{3}-\d{2}-\d{4}\b""",
    "ipv4" -> ("""\b((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}""" +
      """(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"""),
    "card" -> """\b\d{13,19}\b""")

  private val patternMap: Map[String, String] = patterns.toMap

  /** All kind names, battery order. */
  val allKinds: Seq[String] = patterns.map(_._1)

  /** Luhn checksum over a digit-run candidate (non-empty, digits only —
    * the card pattern guarantees both). Folds right-to-left: every second
    * digit doubles, digits of the double sum (d*2−9 when d*2>9), total
    * ≡ 0 (mod 10).
    */
  def luhnValid(cand: Column): Column = {
    val rev = reverse(cand)
    val sum = aggregate(
      sequence(lit(1), length(rev)),
      lit(0),
      (acc: Column, i: Column) => {
        val d = ascii(rev.substr(i, lit(1))) - lit(48)
        acc + when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    length(cand) >= 13 && pmod(sum, lit(10)) === 0
  }

  /** Does `c` contain PII of `kind`? Null input yields null (callers guard
    * with isNotNull — a null has no content, NotNull's finding).
    */
  def kindMatches(c: Column, kind: String): Column = kind match {
    case "card" =>
      // EVERY candidate is Luhn-checked, not just the first: a text whose
      // first digit run is an order id and whose second is a real card
      // number must still flag. The fold runs in the LuhnAny kernel (one
      // primitive loop; the composable exists+aggregate form below it is
      // the parity-spec reference) — candidates still come from the real
      // regex engine, so the oracle's RE2 replay is untouched.
      TextKernels.luhnAnyCol(
        regexp_extract_all(c, lit("(" + patternMap("card") + ")"), lit(1)))
    case k => c.rlike(patternMap.getOrElse(k,
      throw new IllegalArgumentException(
        s"unknown pii kind '$k' (supported: ${allKinds.mkString(",")})")))
  }

  /** Array of the kind NAMES matched in `c` (battery order) — what a
    * violation row observes. Deliberately never the matched text: a
    * violation sink must not become a second copy of the PII it flags.
    * Null input yields an EMPTY battery (each when() branch nulls and the
    * filter drops it) — a null has no content; NotNull owns it.
    */
  def matchedKinds(c: Column, kinds: Seq[String]): Column =
    // array_compact ≡ filter(x => x.isNotNull) but is a native collection
    // expression, not a lambda — lambda subtrees are excluded from
    // Catalyst's common-subexpression elimination, so the filter form
    // forced the whole regex battery to re-evaluate at every reference
    // (the validator references matchedKinds twice per row plus once in
    // the stats aggregate)
    array_compact(
      array(kinds.map(k => when(kindMatches(c, k), lit(k))): _*))
}
