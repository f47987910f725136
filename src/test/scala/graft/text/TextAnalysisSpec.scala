package graft.text

import org.apache.spark.sql.functions._
import graft.GraftSuite

class TextAnalysisSpec extends GraftSuite {
  import spark.implicits._

  test("token counting: whitespace and bpe-ish") {
    val df = Seq("hello world", "  a  b   c ", "", "internationalization 42!")
      .toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.bpeishCount(col("text")).as("bpe")).collect()
    assert(got(0).getInt(0) == 2)
    assert(got(1).getInt(0) == 3)
    assert(got(2).getInt(0) == 0)
    // internationalization (20 chars → 5 pieces) + '42' (2 digits) + '!' (1)
    assert(got(3).getInt(1) == 5 + 2 + 1)
  }

  test("language id picks the marker-heavy language") {
    val df = Seq(
      "the cat is in the house and it is warm",
      "der hund ist nicht auf der wiese und das ist gut",
      "le chat est dans la maison et il est pour une vie",
      "el perro es un animal y la casa es una cosa",
      "zzz qqq xxx").toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(got.toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("quality score: clean prose beats noise, bounded [0,1]") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs for the hills in a fine morning",
      "@@@@ #### $$$$ 1234 5678 ???? !!!!",
      "").toDF("text")
    val got = TextAnalysis.qualityScore(df, "text")
      .select("quality_score").as[Double].collect()
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1) && got(0) > got(2))
  }

  test("fingerprint is normalization-invariant") {
    val df = Seq(
      ("a", "Hello,   World!"),
      ("b", "hello world"),
      ("c", "different text")).toDF("id", "text")
    val fp = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("f"))
      .as[(String, String)].collect().toMap
    assert(fp("a") == fp("b") && fp("a") != fp("c"))
  }

  test("shingle and char-ngram hashes: counts and short-input edge") {
    val df = Seq("a b c d e", "a b").toDF("text")
    val got = df.select(
      size(TextAnalysis.shingleHashes(col("text"), 3)).as("n3"),
      size(TextAnalysis.charNgramHashes(col("text"), 4)).as("c4")).collect()
    assert(got(0).getInt(0) == 3) // abc bcd cde
    assert(got(0).getInt(1) == 9 - 4 + 1 + 0) // "a b c d e" normalized len 9
    assert(got(1).getInt(0) == 0) // too short for 3-shingles
  }
}
