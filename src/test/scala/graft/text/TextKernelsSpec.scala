package graft.text

import org.apache.spark.sql.functions._
import graft.GraftSuite

/** Parity gate for the single-pass text kernels (optimization round):
  * [[TextKernels]] must be BYTE-IDENTICAL to the composable regex/HOF
  * forms it replaced — the oracle twins (q31 fingerprints, q73 exact OPH
  * signatures, the q40/q64/q99 chain) all ride these values.
  */
class TextKernelsSpec extends GraftSuite {
  import spark.implicits._

  private val fixtures: Seq[String] = Seq(
    "Hello,   World!",
    "the quick brown fox jumps over the lazy dog",
    "", "   ", "...", "a", "a b", "a b c", "a  b\t\nc",
    "MIXED Case ÄÖÜ straße İstanbul ΣΊΣΥΦΟΣ ΟΔΥΣΣΕΎΣ",
    "tabs\tand\nnewlinesand\fother\rwhitespace",
    "digits 0123456789 and unicode digits ٣٤٥",
    "emoji 😀 surrogate pairs 𝒜𝒝 end",
    "nbsp separated words",
    "punct-only !@#$%^&*()_+-=[]{};':\",./<>?",
    "trailing spaces   ",
    "   leading spaces",
    "turn 42 of conv_00000007 alpha beta gamma",
    null)

  private def df = fixtures.zipWithIndex.map { case (t, i) => (i, t) }
    .toDF("id", "text")

  test("normalizeText == trim(regex(regex(lower)))") {
    val got = df.select(col("id"),
      TextAnalysis.normalized(col("text")).as("fast"),
      TextAnalysis.normalizedComposable(col("text")).as("slow"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[String]("fast") == r.getAs[String]("slow"),
        s"id=${r.getInt(0)}: '${r.getAs[String]("fast")}' != " +
          s"'${r.getAs[String]("slow")}'")
    }
  }

  test("shingle hashes (xxhash64) == composable form, k in 1..4") {
    (1 to 4).foreach { k =>
      val got = df.select(col("id"),
        TextAnalysis.shingleHashes(col("text"), k).as("fast"),
        TextAnalysis.shingleHashesWith(col("text"), k, xxhash64(_)).as("slow"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"k=$k id=${r.getInt(0)}")
      }
    }
  }

  test("shingle hashes (portable md5-60) == composable form, k in 1..3") {
    (1 to 3).foreach { k =>
      val got = df.select(col("id"),
        TextAnalysis.shingleHashesPortable(col("text"), k).as("fast"),
        TextAnalysis.shingleHashesWith(col("text"), k,
          TextAnalysis.portableHash60).as("slow"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"k=$k id=${r.getInt(0)}")
      }
    }
  }

  test("qualityScore kernel == composable expression tree (bitwise)") {
    val extra = Seq("the of and to in a is that it for", "12345",
      "word " * 64, "x" * 200, "a\tb", "\t", " \t ",
      "the quick brown fox! 42 @@@")
    val d = (fixtures ++ extra).zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
    val got = d.select(col("id"),
      TextAnalysis.qualityScoreCol(col("text")).as("fast"),
      TextAnalysis.qualityScoreColComposable(col("text")).as("slow"))
      .collect()
    got.foreach { r =>
      val (f, s) = (r.getAs[Any](1), r.getAs[Any](2))
      assert(java.util.Objects.equals(f, s) ||
        java.lang.Double.doubleToLongBits(f.asInstanceOf[Double]) ==
          java.lang.Double.doubleToLongBits(s.asInstanceOf[Double]),
        s"id=${r.getInt(0)}: $f != $s")
    }
  }

  test("langId kernel == composable fold") {
    val extra = Seq(
      "the cat is in the house and it is warm",
      "der hund ist nicht auf der wiese und das ist gut",
      "le chat est dans la maison et il est pour une vie",
      "el perro es un animal y la casa es una cosa",
      "la la la", // es/fr tie → first in (en, de, es, fr) order wins
      "zzz qqq xxx")
    val d = (fixtures ++ extra).zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
    val got = d.select(col("id"),
      TextAnalysis.langId(col("text")).as("fast"),
      TextAnalysis.langIdComposable(col("text")).as("slow"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[String]("fast") == r.getAs[String]("slow"),
        s"id=${r.getInt(0)}: ${r.getAs[String]("fast")} != " +
          s"${r.getAs[String]("slow")}")
    }
  }

  test("minhashPartial == min(xxhash64(sh, lit(s))) per row") {
    val d = fixtures.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
    val sh = TextAnalysis.shingleHashes(col("text"), 3)
    val fast = d.select(col("id"),
      TextKernels.minhashPartialCol(sh, 16).as("p"))
    val slow = d.select(col("id"), explode(sh).as("s"))
      .groupBy("id")
      .agg(array((0 until 16).map(i => min(xxhash64(col("s"), lit(i)))): _*)
        .as("p"))
    val f = fast.where(col("p").isNotNull).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val s = slow.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(f == s)
  }

  test("minhashSignatures (partial kernel + ElementMinAgg) == explode/64-min form") {
    val d = (fixtures ++ fixtures).zipWithIndex // duplicated texts under
      .map { case (t, i) => (i % fixtures.size, t) } // REPEATED ids: the
      .toDF("id", "text") // groupBy union-semantics leg must hold too
    val fast = graft.dedup.Dedup.minhashSignatures(d, "id", "text", 3, 16)
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val sh = TextAnalysis.shingleHashes(col("text"), 3)
    val slow = d.select(col("id"), explode(sh).as("s"))
      .groupBy("id")
      .agg(array((0 until 16).map(i => min(xxhash64(col("s"), lit(i)))): _*)
        .as("signature"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(fast == slow)
  }

  test("parity over the sf0.001 documents fixture") {
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$dir/documents.parquet").exists()) {
      val docs = graft.sources.Tables.documents(spark, dir)
      val bad = docs.select(
        TextAnalysis.normalized(col("text")).as("nf"),
        TextAnalysis.normalizedComposable(col("text")).as("ns"),
        TextAnalysis.qualityScoreCol(col("text")).as("qf"),
        TextAnalysis.qualityScoreColComposable(col("text")).as("qs"),
        TextAnalysis.langId(col("text")).as("lf"),
        TextAnalysis.langIdComposable(col("text")).as("ls"),
        TextAnalysis.shingleHashes(col("text"), 3).as("hf"),
        TextAnalysis.shingleHashesWith(col("text"), 3, xxhash64(_)).as("hs"),
        TextAnalysis.shingleHashesPortable(col("text"), 3).as("pf"),
        TextAnalysis.shingleHashesWith(col("text"), 3,
          TextAnalysis.portableHash60).as("ps"))
        .where(!(col("nf") <=> col("ns")) || !(col("hf") <=> col("hs")) ||
          !(col("pf") <=> col("ps")) || !(col("qf") <=> col("qs")) ||
          !(col("lf") <=> col("ls")))
        .count()
      assert(bad == 0L)
    }
  }
}
