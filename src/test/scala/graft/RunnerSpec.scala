package graft

import org.apache.spark.sql.functions._

import graft.sources.TranscriptGen

/** Drives the spark-submit verbs end-to-end (main() adopts the shared
  * test session and leaves it running): the declarative reach added in
  * r5 — `--sample` on validate, `dupgroups`, `sessions`.
  */
class RunnerSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_runner").toString

  test("validate --sample validates exactly the deterministic conversation sample") {
    val dir = tmp()
    TranscriptGen.generate(spark, nConvs = 60, baseTurns = 24)
      .write.mode("overwrite").parquet(s"$dir/in")
    Runner.main(Array("validate", s"$dir/in", s"$dir/out", "--sample", "0.5"))
    val sampledConvs = graft.sample.Sampling
      .uniform(spark.read.parquet(s"$dir/in"), "conv_id", 0.5)
      .select("conv_id").distinct().as[String].collect().toSet
    assert(sampledConvs.nonEmpty && sampledConvs.size < 60,
      s"sample should be a strict non-empty subset, got ${sampledConvs.size}")
    val verdictConvs = spark.read.parquet(s"$dir/out/verdicts")
      .where(col("partition_key") =!= "(global)")
      .select("partition_key").distinct().as[String].collect().toSet
    assert(verdictConvs == sampledConvs)
  }

  test("validate --sample with no rate argument refuses to run") {
    val dir = tmp()
    TranscriptGen.generate(spark, nConvs = 5, baseTurns = 4)
      .write.mode("overwrite").parquet(s"$dir/in")
    val ex = intercept[RuntimeException] {
      Runner.main(Array("validate", s"$dir/in", s"$dir/out", "--sample"))
    }
    assert(ex.getMessage.contains("--sample requires a rate"))
    assert(!new java.io.File(s"$dir/out/verdicts").exists(),
      "a malformed --sample must not fall back to a full validation")
  }

  test("dupgroups verb writes canonical duplicate groups") {
    val dir = tmp()
    val common = "the quick brown fox jumps over the lazy dog again and again today"
    Seq(
      (1L, common),
      (2L, common), // exact dup of 1
      (3L, "completely different text about distributed validation engines"),
      (4L, "yet another unrelated document body with its own words entirely"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/docs")
    Runner.main(Array("dupgroups", s"$dir/docs", s"$dir/out"))
    val groups = spark.read.parquet(s"$dir/out/groups")
      .select("doc_id", "group_id", "group_size")
      .as[(Long, Long, Long)].collect()
      .map { case (d, g, s0) => d -> ((g, s0)) }.toMap
    assert(groups(1L) == (1L, 2L) && groups(2L) == (1L, 2L),
      s"docs 1,2 should share group 1 of size 2: $groups")
    assert(groups(3L)._2 == 1L && groups(4L)._2 == 1L, "singletons stay alone")
  }

  test("sessions verb writes per-session summaries at the given gap") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val dir = tmp()
    Seq(
      ("c1", 0, ts("2024-01-01 00:00:00")),
      ("c1", 1, ts("2024-01-01 00:05:00")),
      ("c1", 2, ts("2024-01-01 09:00:00")), // > 1h gap → new session
      ("c2", 0, ts("2024-01-01 00:00:00")))
      .toDF("conv_id", "turn_idx", "ts")
      .write.mode("overwrite").parquet(s"$dir/in")
    Runner.main(Array("sessions", s"$dir/in", s"$dir/out", "3600"))
    val sess = spark.read.parquet(s"$dir/out")
      .select("conv_id", "session_idx", "n_turns")
      .as[(String, Int, Long)].collect().toSet
    assert(sess == Set(("c1", 0, 2L), ("c1", 1, 1L), ("c2", 0, 1L)))
  }
}
