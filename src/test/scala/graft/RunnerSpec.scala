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

  test("diff verb censuses added/removed/changed between two table versions") {
    val dir = tmp()
    Seq((1, 0, "a", "t1"), (1, 1, "b", "t2"), (2, 0, "c", "t3"))
      .toDF("conv_id", "turn_idx", "role", "text")
      .write.mode("overwrite").parquet(s"$dir/old")
    Seq((1, 0, "a", "t1"), (1, 1, "b", "T2-EDITED"), (3, 0, "d", "t4"))
      .toDF("conv_id", "turn_idx", "role", "text")
      .write.mode("overwrite").parquet(s"$dir/new")
    Runner.main(Array("diff", s"$dir/old", s"$dir/new", s"$dir/out"))
    val got = spark.read.parquet(s"$dir/out/changes")
      .select("conv_id", "turn_idx", "change")
      .as[(Int, Int, String)].collect().toSet
    // --compare defaults to every non-key column (role, text)
    assert(got == Set((1, 1, "changed"), (2, 0, "removed"), (3, 0, "added")))
  }

  test("validate --suite runs the configured suite, incl. a config-declared dim") {
    val dir = tmp()
    TranscriptGen.generate(spark, nConvs = 30, baseTurns = 24)
      .write.mode("overwrite").parquet(s"$dir/in")
    // a config-declared dimension that EXCLUDES 'tool' role rows, so the
    // configured referential check must find violations the default
    // suite's role_dim (which includes 'tool') never would
    Seq("system", "user", "assistant").toDF("role")
      .write.mode("overwrite").parquet(s"$dir/roles3")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/suite.yaml"),
      s"""name: configured
         |dims: {roles3: $dir/roles3}
         |constraints:
         |  - {type: not_null, column: conv_id}
         |  - {type: referential, column: role, dim: roles3, dimColumn: role}
         |  - {type: max_session_gap, maxGapSeconds: 86400}
         |  - {type: allowed_transitions, column: role,
         |     allowed: [[user, assistant], [assistant, system],
         |               [system, tool], [tool, user]]}
         |  - {type: monotonic, column: ts}
         |  - {type: no_consecutive_repeats, column: text}
         |  - {type: functional_dependency, determinant: [conv_id],
         |     dependent: role}
         |""".stripMargin.getBytes("UTF-8"))
    Runner.main(Array("validate", s"$dir/in", s"$dir/out",
      "--suite", s"$dir/suite.yaml"))
    val verdicts = spark.read.parquet(s"$dir/out/verdicts")
    val names = verdicts.select("constraint").distinct().as[String]
      .collect().toSet
    assert(names.contains("ref(role->roles3)") &&
      names.contains("session_gap(86400s)"),
      s"configured constraints missing from verdicts: $names")
    // the round-5 sequence/FD constraint types are reachable from config
    assert(names.contains("transitions(role)") &&
      names.contains("monotonic(ts)") &&
      names.contains("no_repeats(text)") &&
      names.contains("fd(conv_id->role)"),
      s"sequence/FD constraints missing from verdicts: $names")
    // the generator's role cycle follows the declared grammar except at
    // injected invalid_role rows — transitions must flag, monotonic(ts)
    // must not (ts is monotone by construction; exact-copy dup rows tie)
    val viol = spark.read.parquet(s"$dir/out/violations")
    assert(viol.where(col("constraint") === "transitions(role)").count() > 0)
    assert(viol.where(col("constraint") === "monotonic(ts)").count() == 0)
    // duplicate-key rows are exact copies → consecutive identical text
    assert(viol.where(col("constraint") === "no_repeats(text)").count() ===
      spark.read.parquet(s"$dir/in")
        .groupBy("conv_id", "turn_idx").count()
        .where(col("count") > 1).count())
    assert(!names.exists(_.startsWith("unique(")),
      "default-suite constraints must not leak into a --suite run")
    // violations = every row outside the 3-role dim: the generator's
    // 'tool' rows plus its injected 'invalid_role' rows (nullOk default)
    val expectedRefViol = spark.read.parquet(s"$dir/in")
      .where(col("role").isNotNull &&
        !col("role").isin("system", "user", "assistant")).count()
    val actualRefViol = spark.read.parquet(s"$dir/out/violations")
      .where(col("constraint") === "ref(role->roles3)").count()
    assert(expectedRefViol > 0 && actualRefViol == expectedRefViol,
      s"config dim should flag the $expectedRefViol 'tool' rows, got $actualRefViol")
  }

  test("validate --suite with a typo'd field refuses to run") {
    val dir = tmp()
    TranscriptGen.generate(spark, nConvs = 5, baseTurns = 4)
      .write.mode("overwrite").parquet(s"$dir/in")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/suite.yaml"),
      """name: s
        |constraints:
        |  - {type: not_null, colum: conv_id}
        |""".stripMargin.getBytes("UTF-8"))
    val ex = intercept[IllegalArgumentException] {
      Runner.main(Array("validate", s"$dir/in", s"$dir/out",
        "--suite", s"$dir/suite.yaml"))
    }
    assert(ex.getMessage.contains("'colum'"))
    assert(!new java.io.File(s"$dir/out/verdicts").exists(),
      "a malformed suite must not fall back to the default suite")
  }

  test("validate with a typo'd flag refuses instead of silently running the default suite") {
    val dir = tmp()
    TranscriptGen.generate(spark, nConvs = 5, baseTurns = 4)
      .write.mode("overwrite").parquet(s"$dir/in")
    val ex = intercept[RuntimeException] {
      Runner.main(Array("validate", s"$dir/in", s"$dir/out",
        "--suit", "whatever.yaml"))
    }
    assert(ex.getMessage.contains("unrecognized validate arguments"), ex.getMessage)
    assert(!new java.io.File(s"$dir/out/verdicts").exists(),
      "a typo'd flag must not fall back to a full default-suite validation")
  }

  test("resumable validate short-circuits a MISSING declared column before any slice") {
    val dir = tmp()
    val df = TranscriptGen.generate(spark, nConvs = 8, baseTurns = 4)
    val check = graft.dsl.Check("t", Seq(
      graft.dsl.NotNull("gone"), // would crash slice analysis if reached
      graft.dsl.ExpectedSchema(Seq("conv_id" -> "string", "gone" -> "double"))))
    val rv = new graft.checkpoint.ResumableValidation(spark, s"$dir/ckpt", 3)
    val Some((vio, ver, metrics)) = rv.run(df, check, withStatsState = false)
    assert(metrics.isEmpty, "no slice may run under schema drift")
    assert(ver.collect().map(_.getAs[String]("constraint")).toSeq ==
      Seq("expected_schema"))
    assert(vio.where(col("observed") === "(missing)").count() == 1)
    assert(!new java.io.File(s"$dir/ckpt").exists(),
      "short-circuit must not stage a checkpoint")
  }

  test("resumable validate evaluates ExpectedSchema once, not per slice") {
    val dir = tmp()
    val df = TranscriptGen.generate(spark, nConvs = 24, baseTurns = 8)
    val check = graft.dsl.Check("t", Seq(
      graft.dsl.NotNull("conv_id"),
      graft.dsl.ExpectedSchema(Seq("conv_id" -> "string",
        "turn_idx" -> "bigint")))) // deliberate type mismatch (int actual)
    val rv = new graft.checkpoint.ResumableValidation(spark, s"$dir/ckpt", 3)
    val Some((vio, ver, _)) = rv.run(df, check, withStatsState = false)
    assert(ver.where(col("constraint") === "expected_schema").count() == 1,
      "one global schema verdict, not one per slice")
    assert(vio.where(col("constraint") === "expected_schema").count() == 1,
      "one schema violation row, not one per slice")
  }

  test("a resumed validate reuses the pinned manifest; a fresh one re-pins") {
    val dir = tmp()
    TranscriptGen.generate(spark, nConvs = 12, baseTurns = 6)
      .write.mode("overwrite").parquet(s"$dir/in")
    Runner.main(Array("validate", s"$dir/in", s"$dir/out",
      "--resumable", s"$dir/ckpt", "2"))
    val manifest = java.nio.file.Paths.get(s"$dir/out/input_manifest.json")
    val pinned = new String(java.nio.file.Files.readAllBytes(manifest), "UTF-8")
    // new files land in the input dir between attempts
    TranscriptGen.generate(spark, nConvs = 4, baseTurns = 3)
      .write.mode("append").parquet(s"$dir/in")
    // the resumed command must see the EXACT snapshot the first attempt
    // pinned — re-pinning would hand the done slices one file set and the
    // global passes another (a hybrid verdict)
    Runner.main(Array("validate", s"$dir/in", s"$dir/out",
      "--resumable", s"$dir/ckpt", "2"))
    val after = new String(java.nio.file.Files.readAllBytes(manifest), "UTF-8")
    assert(after == pinned, "resume must not re-pin the input manifest")
    // a NON-resumable validate on the same out dir re-pins freshly
    Runner.main(Array("validate", s"$dir/in", s"$dir/out"))
    val fresh = new String(java.nio.file.Files.readAllBytes(manifest), "UTF-8")
    assert(fresh != pinned, "a fresh run must re-pin the current file set")
    // a resumable run against an out dir holding SOME earlier manifest
    // but a checkpoint with no committed staging is a FRESH run, not a
    // resume: it must re-pin the CURRENT input instead of silently
    // validating the stale snapshot (r5 ADVICE — reuse gates on
    // checkpoint evidence, not manifest existence)
    TranscriptGen.generate(spark, nConvs = 3, baseTurns = 3)
      .write.mode("append").parquet(s"$dir/in")
    Runner.main(Array("validate", s"$dir/in", s"$dir/out",
      "--resumable", s"$dir/ckpt_new", "2"))
    val repinned = new String(java.nio.file.Files.readAllBytes(manifest), "UTF-8")
    assert(repinned != fresh,
      "a fresh resumable run with an empty checkpoint must re-pin")
  }

  test("pack verb shards STRING ids by hash (col % n would null-shard them all)") {
    val dir = tmp()
    Seq(("doc_a", "a b"), ("doc_b", "a b c"), ("doc_c", "a b c d"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/in")
    Runner.main(Array("pack", s"$dir/in", s"$dir/out", "4", "--shards", "2"))
    val packed = spark.read.parquet(s"$dir/out/packed")
    assert(packed.count() == 3, "every string-id document must be packed")
    assert(packed.where(col("shard").isNull).count() == 0,
      "string ids must hash-shard, never land in a NULL shard")
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

  test("pack verb writes per-shard pack assignments and fill census") {
    val dir = tmp()
    // one shard (--shards 1), capacity 4 ws-tokens: docs of 2/3/4 tokens
    // pack next-fit as [d0], [d1], [d2]... 2+3 > 4 splits, 4 fits alone
    Seq((0L, "a b"), (1L, "a b c"), (2L, "a b c d"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/in")
    Runner.main(Array("pack", s"$dir/in", s"$dir/out", "4", "--shards", "1"))
    val packed = spark.read.parquet(s"$dir/out/packed")
      .select("doc_id", "pack_idx").as[(Long, Int)].collect().toMap
    assert(packed == Map(0L -> 0, 1L -> 1, 2L -> 2), s"got $packed")
    assert(!packed.isEmpty && !spark.read.parquet(s"$dir/out/packed")
      .columns.contains("__tok"), "internal token column must not leak")
    val fills = spark.read.parquet(s"$dir/out/packs")
      .select("pack_idx", "n_rows", "pack_tokens", "fill_ratio")
      .as[(Int, Long, Long, Double)].collect().toSet
    assert(fills == Set((0, 1L, 2L, 0.5), (1, 1L, 3L, 0.75), (2, 1L, 4L, 1.0)),
      s"got $fills")
  }

  test("suggest verb writes a starter suite that validate --suite runs as-is") {
    val dir = tmp()
    TranscriptGen.generate(spark, nConvs = 20, baseTurns = 12)
      .write.mode("overwrite").parquet(s"$dir/in")
    Runner.main(Array("suggest", s"$dir/in", s"$dir/suite.yaml"))
    val check = graft.dsl.SuiteConfig.load(s"$dir/suite.yaml")
    assert(check.constraints.nonEmpty, "suggestion produced no constraints")
    // the full no-Scala loop: the generated YAML is directly runnable
    Runner.main(Array("validate", s"$dir/in", s"$dir/out",
      "--suite", s"$dir/suite.yaml"))
    assert(spark.read.parquet(s"$dir/out/verdicts").count() > 0)
  }

  test("suggest --sample profiles exactly the deterministic sample") {
    val dir = tmp()
    val full = TranscriptGen.generate(spark, nConvs = 40, baseTurns = 12)
    full.write.mode("overwrite").parquet(s"$dir/in")
    Runner.main(Array("suggest", s"$dir/in", s"$dir/sampled.yaml",
      "--sample", "0.5"))
    val sampledCheck = graft.dsl.SuiteConfig.load(s"$dir/sampled.yaml")
    assert(sampledCheck.constraints.nonEmpty)
    // the verb's output equals suggest() over the recomputed sample —
    // the sample is engine-deterministic, so this is exact equality
    val expected = graft.compile.Suggestions.toCheck("suggested",
      graft.compile.Suggestions.suggest(
        graft.sample.Sampling.uniform(
          spark.read.parquet(s"$dir/in"), "conv_id", 0.5)))
    assert(sampledCheck.constraints == expected.constraints,
      s"${sampledCheck.constraints} vs ${expected.constraints}")
    // and the sampled suite still runs as-is
    Runner.main(Array("validate", s"$dir/in", s"$dir/out2",
      "--suite", s"$dir/sampled.yaml"))
    assert(spark.read.parquet(s"$dir/out2/verdicts").count() > 0)
  }

  test("validate --metrics-dir appends run metrics and flags the cross-run violation jump") {
    val dir = tmp()
    val clean = TranscriptGen.generate(spark, nConvs = 20, baseTurns = 12)
    clean.write.mode("overwrite").parquet(s"$dir/in1")
    // second run: same data plus 40 replayed turns -> duplicate-key
    // violations jump from 0 to many, a rate-of-change anomaly
    clean.union(clean.limit(40))
      .write.mode("overwrite").parquet(s"$dir/in2")
    Runner.main(Array("validate", s"$dir/in1", s"$dir/out1",
      "--metrics-dir", s"$dir/hist", "--run-id", "r001"))
    Runner.main(Array("validate", s"$dir/in2", s"$dir/out2",
      "--metrics-dir", s"$dir/hist", "--run-id", "r002"))
    val hist = spark.read.parquet(s"$dir/hist")
    assert(hist.select("run_id").distinct().as[String].collect().toSet ==
      Set("r001", "r002"))
    val anomalies = spark.read.parquet(s"$dir/out2/metric_anomalies")
    val flagged = anomalies.select("run_id", "constraint", "metric")
      .as[(String, String, String)].collect().toSet
    assert(flagged.exists { case (run, c, m) =>
      run == "r002" && c.startsWith("unique") && m == "violations" },
      s"the duplicate-key violation jump should flag on r002: $flagged")
    assert(!flagged.exists(_._1 == "r001"),
      "the first run has no baseline and must never flag")
    // a third run at the SAME level must go quiet: the anomalies artifact
    // is scoped to the current run, not a full-history recompute that
    // re-alerts r002's jump forever
    Runner.main(Array("validate", s"$dir/in2", s"$dir/out3",
      "--metrics-dir", s"$dir/hist", "--run-id", "r003"))
    assert(spark.read.parquet(s"$dir/out3/metric_anomalies").count() == 0,
      "an already-seen jump must not re-alert on a later steady run")
    // the audit verb replays BOTH analytics over the whole history —
    // r002's jump is visible there (that's the point of the audit view)
    Runner.main(Array("history", s"$dir/hist", s"$dir/audit"))
    val jumps = spark.read.parquet(s"$dir/audit/rate_of_change")
    assert(jumps.where(col("run_id") === "r002").count() > 0)
    assert(new java.io.File(s"$dir/audit/trailing_z").exists())
  }

  test("simple verbs refuse typo'd flags instead of silently running defaults") {
    val dir = tmp()
    val ex = intercept[RuntimeException] {
      Runner.main(Array("history", s"$dir/nope", s"$dir/out",
        "--max-re", "0.9")) // typo for --max-rel
    }
    assert(ex.getMessage.contains("--max-re") &&
      ex.getMessage.contains("unrecognized"))
    val ex2 = intercept[RuntimeException] {
      Runner.main(Array("dupgroups", s"$dir/nope", s"$dir/out", "--threshold"))
    }
    assert(ex2.getMessage.contains("requires a value"))
  }
}
