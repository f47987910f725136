package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.checkpoint.{ResumableValidation, SnapshotTable}
import graft.compile.Validator
import graft.dsl._
import graft.sources.{Tables, TranscriptGen}

/** spark-submit entry point:
  *
  *   graft.Runner validate <transcripts-parquet> <out-dir>
  *       [--resumable <ckpt-dir> <P>] [--format csv] [--sample <rate>]
  *       [--suite <yaml-or-json-file>]
  *   graft.Runner generate <n-convs> <out-parquet>
  *   graft.Runner dupgroups <docs-parquet> <out-dir>
  *       [--id doc_id] [--text text] [--threshold 0.7]
  *   graft.Runner sessions <transcripts-parquet> <out-parquet> <gap-seconds>
  *   graft.Runner pack <docs-parquet> <out-dir> <capacity-tokens>
  *       [--id doc_id] [--text text] [--shards 8]
  *   graft.Runner suggest <parquet> <suite.yaml>
  *       [--max-set 20] [--name suggested] [--key conv_id]
  *       [--order turn_idx] [--ts ts] [--sample <rate>]
  *   graft.Runner history <metrics-dir> <out-dir>
  *       [--max-rel 0.5] [--z-window 5] [--z-threshold 3.0]
  *   graft.Runner diff <old-parquet> <new-parquet> <out-dir>
  *       [--keys conv_id,turn_idx] [--compare <cols>]
  *
  * `validate` pins the input file set (snapshot manifest), runs the default
  * transcript suite, writes violations/verdicts parquet + a JSON summary.
  * With --resumable it runs through the per-partition checkpoint (restart
  * the same command to resume after a kill); --sample validates a
  * deterministic whole-conversation sample; --suite swaps the hardcoded
  * suite for one parsed from a YAML/JSON config ([[graft.dsl.SuiteConfig]] —
  * the reference's config-driven surface), whose `dims:` paths are loaded
  * and registered on top of the built-in role/tool dims. `dupgroups`,
  * `sessions` and `pack` expose the dedup-grouping, sessionization and
  * sequence-packing pipelines without Scala.
  */
object Runner {

  /** STRICT `--name value` parsing for the simple verbs: an unrecognized
    * or typo'd flag refuses (it would otherwise silently run with the
    * default in place of what the user asked for — the same contract as
    * SuiteConfig's unknown-field rejection), as does a flag missing its
    * value.
    */
  private def parseFlags(args: List[String], allowed: Set[String])
      : Map[String, String] = {
    @scala.annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String])
        : Map[String, String] = rest match {
      case Nil => acc
      case name :: value :: tail if allowed(name) =>
        loop(tail, acc + (name -> value))
      case name :: Nil if allowed(name) =>
        sys.error(s"$name requires a value argument")
      case other :: _ =>
        sys.error(s"unrecognized flag '$other' (supported: " +
          allowed.toSeq.sorted.mkString(", ") + ")")
    }
    loop(args, Map.empty)
  }

  def defaultSuite: Check = Check("transcripts", Seq(
    // schema tripwire first: pure plan metadata, zero data scans —
    // upstream drift (renamed/retyped/ADDED columns: allowExtra = false)
    // fails loudly before anything is read; a rename short-circuits the
    // whole suite to the schema verdict instead of an unresolved-column
    // crash. Users validating enriched tables override via --suite.
    ExpectedSchema(Seq("conv_id" -> "string", "turn_idx" -> "int",
      "role" -> "string", "text" -> "string", "tool" -> "string",
      "ts" -> "timestamp"), allowExtra = false),
    NotNull("conv_id"), NotNull("text"),
    UniqueKey(Seq("conv_id", "turn_idx")),
    ReferentialIntegrity("role", "role_dim", "role"),
    ReferentialIntegrity("tool", "tool_dim", "tool"),
    MatchesRegex("conv_id", "^conv_[0-9]{8}$"),
    ValueBounds("turn_idx", Some(0), None),
    MinRows(1),
    DistinctCountBetween("conv_id", 1, Long.MaxValue),
    TurnRateDrift(bucket = "1 hour", period = 24, method = "stl",
      seasonal = 7, residThreshold = 3.0)))

  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .appName("graft-runner")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
    // spark-submit injects spark.master; default to local for direct runs
    // tests drive main() directly against their shared session — only stop
    // a session this main actually created
    val adopted = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.toList match {
      case "generate" :: n :: out :: Nil =>
        TranscriptGen.generate(spark, n.toLong).write.mode("overwrite").parquet(out)
        println(s"""{"generated": "$out", "convs": $n}""")

      case "validate" :: in :: out :: restWithFlags =>
        // S6: --format csv additionally writes the violation rows as the
        // reference's detailed_results.csv (src/main_analysis.py:430-438)
        val csvSink = restWithFlags.containsSlice(Seq("--format", "csv"))
        val restWithFmt = {
          val i = restWithFlags.indexOfSlice(Seq("--format", "csv"))
          if (i < 0) restWithFlags else restWithFlags.patch(i, Nil, 2)
        }
        // ONE value-flag extractor for every <flag> <value> pair (three
        // hand-rolled copies of this indexOf/patch block diverged on the
        // missing-value error contract before it was hoisted)
        def takeValueFlag(args: List[String], name: String,
            missingMsg: String = ""): (Option[String], List[String]) = {
          val i = args.indexOf(name)
          if (i < 0) (None, args)
          else if (i + 1 < args.length)
            (Some(args(i + 1)), args.patch(i, Nil, 2))
          else sys.error(if (missingMsg.nonEmpty) missingMsg
            else s"$name requires a value argument")
        }
        // --sample <rate>: validate a deterministic whole-conversation
        // sample (graft.sample.Sampling — salted-md5 threshold, pure
        // codegen filter; the same conversations are selected on every
        // engine and every run, so a sampled validation is reproducible)
        val (sampleOpt, restNoSample) = takeValueFlag(restWithFmt, "--sample",
          "--sample requires a rate argument (e.g. --sample 0.01); " +
            "refusing to silently run a FULL validation")
        val sampleRate = sampleOpt.map(_.toDouble)
        // --suite <file>: the config-driven surface — YAML/JSON parsed to
        // the same Constraint ADT the Scala API uses, strict on typos
        val (suitePath, restNoSuite) = takeValueFlag(restNoSample, "--suite",
          "--suite requires a config-file path argument")
        // --metrics-dir <dir> [--run-id <id>]: append this run's
        // per-constraint metrics to a cross-run history and emit
        // rate-of-change anomalies vs that history (checkpoint.MetricHistory)
        val (metricsDir, restNoMetrics) =
          takeValueFlag(restNoSuite, "--metrics-dir")
        val (runIdOpt, rest) = takeValueFlag(restNoMetrics, "--run-id")
        val (suite, configDims) = suitePath.map(SuiteConfig.loadWithDims)
          .getOrElse((defaultSuite, Map.empty[String, String]))
        val ctx = Validator.Context(Map(
          "role_dim" -> Tables.roleDim(spark),
          "tool_dim" -> Tables.toolDim(spark)) ++
          configDims.view.mapValues(spark.read.parquet(_)).toMap)
        // snapshot-pin the input so a resumed run sees identical files;
        // `provider` is the catalog seam — swap in an Iceberg provider and
        // the pin becomes a snapshot id instead of a file list
        val provider: graft.sources.TableProvider = graft.sources.ParquetDirProvider
        val manifest = s"$out/input_manifest.json"
        // a RESUMED run must reuse the manifest its first attempt pinned:
        // re-pinning would hand the already-done slices one snapshot and
        // the global-scoped/schema passes another — a hybrid verdict over
        // two file sets, the exact thing the pin exists to prevent.
        // "Resumed" is gated on CHECKPOINT evidence (staged slices or a
        // started staging dir), not on the manifest file alone: a FRESH
        // resumable run pointed at an out dir holding a manifest from some
        // earlier run must re-pin the CURRENT input, not silently validate
        // the stale snapshot (r5 ADVICE)
        // evidence = completed staging (slices only run after staging
        // commits, so no _DONE work can exist without it); an attempt
        // that died before staging committed consumed nothing from its
        // pin and re-pinning is consistent — staging is redone from the
        // fresh pin either way
        val ckptStarted = rest match {
          case "--resumable" :: ckpt :: _ =>
            java.nio.file.Files.exists(
              java.nio.file.Paths.get(s"$ckpt/staging/_SUCCESS"))
          case _ => false
        }
        val resuming = rest.headOption.contains("--resumable") &&
          ckptStarted &&
          java.nio.file.Files.exists(java.nio.file.Paths.get(manifest))
        if (!resuming) provider.pin(spark, in, manifest)
        val pinnedAll = provider.readPinned(spark, manifest)
        val pinned = sampleRate match {
          case Some(r) => graft.sample.Sampling
            .uniform(pinnedAll, suite.keyCol, r)
          case None => pinnedAll
        }
        val t0 = System.nanoTime()
        val (violations, verdicts) = rest match {
          case "--resumable" :: ckpt :: p :: Nil =>
            // refuse here: P=0 would otherwise surface deep inside
            // collectResults as an unrelated "unable to infer schema"
            require(p.toInt >= 1,
              s"--resumable partition count must be >= 1, got $p")
            val rv = new ResumableValidation(spark, ckpt, p.toInt)
            val Some((vio, ver, metrics)) = rv.run(pinned, suite, ctx)
            println(metrics.map(m =>
              s"""{"partition":${m.partition},"rows":${m.rows},"violations":${m.violations},"wall_ms":${m.wallMs}}""")
              .mkString("[", ",", "]"))
            (vio, ver)
          case Nil =>
            val r = Validator.validate(pinned, suite, ctx)
            (r.violations, r.verdicts)
          // a typo'd flag (--suit, --samle) must not silently run a FULL
          // default-suite validation in place of what the user asked for
          case other => sys.error("unrecognized validate arguments: " +
            other.mkString(" ") + " (supported: --resumable <ckpt> <P>, " +
            "--format csv, --sample <rate>, --suite <file>, " +
            "--metrics-dir <dir>, --run-id <id>)")
        }
        violations.write.mode("overwrite").parquet(s"$out/violations")
        verdicts.write.mode("overwrite").parquet(s"$out/verdicts")
        if (csvSink)
          spark.read.parquet(s"$out/violations")
            .coalesce(1) // one human-readable file, like the reference's csv
            .write.mode("overwrite").option("header", "true")
            .csv(s"$out/detailed_results.csv")
        // human-readable report sinks (reference S7/S8 analogs)
        val report = graft.report.Reports.build(
          spark.read.parquet(s"$out/verdicts"))
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/report.md"),
          graft.report.Reports.markdown(report).getBytes("UTF-8"))
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/report.html"),
          graft.report.Reports.html(report).getBytes("UTF-8"))
        // cross-run metric history: append THIS run, then flag
        // run-over-run metric jumps against everything appended before it
        metricsDir.foreach { md =>
          val runId = runIdOpt.getOrElse(
            java.time.Instant.now().toString.replace(":", "-"))
          graft.checkpoint.MetricHistory.append(md, runId,
            new java.sql.Timestamp(System.currentTimeMillis()),
            graft.checkpoint.MetricHistory.fromVerdicts(
              spark.read.parquet(s"$out/verdicts")))
          // flags scoped to THIS run: the full-history recompute would
          // re-alert every old jump on every later clean run — a CI gate
          // on the count must go quiet once the jump has been seen
          val anomalies = graft.checkpoint.MetricHistory.rateOfChange(
            graft.checkpoint.MetricHistory.load(spark, md), maxRel = 0.5)
            .where(col("run_id") === runId)
          anomalies.write.mode("overwrite")
            .parquet(s"$out/metric_anomalies")
          val nAnom = spark.read.parquet(s"$out/metric_anomalies").count()
          println(s"""{"metrics_run_id":"$runId","metric_anomalies":$nAnom}""")
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val rows = pinned.count()
        val nViol = spark.read.parquet(s"$out/violations").count()
        val nFail = spark.read.parquet(s"$out/verdicts")
          .where(!col("pass")).count()
        println(s"""{"rows":$rows,"violations":$nViol,"failed_verdicts":$nFail,"wall_sec":$wall,"turns_per_sec":${rows / wall}}""")

      // metric-history audit as a spark-submit verb: both cross-run
      // analytics (rate-of-change jumps and trailing-z level shifts) over
      // a --metrics-dir history, written beside each other
      case "history" :: metricsDir :: out :: flags =>
        val f = parseFlags(flags,
          Set("--max-rel", "--z-window", "--z-threshold"))
        def flag(name: String, dflt: String): String = f.getOrElse(name, dflt)
        val hist = graft.checkpoint.MetricHistory.load(spark, metricsDir)
        val jumps = graft.checkpoint.MetricHistory.rateOfChange(hist,
          maxRel = flag("--max-rel", "0.5").toDouble)
        val shifts = graft.checkpoint.MetricHistory.trailingZ(hist,
          window = flag("--z-window", "5").toInt,
          threshold = flag("--z-threshold", "3.0").toDouble)
        jumps.write.mode("overwrite").parquet(s"$out/rate_of_change")
        shifts.write.mode("overwrite").parquet(s"$out/trailing_z")
        val nj = spark.read.parquet(s"$out/rate_of_change").count()
        val ns = spark.read.parquet(s"$out/trailing_z").count()
        println(s"""{"rate_of_change_anomalies":$nj,"trailing_z_anomalies":$ns}""")

      // constraint suggestion as a spark-submit verb: profile a blessed
      // snapshot, write a starter suite YAML that `validate --suite` runs
      // as-is — the full profile -> config -> validate loop with no Scala
      case "suggest" :: in :: outYaml :: flags =>
        val f = parseFlags(flags,
          Set("--max-set", "--name", "--key", "--order", "--ts", "--sample"))
        def flag(name: String, dflt: String): String = f.getOrElse(name, dflt)
        val full = spark.read.parquet(in)
        // --sample <rate>: profile a deterministic whole-conversation
        // sample (the documented 10^12-turn path — suggestion thresholds
        // are heuristics, so sampling is sound here in a way it never is
        // for the validator; same Sampling.uniform as `validate --sample`,
        // keyed on --key so sampled conversations stay whole)
        val df = f.get("--sample").map(r =>
          graft.sample.Sampling.uniform(full, flag("--key", "conv_id"),
            r.toDouble)).getOrElse(full)
        val suggested = graft.compile.Suggestions.suggest(df,
          maxSetSize = flag("--max-set", "20").toInt)
        val check = graft.compile.Suggestions.toCheck(
          flag("--name", "suggested"), suggested,
          keyCol = flag("--key", "conv_id"),
          orderCol = flag("--order", "turn_idx"),
          tsCol = flag("--ts", "ts"))
        java.nio.file.Files.write(java.nio.file.Paths.get(outYaml),
          SuiteConfig.render(check).getBytes("UTF-8"))
        println(s"""{"suggested": ${check.constraints.size}, "suite": "$outYaml"}""")

      // full dedup pipeline as a spark-submit verb (no Scala needed):
      // minhash → LSH banding → exact-Jaccard verify → connected
      // components → canonical (group_id, group_size) per document
      case "dupgroups" :: in :: out :: flags =>
        val f = parseFlags(flags, Set("--id", "--text", "--threshold"))
        def flag(name: String, dflt: String): String = f.getOrElse(name, dflt)
        val idCol = flag("--id", "doc_id")
        val textCol = flag("--text", "text")
        val docs = spark.read.parquet(in)
        graft.dedup.ConnectedComponents
          .dupGroups(docs, idCol, textCol,
            threshold = flag("--threshold", "0.7").toDouble)
          .write.mode("overwrite").parquet(s"$out/groups")
        val g = spark.read.parquet(s"$out/groups")
        val Array(nDocs, nDup) = g.agg(count(lit(1)),
          count(when(col("group_size") > 1, 1))).collect()(0)
          .toSeq.map(_.asInstanceOf[Long]).toArray
        val nGroups = g.select("group_id").distinct().count()
        println(s"""{"docs":$nDocs,"dup_docs":$nDup,"groups":$nGroups,"out":"$out/groups"}""")

      // gap sessionization as a verb: per-session summary rows
      case "sessions" :: in :: out :: gapSec :: Nil =>
        graft.series.Sessions.sessionize(spark.read.parquet(in),
            "conv_id", "ts", "turn_idx", gapSec.toLong)
          .write.mode("overwrite").parquet(out)
        val n = spark.read.parquet(out).count()
        println(s"""{"sessions":$n,"out":"$out"}""")

      // token-budget sequence packing as a verb: documents next-fit packed
      // into `capacity`-token context windows per shard (id mod shards),
      // whitespace-token counts from the text column
      case "pack" :: in :: out :: capacity :: rest =>
        val f = parseFlags(rest, Set("--id", "--text", "--shards"))
        def flag(name: String, dflt: String): String = f.getOrElse(name, dflt)
        val id = flag("--id", "doc_id")
        val cap = capacity.toLong
        val shards = flag("--shards", "8").toInt
        require(shards >= 1, s"--shards must be >= 1, got $shards")
        // hash shard (the Checkpoint.stage idiom): `col % shards` is NULL
        // for string ids — every document would land in one NULL shard,
        // silently defeating the per-shard parallelism — and negative for
        // negative numeric ids
        val d = spark.read.parquet(in)
          .withColumn("shard",
            pmod(xxhash64(col(id)), lit(shards)).cast("int"))
          .withColumn("__tok",
            graft.text.TextAnalysis.tokenCount(col(flag("--text", "text"))))
        // ONE packing pass: the summary reads the same packed frame
        // instead of re-running the repartition+sort+pack a second time
        val packed = graft.pack.Packing.nextFitPack(d, "shard", id, "__tok", cap)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        packed.drop("__tok")
          .write.mode("overwrite").parquet(s"$out/packed")
        val fill = graft.pack.Packing.packSummaryOf(packed, "shard", "__tok", cap)
        fill.write.mode("overwrite").parquet(s"$out/packs")
        packed.unpersist()
        val Array(nPacks, meanFill) = spark.read.parquet(s"$out/packs")
          .agg(count(lit(1)).cast("double"), avg(col("fill_ratio")))
          .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
        println(s"""{"packs":${nPacks.toLong},"mean_fill":$meanFill,"out":"$out"}""")

      // keyed snapshot diff as a verb: what changed between the table
      // version we validated and this one — change rows + the census
      case "diff" :: oldIn :: newIn :: out :: flags =>
        val f = parseFlags(flags, Set("--keys", "--compare"))
        def flag(name: String, dflt: String): String = f.getOrElse(name, dflt)
        val keys = flag("--keys", "conv_id,turn_idx").split(",").toSeq
        val oldDf = spark.read.parquet(oldIn)
        val compare = flag("--compare",
          oldDf.columns.filterNot(keys.contains).mkString(","))
          .split(",").toSeq
        graft.diff.SnapshotDiff.diff(oldDf, spark.read.parquet(newIn),
            keys, compare)
          .write.mode("overwrite").parquet(s"$out/changes")
        val census = spark.read.parquet(s"$out/changes")
          .groupBy("change").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        println(s"""{"added":${census.getOrElse("added", 0L)},"removed":${
          census.getOrElse("removed", 0L)},"changed":${
          census.getOrElse("changed", 0L)},"out":"$out/changes"}""")

      case other =>
        System.err.println(s"unknown args: $other")
        sys.exit(2)
    }
    if (!adopted) spark.stop()
  }
}
