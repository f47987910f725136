package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Report sinks (SURVEY §2.1 S7/S8): render a validation run's verdicts +
  * violations into a human-readable markdown / HTML report, mirroring the
  * reference's templated HTML report sections — summary, per-method table,
  * per-monitor-point table, recommendations
  * (reference `src/main_analysis.py:445-519`, report dict assembled at
  * `src/geological_anomaly_detector.py:388-481`).
  *
  * Scale discipline: everything collected to the driver is an AGGREGATE
  * (one row per constraint, top-K failing partitions, top-K violation
  * samples) — never per-turn data. The heavy lifting stays in Spark
  * aggregations; the formatter only stringifies the small result.
  */
object Reports {

  final case class ConstraintRollup(constraint: String, partitions: Long,
      failedPartitions: Long, violations: Long, worstRate: Double)

  final case class PartitionRow(partitionKey: String, constraint: String,
      rows: Long, violations: Long, violationRate: Double)

  final case class Report(totalPartitions: Long, failedPartitions: Long,
      totalViolations: Long, byConstraint: Seq[ConstraintRollup],
      worstPartitions: Seq[PartitionRow], recommendations: Seq[String])

  /** Aggregate verdicts into the report model. `topK` bounds every
    * driver-side collection.
    */
  def build(verdicts: DataFrame, topK: Int = 20): Report = {
    val spark = verdicts.sparkSession
    import spark.implicits._

    // exact count_distinct for BOTH totals: mixing approx (total) with exact
    // (failed) can skew failedFrac past 1 and flip the recommendation
    // thresholds. The aggregate is one driver row either way.
    val summary = verdicts.agg(
      count_distinct(col("partition_key")).as("parts"),
      count_distinct(when(!col("pass"), col("partition_key"))).as("failed"))
      .collect().head
    val byConstraint = verdicts.groupBy(col("constraint")).agg(
        count(lit(1)).as("partitions"),
        sum(when(!col("pass"), 1L).otherwise(0L)).as("failed_partitions"),
        // a family emitting per-key rows AND a '(global)' total row under
        // ONE name (MaxKeyShare) must count the global total once, not
        // the sum of both
        coalesce(
          when(max(when(col("partition_key") === "(global)", 1)
            .otherwise(0)) === 1,
            sum(when(col("partition_key") === "(global)", col("violations")))),
          sum(col("violations"))).as("violations"),
        max(col("violation_rate")).as("worst_rate"))
      .orderBy(desc("failed_partitions"), desc("violations"), col("constraint"))
      .as[(String, Long, Long, Long, Double)].collect().toSeq
      .map(ConstraintRollup.tupled)
    // the headline total sums each constraint ONCE: the rate-bound
    // families re-state their per-conversation counts in a separate
    // "name[global]" verdict row — summing both printed ~2x the
    // violations parquet the user compares against
    val totalViolations = byConstraint
      .filterNot(_.constraint.endsWith("[global]"))
      .map(_.violations).sum
    val worst = verdicts.where(!col("pass"))
      .orderBy(desc("violation_rate"), desc("violations"), col("partition_key"),
        col("constraint"))
      .limit(topK)
      .select(col("partition_key"), col("constraint"), col("rows"),
        col("violations"), col("violation_rate"))
      .as[(String, String, Long, Long, Double)].collect().toSeq
      .map(PartitionRow.tupled)

    // recommendations in the reference's spirit (threshold-bucketed advice,
    // src/geological_anomaly_detector.py:456-481): derived from rates only
    val failedFrac =
      if (summary.getLong(0) == 0) 0.0
      else summary.getLong(1).toDouble / summary.getLong(0)
    val recs = Seq(
      if (failedFrac > 0.5)
        Some(fmt("High failure rate (%.1f%% of partitions): ",
          failedFrac * 100) +
          "suspect a systemic upstream change (schema drift, producer bug) " +
          "rather than isolated bad conversations.")
      else None,
      // Validator emits "ref(col->dim)" (Constraints.ReferentialIntegrity.name)
      byConstraint.find(c => c.constraint.startsWith("ref(") &&
          c.violations > 0).map(c =>
        s"${c.constraint}: ${c.violations} rows reference unknown dimension " +
          "values — refresh the role/tool dimension tables or quarantine the " +
          "producing pipeline."),
      // "unique(" exactly: "uniqueness(...)" is the RATIO bound, a
      // different constraint with a different remedy; the key columns
      // come from the constraint's own name, not a hardcoded default
      byConstraint.find(c => c.constraint.startsWith("unique(") &&
          c.violations > 0).map(c =>
        s"${c.constraint}: duplicate key tuples — check for " +
          "at-least-once replays in ingestion."),
      if (failedFrac == 0.0) Some("All partitions passed — no action needed.")
      else None).flatten

    Report(summary.getLong(0), summary.getLong(1), totalViolations,
      byConstraint, worst, recs)
  }

  /** Locale-pinned printf: a comma-decimal default locale would corrupt
    * SVG width attributes and every percentage in the report.
    */
  private def fmt(pattern: String, args: Any*): String =
    pattern.formatLocal(java.util.Locale.ROOT,
      args.map(_.asInstanceOf[AnyRef]): _*)

  private def fmtRate(r: Double): String = fmt("%.3f%%", r * 100)

  /** Markdown rendering (the engine-side analog of the reference's text
    * report sections).
    */
  def markdown(r: Report, title: String = "Validation report"): String = {
    val sb = new StringBuilder
    sb ++= s"# $title\n\n"
    sb ++= "## Summary\n\n"
    sb ++= s"- partitions checked: ${r.totalPartitions}\n"
    sb ++= s"- partitions failed: ${r.failedPartitions}\n"
    sb ++= s"- total violations: ${r.totalViolations}\n\n"
    sb ++= "## By constraint\n\n"
    sb ++= "| constraint | partitions | failed | violations | worst rate |\n"
    sb ++= "|---|---|---|---|---|\n"
    r.byConstraint.foreach { c =>
      sb ++= s"| ${mdCell(c.constraint)} | ${c.partitions} | ${c.failedPartitions} " +
        s"| ${c.violations} | ${fmtRate(c.worstRate)} |\n"
    }
    sb ++= "\n## Worst failing partitions\n\n"
    if (r.worstPartitions.isEmpty) sb ++= "(none)\n"
    else {
      sb ++= "| partition | constraint | rows | violations | rate |\n"
      sb ++= "|---|---|---|---|---|\n"
      r.worstPartitions.foreach { p =>
        sb ++= s"| ${mdCell(p.partitionKey)} | ${mdCell(p.constraint)} | ${p.rows} " +
          s"| ${p.violations} | ${fmtRate(p.violationRate)} |\n"
      }
    }
    sb ++= "\n## Recommendations\n\n"
    r.recommendations.foreach(rec => sb ++= s"- $rec\n")
    sb.result()
  }

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** A partition key / constraint name from arbitrary data must not break
    * the markdown table: escape pipes, flatten newlines.
    */
  private def mdCell(s: String): String =
    s.replace("|", "\\|").replace("\n", " ").replace("\r", " ")

  /** S9 figure sink, dependency-free: a horizontal bar chart as inline SVG
    * (the engine-side analog of the reference's matplotlib PNGs,
    * `src/main_analysis.py:305-412` — rendered from the already-bounded
    * report aggregates, so no driver-side data beyond the report model).
    */
  private[report] def svgBars(title: String,
      bars: Seq[(String, Double)], unit: String = ""): String = {
    if (bars.isEmpty) return ""
    val w = 640
    val barH = 22
    val gap = 6
    val labelW = 240
    val maxV = math.max(bars.map(_._2).max, 1e-12)
    val h = bars.size * (barH + gap) + 40
    val rects = bars.zipWithIndex.map { case ((label, v), i) =>
      val y = 30 + i * (barH + gap)
      val bw = math.max(1.0, (w - labelW - 90) * v / maxV)
      s"""<text x="${labelW - 8}" y="${y + 15}" text-anchor="end" font-size="12">${esc(label)}</text>""" +
        s"""<rect x="$labelW" y="$y" width="${fmt("%.1f", bw)}" height="$barH" fill="#4878a8"/>""" +
        s"""<text x="${fmt("%.1f", labelW + bw + 6)}" y="${y + 15}" font-size="12">${esc(fmtNum(v))}$unit</text>"""
    }.mkString
    s"""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 $w $h" width="$w" height="$h" role="img">""" +
      s"""<text x="0" y="16" font-size="14" font-weight="bold">${esc(title)}</text>$rects</svg>"""
  }

  private def fmtNum(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else fmt("%.4f", v)

  /** HTML rendering (reference's HTML sink shape,
    * `src/main_analysis.py:445-519`: embedded style + one table per
    * section).
    */
  def html(r: Report, title: String = "Validation report"): String = {
    def table(headers: Seq[String], rows: Seq[Seq[String]]): String =
      s"<table><tr>${headers.map(h => s"<th>${esc(h)}</th>").mkString}</tr>" +
        rows.map(cells =>
          s"<tr>${cells.map(c => s"<td>${esc(c)}</td>").mkString}</tr>")
          .mkString + "</table>"
    val byC = table(
      Seq("constraint", "partitions", "failed", "violations", "worst rate"),
      r.byConstraint.map(c => Seq(c.constraint, c.partitions.toString,
        c.failedPartitions.toString, c.violations.toString,
        fmtRate(c.worstRate))))
    val worst =
      if (r.worstPartitions.isEmpty) "<p>(none)</p>"
      else table(Seq("partition", "constraint", "rows", "violations", "rate"),
        r.worstPartitions.map(p => Seq(p.partitionKey, p.constraint,
          p.rows.toString, p.violations.toString, fmtRate(p.violationRate))))
    // S9 figures: violations + worst-rate bars from the bounded aggregates
    val figViolations = svgBars("Violations by constraint",
      r.byConstraint.map(c => c.constraint -> c.violations.toDouble))
    val figRates = svgBars("Worst failing partitions (violation rate)",
      r.worstPartitions.map(p =>
        s"${p.partitionKey} · ${p.constraint}" -> p.violationRate))
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>
       |body { font-family: sans-serif; margin: 2em; }
       |table { border-collapse: collapse; margin: 1em 0; }
       |th, td { border: 1px solid #999; padding: 4px 10px; text-align: left; }
       |th { background: #eee; }
       |</style></head><body>
       |<h1>${esc(title)}</h1>
       |<h2>Summary</h2>
       |<ul>
       |<li>partitions checked: ${r.totalPartitions}</li>
       |<li>partitions failed: ${r.failedPartitions}</li>
       |<li>total violations: ${r.totalViolations}</li>
       |</ul>
       |<h2>By constraint</h2>
       |$byC
       |$figViolations
       |<h2>Worst failing partitions</h2>
       |$worst
       |$figRates
       |<h2>Recommendations</h2>
       |<ul>${r.recommendations.map(x => s"<li>${esc(x)}</li>").mkString}</ul>
       |</body></html>
       |""".stripMargin
  }
}
