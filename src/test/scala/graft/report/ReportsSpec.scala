package graft.report

import graft.GraftSuite

class ReportsSpec extends GraftSuite {
  import spark.implicits._

  // verdict rows: (partition_key, constraint, pass, rows, violations, rate)
  private def verdicts = Seq(
    ("conv_1", "not_null(text)", true, 100L, 0L, 0.0),
    ("conv_1", "unique(conv_id,turn_idx)", false, 100L, 4L, 0.04),
    ("conv_2", "not_null(text)", false, 50L, 5L, 0.10),
    ("conv_2", "unique(conv_id,turn_idx)", true, 50L, 0L, 0.0),
    ("conv_3", "not_null(text)", true, 10L, 0L, 0.0),
    ("conv_3", "unique(conv_id,turn_idx)", true, 10L, 0L, 0.0))
    .toDF("partition_key", "constraint", "pass", "rows", "violations",
      "violation_rate")

  test("build aggregates verdicts into the report model") {
    val r = Reports.build(verdicts)
    assert(r.totalPartitions == 3)
    assert(r.failedPartitions == 2) // conv_1 and conv_2 each fail one
    assert(r.totalViolations == 9)
    assert(r.byConstraint.size == 2)
    val byName = r.byConstraint.map(c => c.constraint -> c).toMap
    assert(byName("not_null(text)").failedPartitions == 1)
    assert(byName("not_null(text)").violations == 5)
    assert(byName("unique(conv_id,turn_idx)").worstRate == 0.04)
    // worst partitions sorted by rate desc
    assert(r.worstPartitions.map(_.partitionKey) == Seq("conv_2", "conv_1"))
    assert(r.recommendations.exists(_.contains("duplicate")))
  }

  test("headline total counts each constraint once: [global] twins and same-name global rows") {
    // not_null emits per-conv rows AND a re-stated "[global]" twin (5);
    // max_key_share emits per-key rows AND a '(global)' total under ONE
    // name. The headline must read 5 (per-conv) + 2 (the global hot-key
    // count) = 7 — summing every row would print 5+5+300+2 = 312.
    val v = Seq(
      ("conv_1", "not_null(text)", false, 100L, 5L, 0.05),
      ("(global)", "not_null(text)[global]", false, 100L, 5L, 0.05),
      ("hot_key_a", "max_key_share(conv_id)", false, 200L, 200L, 0.2),
      ("hot_key_b", "max_key_share(conv_id)", false, 100L, 100L, 0.1),
      ("(global)", "max_key_share(conv_id)", false, 1000L, 2L, 0.002))
      .toDF("partition_key", "constraint", "pass", "rows", "violations",
        "violation_rate")
    val r = Reports.build(v)
    assert(r.totalViolations == 7, r.totalViolations)
    val byName = r.byConstraint.map(c => c.constraint -> c).toMap
    // the by-constraint rollup prefers the '(global)' total too
    assert(byName("max_key_share(conv_id)").violations == 2)
    assert(byName("not_null(text)").violations == 5)
  }

  test("markdown and html render every section") {
    val r = Reports.build(verdicts)
    val md = Reports.markdown(r)
    assert(md.contains("## Summary"))
    assert(md.contains("| not_null(text) | 3 | 1 | 5 |"))
    assert(md.contains("conv_2"))
    val html = Reports.html(r)
    assert(html.contains("<h2>By constraint</h2>"))
    assert(html.contains("<td>conv_1</td>"))
  }

  test("html embeds SVG figures (S9 role): one bar per constraint + worst partitions") {
    val html = Reports.html(Reports.build(verdicts))
    assert(html.contains("<svg"))
    // 2 constraint bars + 2 worst-partition bars
    assert(html.split("<rect").length - 1 == 4)
    assert(html.contains("Violations by constraint"))
    val svg = Reports.svgBars("t<&t", Seq("a<b" -> 3.0, "c" -> 1.5))
    assert(!svg.contains("t<&t") && svg.contains("t&lt;&amp;t"))
    assert(svg.contains("a&lt;b"))
    assert(Reports.svgBars("empty", Nil) == "")
  }

  test("html escapes markup in constraint names and recommendations") {
    val bad = Seq(("p<script>", "c<&>", false, 1L, 1L, 1.0))
      .toDF("partition_key", "constraint", "pass", "rows", "violations",
        "violation_rate")
    val html = Reports.html(Reports.build(bad))
    assert(!html.contains("<script>"))
    assert(html.contains("&lt;script&gt;"))
    assert(html.contains("c&lt;&amp;&gt;"))
  }

  test("all-pass report recommends nothing to do") {
    val ok = Seq(("conv_1", "not_null(text)", true, 100L, 0L, 0.0))
      .toDF("partition_key", "constraint", "pass", "rows", "violations",
        "violation_rate")
    val r = Reports.build(ok)
    assert(r.failedPartitions == 0)
    assert(r.worstPartitions.isEmpty)
    assert(r.recommendations == Seq("All partitions passed — no action needed."))
  }
}
