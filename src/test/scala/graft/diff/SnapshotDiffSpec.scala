package graft.diff

import org.apache.spark.sql.functions._
import graft.GraftSuite

class SnapshotDiffSpec extends GraftSuite {
  import spark.implicits._

  test("diff classifies added/removed/changed and drops unchanged rows") {
    val oldDf = Seq(
      ("a", 0, "user", "hi"),
      ("a", 1, "assistant", "hello"),
      ("b", 0, "user", "x"),       // will be removed
      ("c", 0, "user", "same")
    ).toDF("conv_id", "turn_idx", "role", "text")
    val newDf = Seq(
      ("a", 0, "user", "hi"),      // unchanged
      ("a", 1, "assistant", "HELLO"), // changed
      ("c", 0, "user", "same"),    // unchanged
      ("d", 0, "tool", "new")      // added
    ).toDF("conv_id", "turn_idx", "role", "text")
    val got = SnapshotDiff.diff(oldDf, newDf, Seq("conv_id", "turn_idx"),
        Seq("role", "text"))
      .as[(String, Int, String)].collect().toSet
    assert(got == Set(("a", 1, "changed"), ("b", 0, "removed"),
      ("d", 0, "added")))
  }

  test("null-vs-empty and boundary-shift payloads do NOT collide") {
    // ("a", null) vs ("a", "") and ("ab","c") vs ("a","bc") must all be
    // distinct digests -- the \u0001 separator + \u0002 null sentinel are
    // exactly what prevents a plain concat from conflating them
    val oldDf = Seq(
      ("k1", Some("a"), None: Option[String]),
      ("k2", Some("ab"), Some("c"))
    ).toDF("id", "c1", "c2")
    val newDf = Seq(
      ("k1", Some("a"), Some("")),
      ("k2", Some("a"), Some("bc"))
    ).toDF("id", "c1", "c2")
    val got = SnapshotDiff.diff(oldDf, newDf, Seq("id"), Seq("c1", "c2"))
      .as[(String, String)].collect().toSet
    assert(got == Set(("k1", "changed"), ("k2", "changed")))
  }

  test("diffSummary censuses the change set") {
    val oldDf = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v")
    val newDf = Seq((2, "y"), (3, "Z"), (4, "w")).toDF("id", "v")
    val got = SnapshotDiff.diffSummary(oldDf, newDf, Seq("id"), Seq("v"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("removed" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("plan: join sides carry only key + digest — payload never rides the exchange") {
    val wide = Seq(("a", 0, "role", "a-very-wide-text-payload", "tool"))
      .toDF("conv_id", "turn_idx", "role", "text", "tool")
    val plan = SnapshotDiff.diff(wide, wide, Seq("conv_id", "turn_idx"),
      Seq("role", "text", "tool")).queryExecution.optimizedPlan.toString
    // the compared columns appear only under the md5 projections, never as
    // bare join/exchange attributes: the Project above each join child must
    // reduce to (keys, digest)
    val joinOutputs = "__old_digest|__new_digest".r
      .findAllIn(plan).length
    assert(joinOutputs >= 2, s"expected digest projections in:\n$plan")
    assert(!plan.contains("text#") || {
      // text may appear inside the md5(concat_ws(...)) expression itself;
      // it must not appear as a standalone output attribute of the join
      val joinLine = plan.linesIterator.find(_.contains("Join FullOuter"))
      joinLine.forall(l => !l.contains("text#"))
    })
  }
}
