package graft.series

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.GraftSuite

/** SURVEY §5.2 differential oracle: a naive single-JVM Scala implementation
  * of the reference formulas vs the distributed kernels, property-tested on
  * generated series under arbitrary partitioning. Equality must hold for
  * any shuffle layout — the distributed plan cannot depend on row order.
  */
class DifferentialSpec extends GraftSuite {
  import spark.implicits._

  private val seriesGen: Gen[(List[Double], Int, Int)] = for {
    n <- Gen.choose(30, 120)
    base <- Gen.choose(-50.0, 50.0)
    amp <- Gen.choose(0.1, 20.0)
    ys <- Gen.listOfN(n, Gen.choose(-1.0, 1.0))
    window <- Gen.choose(3, 12)
    parts <- Gen.choose(1, 7)
  } yield (ys.zipWithIndex.map { case (e, i) =>
    base + amp * math.sin(i / 3.0) + e * amp / 4 }, window, parts)

  /** naive rolling mean/std/z with min_periods = window (pandas ddof=1). */
  private def naiveRollingZ(y: Vector[Double], w: Int, t: Double)
      : Vector[Boolean] =
    y.indices.map { i =>
      if (i < w - 1) false
      else {
        val win = y.slice(i - w + 1, i + 1)
        val mean = win.sum / w
        val variance = win.map(x => (x - mean) * (x - mean)).sum / (w - 1)
        val sd = math.sqrt(variance)
        sd > 0 && math.abs((y(i) - mean) / sd) > t
      }
    }.toVector

  test("rolling-z flags == naive oracle for arbitrary series and partitioning") {
    (1 to 12).foreach { seed =>
      val (ys, w, parts) = seriesGen
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = ys.zipWithIndex.map { case (v, i) => ("k", i, v) }
        .toDF("key", "i", "x").repartition(parts)
      val got = Windows.rollingZ(df, "x", w, 2.5, Seq("key"), Seq("i"))
        .orderBy("i").select("x_z_anomaly").as[Boolean].collect().toVector
      val expected = naiveRollingZ(ys.toVector, w, 2.5)
      assert(got == expected, s"seed=$seed w=$w parts=$parts")
    }
  }

  test("classical decomposition invariant to partitioning") {
    val ys = (0 until 90).map(i => 5.0 + 0.2 * i + 3 * math.sin(2 * math.Pi * i / 7))
    def run(parts: Int) = Decomposition.additive(
      ys.zipWithIndex.map { case (v, i) => ("k", i, v) }.toDF("key", "i", "y")
        .repartition(parts), "y", 7, Seq("key"), Seq("i"))
      .orderBy("i").select("trend", "seasonal", "resid").collect().toSeq
    val a = run(1)
    val b = run(8)
    a.zip(b).foreach { case (x, y) =>
      (0 until 3).foreach { c =>
        (Option(x.get(c)), Option(y.get(c))) match {
          case (Some(u: Double), Some(v: Double)) => assert(math.abs(u - v) < 1e-9)
          case (None, None) =>
          case other => fail(s"null mismatch $other")
        }
      }
    }
  }
}
