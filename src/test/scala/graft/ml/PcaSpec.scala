package graft.ml

import scala.io.Source

import org.apache.spark.sql.functions._
import graft.GraftSuite

/** PCA contract: the 2-feature closed form (the q61 hash-checked path),
  * the Jacobi solver (golden-gated against numpy's eigh — the
  * tools/pca_reference.py leg), and the projection semantics
  * (var(pc_j) = λ_j, components uncorrelated).
  */
class PcaSpec extends GraftSuite {
  import spark.implicits._

  /** keep in sync with tools/pca_reference.py */
  private def u(i: Int, salt: Int): Double =
    ((i * 2654435761L + salt * 1013904223L) & 0x7fffffff) / Int.MaxValue.toDouble

  private lazy val fixture: Seq[(Double, Double, Double, Double)] =
    (0 until 600).map { i =>
      val f0 = 2.0 * u(i, 1) - 1.0
      val f1 = 0.7 * f0 + 0.5 * (2.0 * u(i, 2) - 1.0)
      val f2 = 2.0 * u(i, 3) - 1.0 - 0.3 * f1
      val f3 = 0.2 * f0 + 0.1 * (2.0 * u(i, 4) - 1.0) + 0.5 * f2
      (f0, f1, f2, f3)
    }

  private def golden(): Seq[(Double, Array[Double])] = {
    val in = getClass.getResourceAsStream("/goldens/pca.csv")
    require(in != null, "golden pca.csv missing — run tools/pca_reference.py")
    val src = Source.fromInputStream(in)
    try src.getLines().drop(1).map { line =>
      val f = line.split(",")
      (f(1).toDouble, f.drop(2).map(_.toDouble))
    }.toSeq
    finally src.close()
  }

  test("2x2 closed form agrees with the Jacobi solver (values and axes)") {
    val cov = Array(Array(4.0, 1.5), Array(1.5, 2.0))
    val (v2, e2) = Pca.eig2(cov)
    val (vj, ej) = Pca.jacobiEig(cov)
    assert(math.abs(v2(0) - vj(0)) < 1e-12 && math.abs(v2(1) - vj(1)) < 1e-12)
    (0 until 2).foreach { j =>
      val dot = math.abs(e2(j)(0) * ej(j)(0) + e2(j)(1) * ej(j)(1))
      assert(math.abs(dot - 1.0) < 1e-12, s"axis $j dot $dot")
    }
    // eigen equation: cov·v = λ·v for the closed form
    (0 until 2).foreach { j =>
      (0 until 2).foreach { r =>
        val lhs = cov(r)(0) * e2(j)(0) + cov(r)(1) * e2(j)(1)
        assert(math.abs(lhs - v2(j) * e2(j)(r)) < 1e-12)
      }
    }
  }

  test("4-feature fit matches the numpy eigh golden (λ, vectors, ratios)") {
    val df = fixture.toDF("f0", "f1", "f2", "f3")
    val m = Pca.fit(df, Seq("f0", "f1", "f2", "f3"), nComponents = 4)
    val g = golden()
    assert(m.explainedVar.length == 4)
    (0 until 4).foreach { j =>
      val (gv, gvec) = g(j)
      assert(math.abs(m.explainedVar(j) - gv) <= 1e-9 * math.max(gv, 1e-3),
        s"λ$j ${m.explainedVar(j)} vs $gv")
      (0 until 4).foreach { i =>
        assert(math.abs(m.components(j)(i) - gvec(i)) < 1e-8,
          s"v$j[$i] ${m.components(j)(i)} vs ${gvec(i)}")
      }
    }
    val totalG = g.map(_._1).sum
    (0 until 4).foreach { j =>
      assert(math.abs(m.explainedVarRatio(j) - g(j)._1 / totalG) < 1e-9)
    }
    assert(m.explainedVarRatio.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }

  test("projection: var(pc_j) = λ_j, components uncorrelated, mean 0") {
    val df = fixture.toDF("f0", "f1", "f2", "f3")
    val m = Pca.fit(df, Seq("f0", "f1", "f2", "f3"), nComponents = 2)
    val p = df.select(m.project(): _*)
    val r = p.agg(
      var_pop(col("pc1")).as("v1"), var_pop(col("pc2")).as("v2"),
      covar_pop(col("pc1"), col("pc2")).as("cv"),
      avg(col("pc1")).as("m1"), avg(col("pc2")).as("m2")).collect()(0)
    assert(math.abs(r.getAs[Double]("v1") - m.explainedVar(0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("v2") - m.explainedVar(1)) < 1e-9)
    assert(math.abs(r.getAs[Double]("cv")) < 1e-9)
    assert(math.abs(r.getAs[Double]("m1")) < 1e-9 &&
      math.abs(r.getAs[Double]("m2")) < 1e-9)
  }

  test("fitProject appends pc columns; null feature rows yield null pcs") {
    val df = fixture.take(50).toDF("f0", "f1", "f2", "f3")
      .withColumn("f0",
        when(col("f1") > 0.99, lit(null)).otherwise(col("f0")))
    val out = Pca.fitProject(df, Seq("f0", "f1", "f2", "f3"), 2)
    assert(out.columns.takeRight(2).toSeq == Seq("pc1", "pc2"))
    assert(out.where(col("f0").isNull && col("pc1").isNotNull).isEmpty)
  }
}
