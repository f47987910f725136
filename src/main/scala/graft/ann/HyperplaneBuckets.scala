package graft.ann

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** All `tables` sign-random-projection LSH bucket ids of one embedding in a
  * single pass: out[t] = Σ_p [proj(t,p) >= 0] << p, with proj(t,p) the
  * left-to-right dot product of the vector against the deterministic
  * md5-derived hyperplane (Similarity.planeComponent — reproducible by the
  * DuckDB oracle twin from the same recipe).
  *
  * Replaces a literal-coefficient expression tree of tables×planes×dims
  * terms (4096 nodes for the q39 config): that tree blew past Janino's
  * practical limits — minutes of codegen for a 500-vector input. This
  * expression ships ONE loop nest over a referenced coefficient matrix, so
  * the stage stays inside whole-stage codegen at any (tables, planes, dims).
  *
  * Semantics match the literal tree exactly, including the degenerate
  * cases: a vector shorter than `dims` or containing a null element made
  * every projection null → every bit 0, so here it yields all-zero buckets.
  */
case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int,
    dims: Int) extends UnaryExpression {

  require(planes >= 1 && planes <= 63, "planes must be in [1, 63]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_buckets"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"hyperplane_buckets needs array<float|double>, got $other")
  }

  // [tables][planes][dims] — deterministic, regenerated identically anywhere
  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    Array.tabulate(tables, planes, dims)((t, p, i) =>
      Similarity.planeComponent(t, p, i))

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val out = new Array[Long](tables)
    val n = a.numElements()
    var anyNull = n < dims
    var j = 0
    while (!anyNull && j < dims) { anyNull = a.isNullAt(j); j += 1 }
    if (!anyNull) {
      val vec = new Array[Double](dims)
      var i = 0
      while (i < dims) {
        vec(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        i += 1
      }
      var t = 0
      while (t < tables) {
        var b = 0L
        var p = 0
        while (p < planes) {
          val row = matrix(t)(p)
          var proj = 0.0
          var k = 0
          while (k < dims) { proj += vec(k) * row(k); k += 1 }
          if (proj >= 0) b |= (1L << p)
          p += 1
        }
        out(t) = b
        t += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("hyperplanes", matrix, "double[][][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("buckets")
      val vec = ctx.freshName("vec")
      val bad = ctx.freshName("bad")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val proj = ctx.freshName("proj")
      val b = ctx.freshName("b")
      s"""
         |long[] $out = new long[$tables];
         |boolean $bad = $a.numElements() < $dims;
         |for (int $i = 0; !$bad && $i < $dims; $i++) {
         |  $bad = $a.isNullAt($i);
         |}
         |if (!$bad) {
         |  double[] $vec = new double[$dims];
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $vec[$i] = (double) $a.$get($i);
         |  }
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $b = 0L;
         |    for (int $p = 0; $p < $planes; $p++) {
         |      double $proj = 0.0;
         |      for (int $k = 0; $k < $dims; $k++) {
         |        $proj += $vec[$k] * $mat[$t][$p][$k];
         |      }
         |      if ($proj >= 0.0) $b |= (1L << $p);
         |    }
         |    $out[$t] = $b;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
    copy(child = c)
}

object HyperplaneBuckets {
  def apply(vec: Column, planes: Int, tables: Int, dims: Int): Column =
    GraftBridge.column(HyperplaneBuckets(
      GraftBridge.expression(vec), planes, tables, dims))
}
