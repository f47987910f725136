package graft.ann

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** All IVF cell ids of one embedding, ordered by DESCENDING dot product
  * against the centroid matrix (ties → lower centroid id): out(0) is the
  * vector's home cell (corpus assignment), out.slice(0, nprobe) are the
  * query's probe cells. One codegen'd loop nest over a referenced
  * [k][dims] matrix — the same shape as [[HyperplaneBuckets]], and for the
  * same reason: a literal-coefficient expression tree at k×dims terms
  * would blow past Janino's practical limits.
  *
  * Dot products accumulate left-to-right over the vector, so the DuckDB
  * oracle twin reproduces the exact doubles via
  * `list_sum(list_transform(range(dims), i -> v[i+1] * c[i+1]))` (the
  * identity the q39 hyperplane twin already relies on); identical doubles
  * ⇒ identical ties ⇒ identical cell order in both engines.
  *
  * Degenerate input (vector shorter than `dims` or containing a null
  * element) yields an EMPTY array: `get(…, 0)` is then null (getItem
  * would throw under ANSI) and the row drops out of the candidate join —
  * documented, and absent from the testdata.
  */
case class IvfCells(child: Expression, centroids: Array[Array[Double]],
    limit: Int = Int.MaxValue)
    extends UnaryExpression {

  require(centroids.nonEmpty && centroids.forall(_.length == centroids(0).length),
    "centroids must be a non-empty rectangular matrix")
  require(limit >= 1, "limit must be >= 1")

  private def k = centroids.length
  private def dims = centroids(0).length
  // only the first `lim` ranking positions are emitted: the corpus
  // assignment needs 1 and a query probes nprobe — a full O(k^2)
  // selection sort per corpus row would dominate the assignment stage
  private def lim = math.min(limit, k)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ivf_cells"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"ivf_cells needs array<float|double>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var bad = n < dims
    var j = 0
    while (!bad && j < dims) { bad = a.isNullAt(j); j += 1 }
    if (bad) UnsafeArrayData.fromPrimitiveArray(new Array[Int](0))
    else {
      val vec = new Array[Double](dims)
      var i = 0
      while (i < dims) {
        vec(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        i += 1
      }
      val dots = new Array[Double](k)
      var c = 0
      while (c < k) {
        val row = centroids(c)
        var d = 0.0
        var x = 0
        while (x < dims) { d += vec(x) * row(x); x += 1 }
        dots(c) = d
        c += 1
      }
      val ord = Array.tabulate(k)(identity)
      var x = 0
      while (x < lim) {
        var best = x
        var y = x + 1
        while (y < k) {
          if (dots(ord(y)) > dots(ord(best)) ||
              (dots(ord(y)) == dots(ord(best)) && ord(y) < ord(best))) best = y
          y += 1
        }
        val t = ord(x); ord(x) = ord(best); ord(best) = t
        x += 1
      }
      UnsafeArrayData.fromPrimitiveArray(ord.take(lim))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    val limV = lim
    nullSafeCodeGen(ctx, ev, a => {
      val vec = ctx.freshName("vec")
      val bad = ctx.freshName("bad")
      val dots = ctx.freshName("dots")
      val ord = ctx.freshName("ord")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val b = ctx.freshName("best")
      val d = ctx.freshName("d")
      val t = ctx.freshName("tmp")
      val lim = limV
      s"""
         |boolean $bad = $a.numElements() < $dims;
         |for (int $i = 0; !$bad && $i < $dims; $i++) {
         |  $bad = $a.isNullAt($i);
         |}
         |int[] $ord;
         |if ($bad) {
         |  $ord = new int[0];
         |} else {
         |  double[] $vec = new double[$dims];
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $vec[$i] = (double) $a.$get($i);
         |  }
         |  double[] $dots = new double[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      $d += $vec[$i] * $mat[$c][$i];
         |    }
         |    $dots[$c] = $d;
         |  }
         |  $ord = new int[$k];
         |  for (int $x = 0; $x < $k; $x++) $ord[$x] = $x;
         |  for (int $x = 0; $x < $lim; $x++) {
         |    int $b = $x;
         |    for (int $y = $x + 1; $y < $k; $y++) {
         |      if ($dots[$ord[$y]] > $dots[$ord[$b]] ||
         |          ($dots[$ord[$y]] == $dots[$ord[$b]] && $ord[$y] < $ord[$b])) {
         |        $b = $y;
         |      }
         |    }
         |    int $t = $ord[$x]; $ord[$x] = $ord[$b]; $ord[$b] = $t;
         |  }
         |  if ($lim < $k) $ord = java.util.Arrays.copyOf($ord, $lim);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($ord);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): IvfCells =
    copy(child = c)
}

object IvfCells {
  def apply(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftBridge.column(IvfCells(GraftBridge.expression(vec), centroids))

  /** Only the first `limit` ranking positions (O(k·limit) per row). */
  def apply(vec: Column, centroids: Array[Array[Double]], limit: Int): Column =
    GraftBridge.column(IvfCells(GraftBridge.expression(vec), centroids, limit))
}
