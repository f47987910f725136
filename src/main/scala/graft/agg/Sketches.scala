package graft.agg

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tdigest.TDigestDouble

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Mergeable quantile sketches as first-class Catalyst aggregates.
  *
  * The reference computes exact quantiles in-memory
  * (src/decomposition.py:161-162, src/anomaly_detection.py:242-243); at
  * 10^12-turn scale exact percentile is a full sort per column, so the
  * engine carries a DataSketches t-digest instead. The buffers merge
  * commutatively (`TDigestDouble.merge`), which is what makes per-partition
  * checkpoint state (graft.checkpoint) unionable on restart — the north
  * rule's resumability requirement.
  *
  * Partial aggregation: Spark's HashAggregate runs update() map-side and
  * merge() reduce-side automatically for TypedImperativeAggregate, so this
  * participates in partial->final aggregation like any built-in.
  */
case class TDigestAgg(
    child: Expression,
    k: Short = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestDouble] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "tdigest_agg"

  override def createAggregationBuffer(): TDigestDouble = new TDigestDouble(k)

  override def update(buf: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: TDigestDouble, b2: TDigestDouble): TDigestDouble = {
    b1.merge(b2); b1
  }

  override def eval(buf: TDigestDouble): Any = buf.toByteArray

  override def serialize(buf: TDigestDouble): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TDigestAgg =
    copy(child = newChild)
}

/** Union of pre-serialized t-digest blobs — the checkpoint-restart merge:
  * partial per-partition sketches written to the run manifest are folded
  * back into one global sketch without rescanning data.
  */
case class TDigestMergeAgg(
    child: Expression,
    k: Short = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestDouble] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "tdigest_merge_agg"

  override def createAggregationBuffer(): TDigestDouble = new TDigestDouble(k)

  override def update(buf: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null) buf.merge(TDigestDouble.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def merge(b1: TDigestDouble, b2: TDigestDouble): TDigestDouble = {
    b1.merge(b2); b1
  }
  override def eval(buf: TDigestDouble): Any = buf.toByteArray
  override def serialize(buf: TDigestDouble): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))
  override def withNewMutableAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TDigestMergeAgg =
    copy(child = newChild)
}

/** Scalar: quantile of a serialized t-digest. Evaluated on aggregated rows
  * only (a handful per job), so CodegenFallback costs nothing.
  */
case class TDigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, q: Any): Any = {
    val td = TDigestDouble.heapify(Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (td.isEmpty) null else td.getQuantile(q.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Scalar: rank (CDF value) of x in a serialized t-digest — the building
  * block of the sketch-based KS drift check (|cdf_a(x) - cdf_b(x)|).
  */
case class TDigestRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, x: Any): Any = {
    val td = TDigestDouble.heapify(Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (td.isEmpty) null else td.getRank(x.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Mergeable KLL doubles sketch — the second quantile tier. Where the
  * t-digest's accuracy is empirical (excellent near the tails, no hard
  * guarantee), KLL carries a PROVABLE normalized rank-error bound
  * (~1.65% at k=200, 99% confidence), so a QuantileBetween verdict can be
  * stated as "true quantile within ±ε of the bound" — the property an
  * auditor of a 10^12-turn validation wants on record. Same
  * TypedImperativeAggregate shape: map-side update, reduce-side merge,
  * commutative union for checkpoint restarts.
  */
case class KllAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.kll.KllDoublesSketch]
  with UnaryLike[Expression] {
  import org.apache.datasketches.kll.KllDoublesSketch

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  // heapify can hand back a sketch we must be able to merge INTO — rebuild
  // into a guaranteed-writable heap instance (O(k), off the hot path)
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }
  override def withNewMutableAggBufferOffset(o: Int): KllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllAgg =
    copy(child = newChild)
}

/** Union of pre-serialized KLL blobs (checkpoint-restart merge). */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.kll.KllDoublesSketch]
  with UnaryLike[Expression] {
  import org.apache.datasketches.kll.KllDoublesSketch

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Scalar: quantile of a serialized KLL sketch (inclusive rank search). */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  import org.apache.datasketches.kll.KllDoublesSketch
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, q: Any): Any = {
    val s = KllDoublesSketch.heapify(Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null else s.getQuantile(q.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Scalar: rank (CDF) of x under a serialized KLL sketch. */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  import org.apache.datasketches.kll.KllDoublesSketch
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, x: Any): Any = {
    val s = KllDoublesSketch.heapify(Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null else s.getRank(x.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Column-level API. */
object Sketches {
  private def agg(e: TypedImperativeAggregate[_]): Column =
    GraftBridge.column(e.toAggregateExpression())

  /** Mergeable t-digest over a double column; returns the serialized sketch. */
  def tdigestAgg(c: Column, k: Short = 200): Column =
    agg(TDigestAgg(GraftBridge.expression(c.cast("double")), k))

  /** Union previously serialized t-digest blobs. */
  def tdigestMergeAgg(c: Column, k: Short = 200): Column =
    agg(TDigestMergeAgg(GraftBridge.expression(c), k))

  /** Quantile q from a serialized sketch column. */
  def tdigestQuantile(sketch: Column, q: Double): Column =
    GraftBridge.column(TDigestQuantile(GraftBridge.expression(sketch),
      Literal(q, DoubleType)))

  /** Rank (CDF) of x under the sketch. */
  def tdigestRank(sketch: Column, x: Column): Column =
    GraftBridge.column(TDigestRank(GraftBridge.expression(sketch),
      GraftBridge.expression(x)))

  /** Mergeable KLL doubles sketch (provable rank-error bound). */
  def kllAgg(c: Column, k: Int = 200): Column =
    agg(KllAgg(GraftBridge.expression(c.cast("double")), k))

  /** Union previously serialized KLL blobs. */
  def kllMergeAgg(c: Column, k: Int = 200): Column =
    agg(KllMergeAgg(GraftBridge.expression(c), k))

  /** Quantile q from a serialized KLL sketch column. */
  def kllQuantile(sketch: Column, q: Double): Column =
    GraftBridge.column(KllQuantile(GraftBridge.expression(sketch),
      Literal(q, DoubleType)))

  /** Rank (CDF) of x under a serialized KLL sketch column. */
  def kllRank(sketch: Column, x: Column): Column =
    GraftBridge.column(KllRank(GraftBridge.expression(sketch),
      GraftBridge.expression(x)))
}
