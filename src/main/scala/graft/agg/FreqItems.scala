package graft.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries heavy-hitters summary (Misra & Gries 1982;
  * mergeability per Agarwal, Cormode, Huang, Phillips, Wei, Yi,
  * "Mergeable Summaries", PODS 2012).
  *
  * The validator's mega-key census (graft.skew.Salting) is an exact
  * groupBy — one full shuffle of the key column. This sketch is its
  * scale path: O(k) state per partition, map-side partial aggregation,
  * commutative merges (so it also rides the checkpoint-restart union
  * like the other StatsState sketches). Guarantee, tracked EXPLICITLY in
  * the state as `err`: for every key, counter ≤ true-count ≤ counter +
  * err, and err ≤ n/⌈(k+1)/2⌉ (each purge subtracts the median counter
  * δ from all entries; at least ⌈(k+1)/2⌉ entries lose the full δ, and
  * total decrements cannot exceed total increments = n). Any key with
  * true count > err is therefore guaranteed present — which makes the
  * classic exact two-pass heavy-hitters query ([[FreqItems.heavyHitters]])
  * sound: sketch → ≤k candidates → exact recount of candidates only.
  */
final class MgSummary(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()
  var n: Long = 0L
  var err: Long = 0L

  def add(s: String): Unit = {
    n += 1
    counts.put(s, counts.getOrDefault(s, 0L) + 1L)
    if (counts.size > k) purge()
  }

  /** Subtract the lower-median counter from every entry and drop the
    * non-positive ones: ≥ half the entries survive-side lose the full δ
    * (the mass argument), ≥ half get removed (the amortized-O(1)
    * argument).
    */
  private def purge(): Unit = {
    val vals = counts.values().asScala.toArray.sorted
    val delta = vals(vals.length / 2)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      val nv = en.getValue - delta
      if (nv <= 0L) it.remove() else en.setValue(nv)
    }
    err += delta
  }

  def mergeIn(o: MgSummary): Unit = {
    n += o.n
    err += o.err
    o.counts.forEach { (s, c) =>
      counts.put(s, counts.getOrDefault(s, 0L) + c)
    }
    while (counts.size > k) purge()
  }
}

case class FreqItemsAgg(
    child: Expression,
    k: Int = 512,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType),
      StructField("lb", LongType))))),
    StructField("n", LongType),
    StructField("err", LongType)))
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_agg"

  override def createAggregationBuffer(): MgSummary = new MgSummary(k)

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: MgSummary, b2: MgSummary): MgSummary = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: MgSummary): Any = {
    // counter desc, then key asc: a deterministic presentation order
    val items = buf.counts.asScala.toSeq.sortBy { case (s, c) => (-c, s) }
      .map { case (s, c) =>
        InternalRow(UTF8String.fromString(s), c): Any
      }
    InternalRow(new GenericArrayData(items.toArray), buf.n, buf.err)
  }

  override def serialize(buf: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeLong(buf.n); out.writeLong(buf.err)
    out.writeInt(buf.counts.size)
    // length-prefixed UTF-8, NOT writeUTF: keys from free-text columns can
    // exceed writeUTF's 64 KiB modified-UTF-8 limit and kill the shuffle
    buf.counts.forEach { (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgSummary(in.readInt())
    buf.n = in.readLong(); buf.err = in.readLong()
    var m = in.readInt()
    while (m > 0) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      m -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}

/** Same state machine, blob output — the form a run manifest persists
  * (counterpart of the t-digest blob in graft.checkpoint.StatsState).
  */
case class FreqItemsSketchAgg(
    child: Expression,
    k: Int = 512,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] with UnaryLike[Expression] {

  private val impl = FreqItemsAgg(child, k)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_sketch"

  override def createAggregationBuffer(): MgSummary = new MgSummary(k)
  override def update(buf: MgSummary, input: InternalRow): MgSummary =
    impl.update(buf, input)
  override def merge(b1: MgSummary, b2: MgSummary): MgSummary = {
    b1.mergeIn(b2); b1
  }
  override def eval(buf: MgSummary): Any = impl.serialize(buf)
  override def serialize(buf: MgSummary): Array[Byte] = impl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MgSummary = impl.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): FreqItemsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsSketchAgg =
    copy(child = newChild)
}

/** Union of pre-serialized MG summaries — the checkpoint-restart merge
  * (same role as TDigestMergeAgg): per-slice census sketches written to a
  * run manifest fold into one global summary without rescanning, and the
  * explicit `err` keeps the completeness guarantee across the merge.
  */
case class FreqItemsMergeAgg(
    child: Expression,
    k: Int = 512,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] with UnaryLike[Expression] {

  private val impl = FreqItemsAgg(child, k)

  override def dataType: DataType = impl.dataType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_merge_agg"

  override def createAggregationBuffer(): MgSummary = new MgSummary(k)
  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) buf.mergeIn(impl.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(b1: MgSummary, b2: MgSummary): MgSummary = {
    b1.mergeIn(b2); b1
  }
  override def eval(buf: MgSummary): Any = impl.eval(buf)
  override def serialize(buf: MgSummary): Array[Byte] = impl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MgSummary = impl.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): FreqItemsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsMergeAgg =
    copy(child = newChild)
}

object FreqItems {
  /** Mergeable Misra–Gries summary of a string column:
    * struct(items: array<struct<item,lb>>, n, err).
    */
  def freqItemsAgg(c: Column, k: Int = 512): Column =
    GraftBridge.column(FreqItemsAgg(GraftBridge.expression(c.cast("string")), k)
      .toAggregateExpression())

  /** Serialized MG summary blob (for persisting per-slice state). */
  def freqItemsSketch(c: Column, k: Int = 512): Column =
    GraftBridge.column(
      FreqItemsSketchAgg(GraftBridge.expression(c.cast("string")), k)
        .toAggregateExpression())

  /** Union previously serialized MG summary blobs back into the
    * struct(items, n, err) shape.
    */
  def freqItemsMergeAgg(c: Column, k: Int = 512): Column =
    GraftBridge.column(FreqItemsMergeAgg(GraftBridge.expression(c), k)
      .toAggregateExpression())

  /** Census result: `hot` = (keyCol: string, cnt) for keys over the share;
    * `n` = non-null key count the threshold was computed over (the census
    * is a share of NON-NULL values — null share is NotNull's job);
    * `err` = the sketch's realized error bound.
    */
  final case class Census(hot: DataFrame, n: Long, err: Long)

  /** EXACT heavy hitters by two passes — the scale-correct census of
    * mega keys: pass 1 sketches candidates in O(k) state (any key with
    * count > n/den is guaranteed among them when err < n/den, which
    * k ≥ 2·den guarantees); pass 2 exact-counts ONLY the ≤k candidates.
    * `hot` holds keys with cnt > n/den — identical to the full
    * groupBy/HAVING (over the column cast to string, matching the
    * sketch's key space), at a fraction of its shuffle.
    */
  def heavyHittersCensus(df: DataFrame, keyCol: String, k: Int = 512,
      den: Double = 256.0): Census = {
    val row = df.agg(freqItemsAgg(col(keyCol), k).as("s"))
      .select(col("s.items").as("items"), col("s.n").as("n"), col("s.err").as("err"))
      .head()
    val n = row.getAs[Long]("n")
    val err = row.getAs[Long]("err")
    val threshold = n / den
    require(err < threshold || n == 0L,
      s"sketch error $err >= threshold $threshold: raise k (= $k) above 2*den (= ${2 * den})")
    val cands: Seq[String] =
      row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("items"))
        .map(_.getAs[String]("item"))
    val key = col(keyCol).cast("string")
    val hot = df.where(key.isin(cands: _*))
      .groupBy(key.as(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > lit(threshold))
    Census(hot, n, err)
  }

  /** The census without the metadata. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int = 512,
      den: Double = 256.0): DataFrame =
    heavyHittersCensus(df, keyCol, k, den).hot
}
