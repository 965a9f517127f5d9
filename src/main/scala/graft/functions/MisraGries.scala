package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary — the second mergeable sketch a
  * warehouse persists next to the HLL distinct sketch
  * ([[graft.ops.Sketches]]): at most `k` (item, count) counters whose
  * estimate ĉ(x) satisfies f(x) − n/(k+1) ≤ ĉ(x) ≤ f(x) over a stream of
  * total weight n, so every item with true frequency above n/(k+1) is
  * guaranteed present. Summaries are MERGEABLE with the same bound
  * (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
  * PODS 2012, public literature): pointwise-sum two summaries, then
  * subtract the (k+1)-th largest count from every counter and drop the
  * non-positive ones. That closure under merge is what makes the
  * per-load-shard sketch table work: any bucket subset is answered by
  * merging KB-sized rows, never by rescanning the corpus.
  *
  * State is O(k) at EVERY stage (partial, shuffle, final merge) — the same
  * memory contract as [[TopKBuffer]], and the reason this is an aggregate
  * and not `collect_list → count` (whose partial state is unbounded).
  *
  * DETERMINISM CAVEAT: the individual counter values depend on stream
  * order and partitioning (any Misra-Gries/SpaceSaving variant's do) — the
  * THEORETICAL BOUNDS hold regardless. Cross-engine checks must therefore
  * compare exact counts and bound-acceptance flags, never raw counter
  * values (see the `heavy_hitters` registry query).
  */
final class MGBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()

  /** Unit-weight stream update — classic Misra-Gries: tracked items
    * increment; an untracked item takes a free slot, or, with all k slots
    * taken, decrements every counter by one (dropping zeros) — the step
    * that charges one occurrence of everything, which is where the
    * n/(k+1) error comes from. */
  def addOne(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + 1L)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Mergeable-summaries merge: pointwise sum, then reduce back to ≤ k
    * entries by subtracting the (k+1)-th largest count from every counter
    * and dropping non-positives. */
  def mergeFrom(other: MGBuffer): Unit = {
    other.counts.forEach { (item, c) =>
      counts.put(item, counts.get(item) + c) // get returns 0 when absent (unboxed)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - 1 - k) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  /** Entries ordered (count desc, item asc) — a deterministic presentation
    * of whatever counters this buffer holds. */
  def sortedEntries: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(arr,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    arr
  }

  def serialize(): Array[Byte] = {
    val entries = sortedEntries
    val byteArrays = entries.map(e => e._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(4 + byteArrays.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(byteArrays(i).length)
      bb.put(byteArrays(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }
}

object MGBuffer {
  def deserialize(bytes: Array[Byte], k: Int): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MGBuffer(k)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val ba = new Array[Byte](len)
      bb.get(ba)
      buf.counts.put(new String(ba, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  val itemsType: ArrayType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
                   StructField("count_est", LongType, nullable = false))),
    containsNull = false)
}

/** `mg_sketch_agg(item, k)` → the serialized Misra-Gries summary of a
  * string stream (BINARY, ≤ k counters) — the sketch a per-(bucket, shard)
  * load persists as a table row, the [[graft.ops.Sketches.distinctSketch]]
  * posture for heavy hitters. */
case class MGSketchAgg(
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {
  require(k > 0, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = itemExpr.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item, got $other")
  }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val v = itemExpr.eval(input)
    // .toString copies out of Spark's reused row memory
    if (v != null) buffer.addOne(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGBuffer, input: MGBuffer): MGBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: MGBuffer): Any = buffer.serialize()

  override def serialize(buffer: MGBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MGBuffer =
    MGBuffer.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): MGSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MGSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MGSketchAgg =
    copy(itemExpr = newChildren(0))
}

/** `mg_merge_agg(sketch, k)` → merge serialized Misra-Gries summaries
  * (the incremental read path — cost ∝ sketch rows, never data size) and
  * return the merged counters decoded as
  * array<struct<item, count_est>> ordered (count desc, item asc). */
case class MGMergeAgg(
    sketchExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {
  require(k > 0, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(sketchExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = MGBuffer.itemsType
  override def prettyName: String = "mg_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = sketchExpr.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch, got $other")
  }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val v = sketchExpr.eval(input)
    if (v != null)
      buffer.mergeFrom(MGBuffer.deserialize(v.asInstanceOf[Array[Byte]], k))
    buffer
  }

  override def merge(buffer: MGBuffer, input: MGBuffer): MGBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: MGBuffer): Any = {
    val entries = buffer.sortedEntries
    new GenericArrayData(entries.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c): Any
    })
  }

  override def serialize(buffer: MGBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MGBuffer =
    MGBuffer.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): MGMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MGMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MGMergeAgg =
    copy(sketchExpr = newChildren(0))
}

object MisraGries {
  /** Column wrapper: serialized ≤ k-counter Misra-Gries summary of `item`. */
  def mgSketchAgg(item: Column, k: Int): Column =
    ColumnBridge.column(
      MGSketchAgg(ColumnBridge.expression(item), k).toAggregateExpression())

  /** Column wrapper: merge serialized summaries → decoded counter array. */
  def mgMergeAgg(sketch: Column, k: Int): Column =
    ColumnBridge.column(
      MGMergeAgg(ColumnBridge.expression(sketch), k).toAggregateExpression())
}
