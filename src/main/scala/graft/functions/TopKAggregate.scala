package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k state: the k best (score, id) pairs by (score desc, id
  * asc), kept sorted best-first. Inserts are O(k) shifts — k is small and
  * constant, so update cost per row is bounded and the aggregation buffer
  * NEVER exceeds k entries. This is the memory contract the composed
  * `collect_list → sort → slice` formulation lacks: its partial state
  * buffers every row of a partition per group before slicing, which is an
  * OOM on billion-row partitions. */
final class TopKBuffer(val k: Int) {
  val score = new Array[Double](k)
  val id = new Array[Long](k)
  var n = 0

  /** strictly better: higher score, ties to the smaller id */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Double, i: Long): Unit = {
    if (n == k && !better(s, i, score(n - 1), id(n - 1))) return
    var pos = if (n == k) n - 1 else { n += 1; n - 1 }
    while (pos > 0 && better(s, i, score(pos - 1), id(pos - 1))) {
      score(pos) = score(pos - 1); id(pos) = id(pos - 1); pos -= 1
    }
    score(pos) = s; id(pos) = i
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.n) { insert(other.score(j), other.id(j)); j += 1 }
  }
}

/** `top_k_by(score, id, k)` — aggregate returning the k best
  * array<struct<cos,neighbor_id>> rows by (score desc, id asc), with O(k)
  * state at every stage (partial, shuffle, merge). Powers every top-k in
  * the similarity operators. */
case class TopKBy(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cos", DoubleType, nullable = false),
                   StructField("neighbor_id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by"

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got $other")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, input: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val rows = new Array[Any](buffer.n)
    var j = 0
    while (j < buffer.n) {
      rows(j) = InternalRow(buffer.score(j), buffer.id(j)); j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.n * 16)
    bb.putInt(buffer.n)
    var j = 0
    while (j < buffer.n) { bb.putDouble(buffer.score(j)); bb.putLong(buffer.id(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.insert(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAggregate {
  /** Column wrapper: bounded top-k of (score, id) pairs. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKBy(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
