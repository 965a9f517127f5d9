package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnBridge
import org.apache.spark.sql.types._

/** Per-partition accumulator for the exact covariance partials: the
  * d(d+1)/2 upper-triangle product sums, the d mean-term sums, and the
  * row count, each an exact scale-6 decimal.
  *
  * EXACTNESS CONTRACT (must match the explode formulation cell for cell,
  * [[graft.ops.Similarity.covPartials]]): each per-row term is the
  * DOUBLE product cast to decimal(38,6) exactly the way Spark's
  * double→decimal Cast does it — shortest-string decimal rendering of
  * the double, then HALF_UP to scale 6, and NaN/±Infinity → NULL (so a
  * non-finite term is SKIPPED like sum() skips a NULL, and a cell whose
  * every term was non-finite reads NULL — one bad embedding value
  * degrades that cell, never crashes the batch or the streaming
  * maintenance) — and the accumulation is
  * BigDecimal addition of those scale-6 values, which is associative and
  * commutative, so partition count and row order cannot perturb the sums
  * (the property the DuckDB oracle replay and the streaming additivity
  * both lean on).
  *
  * The buffer is d²-bounded (~2.1k cells at d=64) at every stage —
  * partial, shuffle, final merge — which is the point: the explode form
  * pushed d(d+1)/2 + d + 1 struct rows per VECTOR through codegen before
  * the hash aggregate could absorb them (~2,000× row amplification, the
  * single biggest compute line in the r16 bench).
  */
final class CovBuffer {
  /** Dimension, fixed by the first vector this buffer absorbs; -1 = empty. */
  var d: Int = -1
  /** Cell sums, laid out [mean_0..mean_{d-1}, tri(0,0), tri(0,1), ...,
    * tri(0,d-1), tri(1,1), ..., tri(d-1,d-1)], then the row count last.
    * A cell is `null` until the FIRST finite term lands in it — Spark's
    * non-ANSI double→decimal Cast turns NaN/±Infinity into NULL and
    * sum() skips NULLs, so a cell fed only non-finite terms must come
    * out NULL, not 0 (the explode formulation's behavior, cell for
    * cell). */
  var sums: Array[JBigDecimal] = null

  private def nCells(dim: Int): Int = dim + dim * (dim + 1) / 2 + 1

  def allocate(dim: Int): Unit = {
    d = dim
    sums = new Array[JBigDecimal](nCells(dim)) // all null = all-NULL sums
  }

  /** Spark's DoubleType→DecimalType(38,6) Cast, reproduced: Decimal(d)
    * parses the double's shortest string rendering, changePrecision
    * rounds HALF_UP to scale 6. Callers guard non-finite inputs (Cast
    * maps those to NULL; Double.toString("NaN") would throw here). */
  private def castDec(p: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(p))
      .setScale(6, RoundingMode.HALF_UP)

  /** SQL sum-accumulate: NULL cell + finite term = the term. */
  private def acc(k: Int, p: Double): Unit =
    if (java.lang.Double.isFinite(p)) {
      val t = castDec(p)
      sums(k) = if (sums(k) == null) t else sums(k).add(t)
    }

  private val one = new JBigDecimal(BigInteger.valueOf(1000000L), 6)

  def add(emb: ArrayData): Unit = {
    val len = emb.numElements()
    if (d == -1) allocate(len)
    else require(len == d,
      s"covariance partials over a ragged corpus: saw vectors of length $d and $len")
    val xs = emb.toDoubleArray()
    var i = 0
    var t = d // triangle cells start after the d mean terms
    while (i < d) {
      acc(i, xs(i))
      var j = i
      while (j < d) {
        acc(t, xs(i) * xs(j))
        t += 1
        j += 1
      }
      i += 1
    }
    val last = sums.length - 1
    sums(last) = if (sums(last) == null) one else sums(last).add(one)
  }

  def mergeFrom(other: CovBuffer): Unit = {
    if (other.d == -1) return
    if (d == -1) allocate(other.d)
    else require(other.d == d,
      s"merging covariance partials of different dimension: $d vs ${other.d}")
    var i = 0
    while (i < sums.length) {
      val o = other.sums(i)
      if (o != null) sums(i) = if (sums(i) == null) o else sums(i).add(o)
      i += 1
    }
  }

  def serialize(): Array[Byte] = {
    if (d == -1) return ByteBuffer.allocate(4).putInt(-1).array()
    // null cells serialize as length -1 (distinct from BigInteger.ZERO's
    // real byte encoding)
    val bytes = sums.map(s => if (s == null) null
                             else s.unscaledValue().toByteArray)
    val bb = ByteBuffer.allocate(
      4 + bytes.map(b => (if (b == null) 0 else b.length) + 4).sum)
    bb.putInt(d)
    bytes.foreach { b =>
      if (b == null) bb.putInt(-1) else { bb.putInt(b.length); bb.put(b) }
    }
    bb.array()
  }
}

object CovBuffer {
  def deserialize(raw: Array[Byte]): CovBuffer = {
    val bb = ByteBuffer.wrap(raw)
    val buf = new CovBuffer
    val dim = bb.getInt
    if (dim == -1) return buf
    buf.allocate(dim)
    var i = 0
    while (i < buf.sums.length) {
      val n = bb.getInt
      if (n >= 0) {
        val b = new Array[Byte](n)
        bb.get(b)
        buf.sums(i) = new JBigDecimal(new BigInteger(b), 6)
      } // n == -1: the cell never saw a finite term — stays null
      i += 1
    }
    buf
  }

  val cellsType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("s", DecimalType(38, 6), nullable = true))),
    containsNull = false)
}

/** `cov_partials_agg(emb)` → every exact covariance-partial cell of the
  * vector stream as array<struct<i, j, s:decimal(38,6)>>: (i, j) with
  * j ≥ i the upper-triangle product sums, (i, −1) the mean terms,
  * (−1, −1) the row count. NULL vectors contribute nothing (not even to
  * the count — the explode form's concat-with-null behavior). Exploding
  * the result reproduces [[graft.ops.Similarity.covPartials]]'s table
  * exactly (SimilaritySpec pins the equality). */
case class CovPartialsAgg(
    embExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CovBuffer] {

  override def children: Seq[Expression] = Seq(embExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = CovBuffer.cellsType
  override def prettyName: String = "cov_partials_agg"

  override def checkInputDataTypes(): TypeCheckResult = embExpr.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $other")
  }

  override def createAggregationBuffer(): CovBuffer = new CovBuffer

  override def update(buffer: CovBuffer, input: InternalRow): CovBuffer = {
    val v = embExpr.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: CovBuffer, input: CovBuffer): CovBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: CovBuffer): Any = {
    if (buffer.d == -1) return new GenericArrayData(Array.empty[Any])
    val d = buffer.d
    val out = new Array[Any](buffer.sums.length)
    def cell(i: Int, j: Int, s: JBigDecimal): InternalRow =
      // null sum = every term was non-finite (Cast→NULL, sum of NULLs)
      InternalRow(i, j,
        if (s == null) null else Decimal(new scala.math.BigDecimal(s), 38, 6))
    var k = 0
    while (k < d) { out(k) = cell(k, -1, buffer.sums(k)); k += 1 }
    var t = d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { out(t) = cell(i, j, buffer.sums(t)); t += 1; j += 1 }
      i += 1
    }
    out(out.length - 1) = cell(-1, -1, buffer.sums.last)
    new GenericArrayData(out)
  }

  override def serialize(buffer: CovBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CovBuffer =
    CovBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CovPartialsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovPartialsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovPartialsAgg =
    copy(embExpr = newChildren(0))
}

object CovPartials {
  /** Column wrapper: the whole exact partials table as one array value. */
  def covPartialsAgg(emb: Column): Column =
    ColumnBridge.column(
      CovPartialsAgg(ColumnBridge.expression(emb)).toAggregateExpression())
}
