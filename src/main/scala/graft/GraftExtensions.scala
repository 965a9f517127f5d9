package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.NativeExpressions.{DotProduct, MinHashSignature, NfcNormalize, SimHashBits, SrpBandValues}

/** SparkSessionExtensions hook registering the engine's planner strategy
  * for the native as-of join ([[graft.plans.AsOfJoinStrategy]]) and its
  * native expressions as SQL functions, so `spark.sql` users (and external
  * SQL tooling) reach the codegen'd hot loops without touching the Scala
  * API:
  *
  *   - `graft_simhash_bits(array<bigint>, bits)`
  *   - `graft_minhash_signature(array<bigint>, perms, seed)`
  *   - `graft_srp_band_values(array<double>, array<array<double>>, rows)`
  *   - `graft_dot(array<double>, array<double>)`
  *   - `graft_nfc_normalize(string)`
  *
  * Wire up via `GraftSession.builder` (already applied) or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a stock session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def constInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a constant")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"$what must be int, got $other")
    }
  }

  private def constLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a constant")
    e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(s"$what must be long, got $other")
    }
  }

  /** Materialize a foldable array<array<numeric>> literal into the plane
    * matrix SrpBandValues bakes into its generated code (SQL numeric
    * literals arrive as Decimal, not Double). */
  private def constPlanes(e: Expression, what: String): Array[Array[Double]] = {
    require(e.foldable, s"$what must be a constant")
    val elemType = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
             org.apache.spark.sql.types.ArrayType(et, _), _) => et
      case other => throw new IllegalArgumentException(
        s"$what must be array<array<numeric>>, got $other")
    }
    val outer = e.eval().asInstanceOf[ArrayData]
    (0 until outer.numElements()).map { i =>
      val inner = outer.getArray(i)
      (0 until inner.numElements()).map { j =>
        inner.get(j, elemType) match {
          case d: Double => d
          case f: Float => f.toDouble
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case n: Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"$what elements must be numeric, got $other")
        }
      }.toArray
    }.toArray
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: the native as-of join (custom LogicalPlan
    // -> Strategy -> SparkPlan; see graft.plans.AsOfJoin)
    ext.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_simhash_bits"),
      new ExpressionInfo(classOf[SimHashBits].getName, "graft_simhash_bits"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_simhash_bits(hashes, bits)")
        SimHashBits(args(0), constInt(args(1), "bits"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_minhash_signature(hashes, perms, seed)")
        MinHashSignature(args(0), constInt(args(1), "perms"), constLong(args(2), "seed"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_srp_band_values"),
      new ExpressionInfo(classOf[SrpBandValues].getName, "graft_srp_band_values"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_srp_band_values(emb, planes, rows)")
        SrpBandValues(args(0), constPlanes(args(1), "planes"), constInt(args(2), "rows"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b)")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_nfc_normalize(s)")
        NfcNormalize(args(0))
      }))
  }
}
