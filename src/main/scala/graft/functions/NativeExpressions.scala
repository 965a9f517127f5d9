package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with `doGenCode`) for the hot per-row loops
  * of the LSH operators. Spark's higher-order array functions
  * (`transform`/`aggregate`/`zip_with`) are CodegenFallback — every lambda
  * step is an interpreted expression-tree walk, which turns the
  * planes×dim×vectors SRP signature and the perms×shingles minhash into
  * tens of milliseconds PER ROW. These expressions compile the same math to
  * a tight generated loop (and keep an interpreted `eval` for completeness).
  *
  * Semantics are bit-identical to the composed-function formulations they
  * replace (same left-to-right double accumulation, same xxhash64 chaining),
  * so the cross-engine DuckDB oracles that replay the algorithms are
  * unaffected.
  */
object NativeExpressions {

  /** Sign-random-projection band values: for each band b of `rows` planes,
    * value = Σ_r [emb · plane_{b·rows+r} >= 0] · 2^(rows-1-r), i.e. the
    * band's sign bits packed MSB-first into one long — exactly
    * `aggregate(slice(sig, b*rows+1, rows), 0L, acc*2+bit)` over
    * `sig = transform(planes, p => [dot(emb,p) >= 0])`. */
  case class SrpBandValues(child: Expression, planes: Array[Array[Double]], rows: Int)
      extends UnaryExpression {
    require(planes.nonEmpty && planes.length % rows == 0,
      s"plane count ${planes.length} must be a multiple of rows=$rows")
    private val bands = planes.length / rows

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got $other")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "srp_band_values"

    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var v = 0L
        var r = 0
        while (r < rows) {
          val p = planes(b * rows + r)
          val n = math.min(a.numElements(), p.length)
          var dot = 0.0
          var d = 0
          while (d < n) { dot += a.getDouble(d) * p(d); d += 1 }
          v = v * 2 + (if (dot >= 0) 1L else 0L)
          r += 1
        }
        out(b) = v
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, arr => {
        // every local is freshName'd: this snippet can be inlined into
        // Spark's own generated projections (e.g. the ObjectHashAggregate
        // result projection), whose writer loops declare their own locals —
        // fixed names collide, janino rejects the class, and the whole
        // projection silently falls back to interpreted mode
        val out = ctx.freshName("srpOut")
        val b = ctx.freshName("srpB")
        val v = ctx.freshName("srpV")
        val r = ctx.freshName("srpR")
        val p = ctx.freshName("srpP")
        val n = ctx.freshName("srpN")
        val dot = ctx.freshName("srpDot")
        val d = ctx.freshName("srpD")
        s"""
        long[] $out = new long[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          long $v = 0L;
          for (int $r = 0; $r < $rows; $r++) {
            double[] $p = $planesRef[$b * $rows + $r];
            int $n = java.lang.Math.min($arr.numElements(), $p.length);
            double $dot = 0.0;
            for (int $d = 0; $d < $n; $d++) { $dot += $arr.getDouble($d) * $p[$d]; }
            $v = $v * 2 + ($dot >= 0 ? 1L : 0L);
          }
          $out[$b] = $v;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): SrpBandValues =
      copy(child = newChild)
  }

  /** MinHash signature over a shingle-hash array: slot i holds
    * min over shingles of the chained xxhash64 re-key — identical values to
    * `array_min(transform(hs, h => xxhash64(h, i, seed)))` (the SQL
    * function chains: hashLong(h, 42) → hashLong(i, ·) → hashLong(seed, ·)).
    * One tight perms×shingles loop instead of `perms` interpreted lambda
    * walks over the array. */
  case class MinHashSignature(child: Expression, perms: Int, seed: Long)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $other")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val out = Array.fill(perms)(Long.MaxValue)
      var s = 0
      while (s < a.numElements()) {
        val base = XXH64.hashLong(a.getLong(s), 42L)
        var i = 0
        while (i < perms) {
          val v = XXH64.hashLong(seed, XXH64.hashLong(i.toLong, base))
          if (v < out(i)) out(i) = v
          i += 1
        }
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val xxh = classOf[XXH64].getName
      nullSafeCodeGen(ctx, ev, arr => {
        // freshName'd locals — see SrpBandValues.doGenCode for why
        val out = ctx.freshName("mhOut")
        val s = ctx.freshName("mhS")
        val base = ctx.freshName("mhBase")
        val i = ctx.freshName("mhI")
        val v = ctx.freshName("mhV")
        s"""
        long[] $out = new long[$perms];
        java.util.Arrays.fill($out, Long.MAX_VALUE);
        for (int $s = 0; $s < $arr.numElements(); $s++) {
          long $base = $xxh.hashLong($arr.getLong($s), 42L);
          for (int $i = 0; $i < $perms; $i++) {
            long $v = $xxh.hashLong(${seed}L, $xxh.hashLong((long) $i, $base));
            if ($v < $out[$i]) $out[$i] = $v;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** SimHash fingerprint over a token-hash array (duplicates = weights):
    * bit i of the result is set iff Σ_tokens (±1 by bit i of the token
    * hash) >= 0 — identical to `bits` signed bit-vote sum aggregates, but
    * one tight loop and a few hundred bytes of generated code (the
    * aggregate formulation janino-compiles a 60-column HashAggregate,
    * seconds of compile time per plan). */
  case class SimHashBits(child: Expression, bits: Int)
      extends UnaryExpression {
    require(bits > 0 && bits <= 64, s"bits must be in 1..64: $bits")
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $other")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_bits"

    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](bits)
      var s = 0
      while (s < a.numElements()) {
        val h = a.getLong(s)
        var i = 0
        while (i < bits) {
          counts(i) += (if (((h >> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
        s += 1
      }
      var fp = 0L
      var i = 0
      while (i < bits) { if (counts(i) >= 0) fp |= (1L << i); i += 1 }
      fp
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        // freshName'd locals — see SrpBandValues.doGenCode for why
        val counts = ctx.freshName("shCounts")
        val s = ctx.freshName("shS")
        val h = ctx.freshName("shH")
        val i = ctx.freshName("shI")
        val fp = ctx.freshName("shFp")
        val j = ctx.freshName("shJ")
        s"""
        int[] $counts = new int[$bits];
        for (int $s = 0; $s < $arr.numElements(); $s++) {
          long $h = $arr.getLong($s);
          for (int $i = 0; $i < $bits; $i++) {
            $counts[$i] += ((($h >> $i) & 1L) == 1L) ? 1 : -1;
          }
        }
        long $fp = 0L;
        for (int $j = 0; $j < $bits; $j++) { if ($counts[$j] >= 0) $fp |= (1L << $j); }
        ${ev.value} = $fp;
        """
      })

    override protected def withNewChildInternal(newChild: Expression): SimHashBits =
      copy(child = newChild)
  }

  /** Dot product of two double arrays with LEFT-TO-RIGHT accumulation —
    * bit-identical to `aggregate(zip_with(a, b, (x,y) => x*y), 0.0,
    * (acc,v) => acc+v)` (same IEEE op sequence), but a tight generated
    * loop instead of two interpreted lambda walks per pair. This is the
    * exact-cosine hot loop of every candidate-verification stage
    * (knn/LSH/embedding-dedup): candidates × dim multiplications per
    * batch. Width-mismatched inputs return NULL — a mismatch signals an
    * upstream bug, and the zip_with/aggregate fold this replaces surfaced
    * it as NULL too (a min-length partial fold would be a plausible-looking
    * wrong cosine instead). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double>, got $other")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"
    // null on width mismatch even when both inputs are non-nullable
    override def nullable: Boolean = true

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // freshName'd locals — see SrpBandValues.doGenCode for why
        val n = ctx.freshName("dpN")
        val acc = ctx.freshName("dpAcc")
        val i = ctx.freshName("dpI")
        s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) { $acc += $a.getDouble($i) * $b.getDouble($i); }
          ${ev.value} = $acc;
        }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Unicode NFC normalization — the canonicalization pass text pipelines
    * run before hashing/dedup (composed vs decomposed code points hash
    * differently; "café" has two byte encodings). A native expression keeps
    * it inside whole-stage codegen — a Scala UDF here would add a
    * serialization boundary around every row of a corpus-wide scan.
    * Backed by `java.text.Normalizer` (ICU-equivalent for NFC). */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $other")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      // fast path: Normalizer.isNormalized avoids allocating for the
      // overwhelmingly-already-NFC case
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        // freshName'd locals — see SrpBandValues.doGenCode for why
        val s = ctx.freshName("nfcS")
        s"""
        String $s = $c.toString();
        if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
          ${ev.value} = $c;
        } else {
          ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
            java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
        }
        """
      })

    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
  }

  /** Column wrapper: SRP band values of a double-array embedding column. */
  def srpBandValues(emb: Column, planes: Seq[Seq[Double]], rows: Int): Column =
    ColumnBridge.column(
      SrpBandValues(ColumnBridge.expression(emb), planes.map(_.toArray).toArray, rows))

  /** Column wrapper: minhash signature of a long-array shingle-hash column. */
  def minhashSignature(hashes: Column, perms: Int, seed: Long): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), perms, seed))

  /** Column wrapper: simhash fingerprint of a long-array token-hash column. */
  def simhashBits(hashes: Column, bits: Int): Column =
    ColumnBridge.column(SimHashBits(ColumnBridge.expression(hashes), bits))

  /** Column wrapper: native dot product of two double-array columns. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: Unicode NFC normalization of a string column. */
  def nfcNormalize(s: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(s)))
}
