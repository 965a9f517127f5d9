package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built from
  * higher-order functions (`zip_with`/`aggregate`) — no UDFs, no
  * serialization boundary. Note Spark's higher-order functions are
  * CodegenFallback (interpreted lambdas): fine here because these run on
  * candidate-sized inputs (post-LSH pairs, broadcast query sets); the
  * signature-building hot loops live in
  * [[graft.functions.NativeExpressions]] with real `doGenCode`.
  *
  * All folds accumulate left-to-right in double, so results are
  * IEEE-deterministic and reproducible across engines that reduce in the
  * same order (the DuckDB oracles mirror the fold shape).
  */
object VectorFunctions {

  /** Elementwise cast to double (embeddings ship as float32). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product: left-to-right double fold over the zipped products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity of two raw vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (the batch path: compute each vector's
    * norm once, reuse across all pair comparisons). */
  def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
