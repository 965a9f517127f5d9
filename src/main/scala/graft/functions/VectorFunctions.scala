package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns — no UDFs, no
  * serialization boundary. The dot-product/norm folds run through the
  * native [[NativeExpressions.DotProduct]] expression (real `doGenCode`):
  * exact cosine over candidates is the hot loop of every verification
  * stage, and Spark's higher-order-function formulation
  * (`aggregate`/`zip_with`) is CodegenFallback — an interpreted lambda
  * walk per pair. The native expression runs the IDENTICAL left-to-right
  * double accumulation, so results are bit-equal to the HOF form
  * (SimilaritySpec pins this) and the cross-engine DuckDB oracles that
  * mirror the fold shape are unaffected.
  */
object VectorFunctions {

  /** Elementwise cast to double (embeddings ship as float32). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product: left-to-right double fold, native codegen'd. NULL on
    * width mismatch (as the zip_with fold it replaces was). */
  def dot(a: Column, b: Column): Column = NativeExpressions.dotProduct(a, b)

  /** Squared L2 norm (= dot(a, a): same op sequence as the
    * `aggregate(a, 0.0, acc + x*x)` fold it replaces). */
  def normSq(a: Column): Column = NativeExpressions.dotProduct(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity of two raw vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (the batch path: compute each vector's
    * norm once, reuse across all pair comparisons). */
  def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
