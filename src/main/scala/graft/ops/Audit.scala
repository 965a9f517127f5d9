package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-table reconciliation audits — the data-quality gates a pipeline
  * runs between stages (every doc must have its embedding before ANN jobs;
  * orphan embeddings mean an upstream delete never propagated).
  *
  * One full outer join on ids reduced to a single summary row of counts —
  * the join shuffles ids ONLY (both sides project their key before the
  * join), so at 100 TB this costs two id-column scans + one id shuffle, no
  * payloads ever move.
  */
object Audit {

  /** Coverage summary between a left table and a right table keyed by
    * possibly-different id columns: total/matched/missing counts, as one
    * row. `n_left_only` = left rows with no right match (e.g. docs missing
    * embeddings); `n_right_only` = unmatched right rows (orphans).
    *
    * NULL ids are EXCLUDED from every count: a null key can never join, so
    * through a full outer join it would surface as a phantom row counted
    * in BOTH "only" columns while missing from the totals — breaking
    * n_matched + n_left_only = n_left. Audit null keys separately with a
    * plain `isNull` count; this reconciliation is about id linkage. */
  def coverage(left: DataFrame, leftId: Column,
               right: DataFrame, rightId: Column): DataFrame = {
    val l = left.select(leftId.as("__lid")).filter(col("__lid").isNotNull).distinct()
    val r = right.select(rightId.as("__rid")).filter(col("__rid").isNotNull).distinct()
    l.join(r, col("__lid") === col("__rid"), "full_outer")
      .agg(
        count(col("__lid")).as("n_left"),
        count(col("__rid")).as("n_right"),
        count(when(col("__lid").isNotNull && col("__rid").isNotNull, 1)).as("n_matched"),
        count(when(col("__rid").isNull, 1)).as("n_left_only"),
        count(when(col("__lid").isNull, 1)).as("n_right_only"))
  }
}
