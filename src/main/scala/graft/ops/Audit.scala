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

  /** Declarative data-quality expectations over ONE table: each rule is a
    * named VIOLATION predicate; the report is one row per rule with its
    * violation count and a pass flag — the expectations gate
    * (great-expectations / dbt-test style) a pipeline runs before
    * publishing a load. All rules evaluate in a SINGLE scan (one
    * conditional count per rule in one aggregate — never a pass per
    * rule); cross-table rules (FK orphans) belong to [[coverage]], and
    * uniqueness needs its own keyed aggregate ([[duplicateKeys]]).
    *
    * NULL semantics are SQL's: a predicate evaluating to NULL does NOT
    * count as a violation, so a NULL column value slips every range/set
    * rule on that column — by design (it keeps the gate hash-comparable
    * to any SQL engine), which means null-intolerant columns need their
    * own explicit `isNull` rule (or an `isNull ||` arm), as the registry
    * entry's `null_orderkey` rule demonstrates. */
  def expect(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val vCounts = rules.zipWithIndex.map { case ((_, c), i) =>
      count(when(c, 1)).as(s"__v$i")
    }
    val counts = df.agg(count(lit(1)).as("n_rows"), vCounts: _*)
    val names = rules.map(_._1)
    counts.select(
      explode(array(names.zipWithIndex.map { case (n, i) =>
        struct(lit(n).as("rule"), col(s"__v$i").as("n_violations"),
          col("n_rows").as("n_rows"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Duplicate-key audit: (key count > 1) groups summarized as one row —
    * the uniqueness expectation, which [[expect]]'s single-scan
    * conditional counts cannot express. */
  def duplicateKeys(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("__k")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(count(lit(1)).as("n_dup_keys"),
           coalesce(sum(col("__n")), lit(0L)).as("n_rows_in_dups"))

  /** Per-group z-score outlier flags over an INTEGER-valued measure: each
    * row gets (value - group_mean)/group_std and an |z| > `threshold`
    * flag — the distribution-drift audit a pipeline runs per source/shard
    * before accepting a load (a source whose length distribution suddenly
    * grows a tail is usually a scraper regression, not new content).
    *
    * Determinism: the group moments accumulate the integer value and its
    * square in DECIMAL(38,6) (exact, associative — safe from both fp
    * reduction order and long overflow at corpus scale), and only the
    * final mean/variance/sqrt run in double — each a single IEEE
    * operation, bit-identical across engines (the square itself happens in
    * long arithmetic — exact while |value| <= ~3e9, which every length-like
    * measure satisfies). Population variance (÷n).
    * Degenerate groups (std = 0, e.g. a single-row group) emit z = 0 so
    * the flag stays false rather than NaN-poisoning the report.
    *
    * Shape: one hash aggregate keyed by the group (map-side combined)
    * joined back to the rows — the group-moment side is |groups|-sized,
    * broadcast at any realistic cardinality; rows shuffle zero times. */
  def groupZScoreOutliers(df: DataFrame, group: Column, value: Column,
                          threshold: Double = 2.0): DataFrame = {
    val D = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    val moments = df.groupBy(group.as("__g"))
      .agg(count(lit(1)).as("__n"),
           sum(value.cast(D)).cast("double").as("__sx"),
           sum((value * value).cast(D)).cast("double").as("__sx2"))
      .select(col("__g"),
        (col("__sx") / col("__n")).as("__mean"),
        // clamp at 0: fp cancellation can leave a tiny negative variance in
        // a constant-valued group, and NaN ordering semantics differ across
        // engines — the clamp routes that case into the std=0 arm instead
        sqrt(greatest(col("__sx2") / col("__n") -
          (col("__sx") / col("__n")) * (col("__sx") / col("__n")), lit(0.0)))
          .as("__std"))
    df.join(broadcast(moments), group === col("__g"))
      .withColumn("z",
        when(col("__std") === 0.0, 0.0)
          .otherwise((value.cast("double") - col("__mean")) / col("__std")))
      .withColumn("is_outlier", abs(col("z")) > threshold)
      .drop("__g", "__mean", "__std")
  }
}
