package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{StructField, StructType}

/** The sink schema-evolution contract — ONE policy shared by every
  * standing-state sink (star parquet sinks, the SCD1/SCD2 state merges,
  * the JDBC upsert): what happens when a batch arrives whose schema
  * differs from the standing table's.
  *
  *   - **Widened batch (new columns): accepted.** The standing rows carry
  *     NULL for the new columns — the semantics every warehouse user
  *     expects from a column added upstream, and the only choice that
  *     loses nothing. (The reference sidesteps evolution only because its
  *     schemas are frozen SQL DDL — sync_oltp_to_olap.py:56-62's fixed
  *     column lists; a standing deployment hits a widened batch in week
  *     one.)
  *   - **Narrowed batch (standing columns missing): REFUSED loudly,**
  *     naming the dropped columns. A narrowed batch is upstream breakage
  *     (a source deploy that lost a field) far more often than an
  *     intended migration, and accepting it would either silently NULL a
  *     column that has real data (merge sinks) or silently fork the
  *     table's schema (overwrite sinks). Intended column removals are a
  *     migration, written explicitly by the operator, not inferred from
  *     one batch.
  *   - **Retyped column: REFUSED loudly,** naming old and new types.
  *     Implicit cross-type casts silently lose precision or range;
  *     type migrations are rewrites, not merges.
  *
  * Name matching is case-insensitive, matching Spark's default resolver.
  */
object SchemaEvolution {

  final case class Diff(
      added: Seq[StructField],
      missing: Seq[StructField],
      retyped: Seq[(String, String, String)])

  /** Structural diff of a batch schema against the standing schema. */
  def diff(standing: StructType, batch: StructType): Diff = {
    val s = standing.fields.map(f => f.name.toLowerCase -> f).toMap
    val b = batch.fields.map(f => f.name.toLowerCase -> f).toMap
    Diff(
      added = batch.fields.toSeq.filterNot(f => s.contains(f.name.toLowerCase)),
      missing = standing.fields.toSeq.filterNot(f => b.contains(f.name.toLowerCase)),
      retyped = standing.fields.toSeq.flatMap { f =>
        b.get(f.name.toLowerCase).collect {
          case bf if bf.dataType != f.dataType =>
            (f.name, f.dataType.simpleString, bf.dataType.simpleString)
        }
      })
  }

  /** The gate: enforce the contract above, returning the (possibly empty)
    * added columns the caller must widen the standing side with. Throws
    * [[IllegalArgumentException]] on a narrowed or retyped batch — BEFORE
    * any write has destroyed or forked state. */
  def requireEvolvable(standing: StructType, batch: StructType,
                       context: String): Seq[StructField] = {
    val d = diff(standing, batch)
    require(d.missing.isEmpty,
      s"$context: batch is missing standing column(s) " +
        s"[${d.missing.map(_.name).mkString(", ")}] — refusing the write. " +
        "A narrowed batch is treated as upstream breakage, not a migration; " +
        "drop columns with an explicit rewrite, never through a merge. " +
        s"standing=${standing.simpleString} batch=${batch.simpleString}")
    require(d.retyped.isEmpty,
      s"$context: batch changes column type(s) " +
        s"[${d.retyped.map { case (n, o, w) => s"$n: $o -> $w" }.mkString(", ")}] " +
        "— refusing the write. Type migrations are explicit rewrites.")
    d.added
  }

  /** Widen `df` to also carry every column of `to` it lacks, as typed
    * NULLs (appended after df's own columns). Used on the STANDING side
    * after [[requireEvolvable]] admits a widened batch. */
  def widen(df: DataFrame, to: StructType): DataFrame = {
    val have = df.columns.map(_.toLowerCase).toSet
    to.fields.filterNot(f => have.contains(f.name.toLowerCase))
      .foldLeft(df)((acc, f) =>
        acc.withColumn(f.name, lit(null).cast(f.dataType)))
  }
}
