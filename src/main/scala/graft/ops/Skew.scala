package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MapType, StructType, ArrayType}

/** Skew-mitigation join: explicit key salting.
  *
  * A shuffle join keyed on a skewed column sends every row of a hot key to
  * ONE reducer — the classic 100 TB straggler. AQE's skew-join split covers
  * sort-merge joins it can observe, but not pre-aggregated exchanges or
  * joins feeding a same-key groupBy. Salting is the explicit fix: the big
  * side's key becomes (key, salt) with a deterministic per-row salt, the
  * small(er) side is replicated once per salt value, and the hot key's rows
  * spread across `salts` reducers. Replication cost is |dim| × salts —
  * chosen when the dim is too big to broadcast but far smaller than the
  * fact.
  */
object Skew {

  /** xxhash64 rejects MapType (no canonical entry order) at analysis — skip
    * such columns when deriving the salt. */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType     => false
    case s: StructType  => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType   => hashable(a.elementType)
    case _              => true
  }

  /** Inner equi-join of `fact` and `dim` on `key`, salted `salts` ways.
    * The salt is a deterministic hash of the fact row's hash-supported
    * columns (not a RNG), so retries and re-runs produce identical
    * partitioning, and the internal salt column name is chosen to never
    * collide with either side's columns. Result equals the plain
    * `fact.join(dim, key)` bit-for-bit — only the shuffle layout changes.
    *
    * Limitation (inherent to content-derived salts): rows of a hot key that
    * are fully identical across all hashable columns share one salt and
    * still co-locate. If the skewed workload is exact-duplicate rows,
    * deduplicate (or aggregate) them upstream first — that shrinks the hot
    * key outright, which beats any salting.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salt = Iterator.iterate("__salt")(_ + "_")
      .dropWhile(n => fact.columns.contains(n) || dim.columns.contains(n))
      .next()
    val saltSrc = fact.schema.fields.filter(f => hashable(f.dataType)) match {
      case Array() => Array(col(key)) // degenerate: all-map schema
      case fs      => fs.map(f => col(f.name))
    }
    val saltedFact = fact.withColumn(
      salt,
      pmod(xxhash64(saltSrc.toIndexedSeq: _*), lit(salts.toLong)).cast("int"))
    val repDim = dim.withColumn(salt, explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim, Seq(key, salt)).drop(salt)
  }

  /** Key-skew diagnostic — the measurement run BEFORE choosing a
    * mitigation ([[saltedJoin]], AQE skew split, broadcast): per-key row
    * counts reduced to one summary row with `skew_ratio` = max/mean
    * group size (1.0 = perfectly uniform) and `n_hot_keys` = keys at or
    * above `hotMultiple` × mean — the keys that actually need salting.
    * One keyed aggregate over the fact (checkpointed — the totals and
    * the hot-key count both read it), a 1-row totals broadcast back onto
    * the |keys|-sized counts, a final scalar aggregate; the hot test is
    * n·n_keys ≥ hotMultiple·n_rows in IEEE-identical double (no
    * single-partition window anywhere, so the shape survives
    * high-cardinality keys). */
  def skewReport(df: DataFrame, key: org.apache.spark.sql.Column,
                 hotMultiple: Double = 2.0): DataFrame = {
    val sizes = df.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val totals = sizes.agg(count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"), max(col("n")).as("max_rows"))
    sizes.crossJoin(broadcast(totals))
      .agg(
        // empty input: the crossJoin has zero rows and max() yields NULL —
        // report n_keys 0 (matching the oracle's COUNT(*)); the row/ratio
        // columns stay NULL (no data, no mean)
        coalesce(max(col("n_keys")), lit(0L)).as("n_keys"),
        max(col("n_rows")).as("n_rows"),
        max(col("max_rows")).as("max_rows"),
        (max(col("n_rows")).cast("double") / max(col("n_keys"))).as("mean_rows"),
        (max(col("max_rows")).cast("double") * max(col("n_keys")) /
          max(col("n_rows"))).as("skew_ratio"),
        count(when(col("n").cast("double") * col("n_keys") >=
          lit(hotMultiple) * col("n_rows").cast("double"), 1)).as("n_hot_keys"))
  }
}
