package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Inner equi-join of `fact` and `dim` on `key`, salted `salts` ways.
    * The salt is a deterministic hash of the whole fact row (not a RNG), so
    * retries and re-runs produce identical partitioning. Result equals the
    * plain `fact.join(dim, key)` bit-for-bit — only the shuffle layout
    * changes. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn(
      "__salt",
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(salts.toLong))
        .cast("int"))
    val repDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }
}
