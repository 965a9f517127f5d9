package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Exact

/** Deterministic sampling for training-data pipelines.
  *
  * RNG-based `df.sample` is irreproducible across retries/replans (task
  * reruns reseed) — a dataset build wants the SAME sample every run, from
  * any engine. So the sampling decision is a pure function of the row's id:
  * a portable hash bucket in [0, 100) compared to the stratum's rate. The
  * filter is a map-side predicate — no shuffle, no state; at 100 TB it runs
  * at scan speed and composes with partition pruning.
  *
  * The bucket uses the md5-prefix trick shared with the dedup oracles
  * (15 hex chars → 60-bit non-negative int), so any SQL engine reproduces
  * the exact sample membership (xxhash64 would be Spark-only).
  */
object Sampling {

  /** Portable per-row bucket in [0, 100): md5 of the id's decimal string. */
  def bucket(idCol: Column): Column =
    pmod(conv(substring(md5(idCol.cast("string").cast("binary")), 1, 15), 16, 10)
           .cast("long"), lit(100L)).cast("int")

  /** Keep each row iff bucket(id) < rate(stratum), with per-stratum percent
    * rates — e.g. oversample rare/high-quality strata, downsample bulk.
    * Rows keep a `sample_bucket` column so downstream splits (train/val =
    * bucket ranges) stay consistent with the sampling decision. */
  def stratified(df: DataFrame, stratumCol: Column, idCol: Column,
                 rates: Map[String, Int], defaultRate: Int = 0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(stratumCol === lit(k), lit(v)).otherwise(acc)
    }
    df.withColumn("sample_bucket", bucket(idCol))
      .filter(col("sample_bucket") < rate)
  }

  /** Deterministic train/val/test assignment from the SAME portable bucket
    * as [[stratified]]/[[balanceDomains]]: each row's split is a pure
    * function of its id (contiguous bucket ranges in declaration order), so
    * membership never drifts across runs, engines, or retries, and stays
    * consistent with any earlier bucket-based sampling decision — a row
    * sampled at rate r and assigned 'train' today gets the identical
    * labels in every future build. Map-side projection, no shuffle.
    *
    * @param splits (name, percent) in declaration order; percents must sum
    *               to exactly 100 so every row lands in exactly one split.
    */
  def split(df: DataFrame, idCol: Column, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "splits must be positive")
    require(splits.map(_._2).sum == 100, "split percents must sum to 100")
    val bounds = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val b = bucket(idCol)
    val expr = splits.zip(bounds).reverse.tail.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), hi)) => when(b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("sample_bucket", b).withColumn("split", expr)
  }

  /** Domain-mix rebalancing with DATA-DERIVED rates — the "equalize
    * domains" step of training-data mixing: every stratum (source domain)
    * downsamples toward the smallest one, rate_g = ⌊100·min_count/count_g⌋
    * percent (the smallest domain keeps 100%). Rates come from one tiny
    * aggregate over the stratum column (domains number in the dozens even
    * at 100 TB) broadcast back onto the scan; membership stays the same
    * portable md5 bucket as [[stratified]], so the sample is deterministic
    * across retries and engines and downstream bucket-range splits remain
    * valid. Equalization is percent-granular by construction (a rate is an
    * integer percent) — the contract is reproducibility, not exact counts.
    */
  def balanceDomains(df: DataFrame, stratumCol: Column, idCol: Column): DataFrame = {
    val counts = df.groupBy(stratumCol.as("__stratum"))
      .agg(count(lit(1)).as("__cnt"))
    // min over the (tiny) per-stratum counts; window over one partition is
    // fine HERE because its input is |domains| rows, never the data
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = counts
      .withColumn("keep_rate",
        floor(lit(100.0) * min(col("__cnt")).over(w) / col("__cnt")).cast("int"))
      .select(col("__stratum"), col("keep_rate"))
    // null-SAFE join: a NULL stratum (untagged rows) is a legitimate group —
    // groupBy already counts it, so a null-unsafe join would let it drive
    // min(__cnt) while silently dropping its rows from the output
    df.withColumn("sample_bucket", bucket(idCol))
      .join(broadcast(rates), stratumCol <=> col("__stratum"))
      .filter(col("sample_bucket") < col("keep_rate"))
      .drop("__stratum")
  }

  /** Token-budget mixture sampling: downsample each stratum (language,
    * domain) toward a per-stratum TOKEN budget — the data-mixing
    * primitive when the recipe targets token counts, not document counts
    * (training mixtures are specified in tokens). `keep_rate =
    * min(100, (100·budget) div stratum_tokens)` — EXACT integer
    * arithmetic (the double floor() form can straddle an integer
    * boundary across engines) — compared against the same portable md5
    * bucket as every other sampling decision, so membership is
    * reproducible and consistent with stratified/split choices. Totals
    * aggregate map-side-combinable; the tiny rate table broadcasts onto
    * the scan; membership is a map-side predicate. */
  def tokenBudget(df: DataFrame, stratumCol: Column, idCol: Column,
                  tokensCol: Column, budgetTokens: Long): DataFrame = {
    val totals = df.groupBy(stratumCol.as("__stratum"))
      .agg(sum(tokensCol).as("__toks"))
    // a zero-token stratum makes DIV yield NULL, which least() skips —
    // keep_rate would silently become 100 (keep all) with no DuckDB-shared
    // semantics; make the degenerate case explicit and engine-identical
    val rates = totals
      .withColumn("keep_rate",
        when(col("__toks") > 0,
          least(lit(100L), expr(s"(${100L * budgetTokens}) DIV __toks")))
          .otherwise(lit(100L)).cast("int"))
      .select(col("__stratum"), col("keep_rate"))
    df.withColumn("sample_bucket", bucket(idCol))
      .join(broadcast(rates), stratumCol <=> col("__stratum"))
      .filter(col("sample_bucket") < col("keep_rate"))
      .drop("__stratum")
  }

  /** Quality-weighted deterministic sampling: keep probability proportional
    * to a per-row [0,1] quality score — high-quality rows survive at up to
    * 100%, junk at (near) 0% — the soft alternative to a hard quality-gate
    * cutoff when building a mixed-quality corpus. `keep_rate =
    * round(100·score)` compared against the same portable md5 bucket as
    * every other sampling decision, so membership is reproducible across
    * engines/retries and consistent with stratified/split choices. The
    * score is typically itself a deterministic aggregate (e.g. stopword
    * ratio); given the same score, the decision is a map-side predicate —
    * no shuffle beyond whatever computed the score. */
  def qualityWeighted(df: DataFrame, scoreCol: Column, idCol: Column): DataFrame =
    df.withColumn("keep_rate", round(scoreCol * 100).cast("int"))
      .withColumn("sample_bucket", bucket(idCol))
      .filter(col("sample_bucket") < col("keep_rate"))

  /** Temperature-flattened training-mixture schedule (the τ=0.5 sampling
    * of multilingual/multi-source LM training, Conneau & Lample '19 /
    * Raffel '20 style): per source, sampling weight w_s ∝ √n_s — between
    * proportional (τ=1, big sources dominate) and uniform (τ=0, tiny
    * sources over-repeat) — plus the epoch math a data loader consumes:
    * expected tokens under the budget and passes over the source
    * (epochs > 1 ⇒ the source repeats and is flagged `upsampled`).
    *
    * Determinism: each √n is ONE correctly-rounded IEEE op on an exactly
    * represented integer; the only order-sensitive reduction (Σ√n) runs in
    * DECIMAL(38,6) (exact, associative); every derived double is a fixed
    * left-to-right chain of scalar IEEE ops — any engine reproduces the
    * identical schedule, which the DuckDB oracle hash-checks.
    *
    * Scale: input is the per-source token rollup (|sources| rows — the
    * corpus scan happened upstream); the totals row is a broadcast 1-row
    * cross join. Nothing here is corpus-sized.
    *
    * @param sourceTokens (source, n_tokens) rollup, n_tokens > 0
    * @param budgetTokens training-token budget the weights allocate
    */
  def temperatureMixture(sourceTokens: DataFrame,
                         budgetTokens: Double = 1e6): DataFrame = {
    val tot = sourceTokens.agg(
      sum(col("n_tokens")).as("total_tokens"),
      Exact.dsum(sqrt(col("n_tokens").cast("double"))).as("sqrt_sum"))
    sourceTokens.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens").cast("double"))
          .as("raw_share"),
        (sqrt(col("n_tokens").cast("double")) / col("sqrt_sum")).as("weight"))
      .withColumn("expected_tokens", col("weight") * lit(budgetTokens))
      .withColumn("epochs", col("expected_tokens") / col("n_tokens"))
      .withColumn("upsampled", col("epochs") > lit(1.0))
  }
}
