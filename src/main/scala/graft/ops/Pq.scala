package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

import graft.functions.VectorFunctions._

/** Product quantization (PQ) — the third ANN scale path next to
  * [[Similarity.knnLsh]] and [[Ivf]], and the storage one: each vector is
  * split into `m` subvectors, every subvector is replaced by the id of its
  * nearest entry in a per-subspace codebook, and the vector is stored as
  * `m` small codes (64 float32 dims → 8 bytes at m=8 — a 32× compression
  * of the candidate set). Search is asymmetric distance computation (ADC):
  * a query precomputes its distance to every codebook entry (a tiny
  * m × ncodes table), and a database vector's approximate distance is the
  * sum of `m` table lookups — no float vector is ever touched at query
  * time. This is the layout (after Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public literature) that makes a
  * 100 TB vector corpus searchable from a table that fits in page cache.
  *
  * Everything is deterministic and cross-engine replayable, the same
  * posture as [[Ivf]]:
  *   - codebooks seed from the subvectors of the `ncodes` lowest vec_ids
  *     and refine with a FIXED number of Lloyd rounds; ties in assignment
  *     break by code id;
  *   - codebook means accumulate in DECIMAL(38,6) (exact, order-free) and
  *     divide as doubles, so refined entries are bit-identical no matter
  *     the partitioning;
  *   - subspace distances expand to ‖x‖² − 2·x·c + ‖c‖² over left-to-right
  *     double folds (the [[graft.functions.NativeExpressions.DotProduct]]
  *     codegen'd fold), and the ADC total sums the m subspace distances in
  *     DECIMAL(38,6) — every number an oracle can recompute exactly.
  *
  * Plan shapes for 100 TB: training touches vectors only through
  * (vec_id, sub)-keyed aggregates; codebooks are tiny and BROADCAST into
  * both the encode and the ADC joins; the ADC shuffle carries
  * (query_id, vec_id, partial decimal) pairs with map-side partial
  * aggregation — never a float vector.
  */
object Pq {

  private val D = DataTypes.createDecimalType(38, 6)

  /** A fitted quantizer: `codebook` rows (sub, code, cvec, cn) — m × ncodes
    * rows, always broadcastable. */
  final case class PqModel(codebook: DataFrame, m: Int, subDim: Int)

  /** (vec_id, sub, svec, sn) — each vector split into m subvectors with the
    * subspace squared norm precomputed once.
    *
    * The corpus-side frame (idCol = vec_id) is pinned through
    * [[InternalCaches.persistBounded]]: one [[fit]]+[[encode]] closure
    * otherwise re-evaluates it ~5× per invocation (seed join, per-Lloyd
    * assign, the assignments side AND the left side of the codebook
    * update, then encode's final assign) — the r17 minhash-closure
    * recompute class, measured at 1.8–3.2× on pq_encode isolated. The
    * cache is canonical-plan-keyed, so fit and encode over the same
    * corpus share ONE evaluation, as do repeated invocations in a
    * session; query-side splits (idCol = query_id, a filtered handful of
    * vectors) stay unpinned. Whether to pin is the CALLER's explicit
    * choice (`pin`), not inferred from the id column's name — a corpus
    * passed under another id would silently lose the pin, and a query
    * frame named vec_id would gain one (r18 ADVICE). */
  private def subvectors(embeddings: DataFrame, m: Int, subDim: Int,
                         idCol: String = "vec_id",
                         pin: Boolean = true): DataFrame = {
    // Par.spread before the pin: the FIRST evaluation of the pinned frame
    // otherwise runs the whole slice/norm explode single-task on a
    // one-row-group input (guarded; query-side splits pass at ~ms — r19)
    val sv = Par.spread(embeddings)
      .select(col(idCol), toDouble(col("embedding")).as("emb"))
      .select(col(idCol), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
               slice(col("emb"), s * subDim + 1, subDim).as("svec"))): _*)).as("x"))
      .select(col(idCol), col("x.sub").as("sub"), col("x.svec").as("svec"))
      .withColumn("sn", normSq(col("svec")))
    if (pin) InternalCaches.persistBounded(sv) else sv
  }

  /** Nearest code per (vec_id, sub) by squared L2 (ties by code id). The
    * argmin is `min(struct(d2, code))` — lexicographic struct ordering IS
    * (distance, code-id tie-break), and a hash aggregate with map-side
    * partials beats a sort-based row_number window over the ncodes-times
    * expanded rows. */
  private def assign(sv: DataFrame, codebook: DataFrame): DataFrame =
    sv.join(broadcast(codebook), "sub")
      .select(col("vec_id"), col("sub"), col("code"),
        (col("sn") - lit(2.0) * dot(col("svec"), col("cvec")) + col("cn")).as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.code").as("code"))

  /** Per-(sub, code) mean of the member subvectors, exact-decimal
    * accumulated per dimension (reduction-order-independent, so refined
    * codebooks are bit-identical across partitionings and engines). */
  private def updateCodebook(sv: DataFrame, assignments: DataFrame): DataFrame =
    sv.join(assignments, Seq("vec_id", "sub"))
      .select(col("sub"), col("code"), posexplode(col("svec")))
      .groupBy(col("sub"), col("code"), col("pos"))
      .agg((sum(col("col").cast(D)).cast("double") / count(col("col"))).as("mv"))
      .groupBy(col("sub"), col("code"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("dims"))
      .select(col("sub"), col("code"), col("dims.mv").as("cvec"))
      .withColumn("cn", normSq(col("cvec")))

  /** Fit codebooks: the `ncodes` lowest vec_ids seed every subspace (code =
    * seed's rank by vec_id), then `iters` Lloyd rounds. A code whose cell
    * comes back empty after assignment (possible when two seed subvectors
    * are identical: both tie at distance 0 and the code-id tie-break sends
    * both members to the lower code) carries its previous entry forward, so
    * the codebook always holds exactly m × ncodes entries. */
  def fit(embeddings: DataFrame, m: Int = 8, ncodes: Int = 16,
          iters: Int = 1): PqModel = {
    val dim = embeddings.select(size(col("embedding"))).first().getInt(0)
    require(dim % m == 0, s"embedding width $dim not divisible by m=$m")
    val subDim = dim / m
    val sv = subvectors(embeddings, m, subDim)
    val seedRank = Window.partitionBy(col("sub")).orderBy(col("vec_id"))
    var codebook = sv
      .join(broadcast(embeddings.select(col("vec_id")).orderBy(col("vec_id"))
        .limit(ncodes)), "vec_id")
      .select(col("sub"), (row_number().over(seedRank) - 1).as("code"),
        col("svec").as("cvec"), col("sn").as("cn"))
    (1 to iters).foreach { _ =>
      val refined = updateCodebook(sv, assign(sv, codebook))
      // left-join against the previous codebook so an empty cell keeps its
      // old entry instead of silently vanishing from the refined codebook
      val next = codebook
        .select(col("sub"), col("code"),
          col("cvec").as("__pv"), col("cn").as("__pn"))
        .join(refined.withColumnRenamed("cvec", "__nv")
          .withColumnRenamed("cn", "__nn"), Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("__nv"), col("__pv")).as("cvec"),
          coalesce(col("__nn"), col("__pn")).as("cn"))
        .localCheckpoint(true)
      Checkpoints.unpersist(codebook)
      codebook = next
    }
    // the codebook is m × ncodes rows — land it locally and release the
    // final round's checkpoint so callers (knn_ivf_partial, semanticDedup)
    // don't accumulate executor storage across repeated fits in a session;
    // downstream use is broadcast joins, which a local frame serves fine
    PqModel(Checkpoints.drain(codebook, Seq(codebook)), m, subDim)
  }

  /** Encode every vector as (vec_id, sub, code) — the m-bytes-per-vector
    * compressed form (store as m tinyint columns or a byte array; the
    * exploded rows here are the relational form the oracle checks). */
  def encode(model: PqModel, embeddings: DataFrame): DataFrame =
    assign(subvectors(embeddings, model.m, model.subDim), model.codebook)

  /** IVF+PQ composed search — the FAISS IVFPQ layout: the IVF coarse
    * quantizer prunes to each query's `nprobe` closest lists, and within
    * the candidate lists distance is the PQ ADC sum — so a search touches
    * only the probed lists' CODE rows (m bytes/vector), never a float
    * vector. This is the production shape for billion-scale ANN: coarse
    * pruning bounds the candidate count, PQ bounds the bytes per
    * candidate. At `nprobe = nLists` the candidate set is every vector and
    * the result equals [[search]] exactly (how the registry oracle checks
    * this path); recall ramps with nprobe below that. */
  def searchIvf(model: PqModel, ivf: Ivf.IvfModel, codes: DataFrame,
                queries: DataFrame, k: Int = 5, nprobe: Int = 4): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding"))
    val qsv = subvectors(q, model.m, model.subDim, idCol = "query_id", pin = false)
    val table = qsv.join(broadcast(model.codebook), "sub")
      .select(col("query_id"), col("sub"), col("code"),
        (col("sn") - lit(2.0) * dot(col("svec"), col("cvec")) + col("cn")).as("d"))
    val candidates = Ivf.probeCandidates(ivf, queries, nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2"), col("neighbor_id"))
    codes.join(candidates, Seq("vec_id"))
      .join(broadcast(table), Seq("sub", "code", "query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("d").cast(D)).cast("double").as("adc_d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_d2"))
  }

  /** ADC top-k: each query's distance table to every codebook entry (a
    * broadcastable m × ncodes × |queries| frame) joins the code table on
    * (sub, code); per-candidate totals sum the m lookups in exact decimal.
    * The codes table is the ONLY per-vector input — searches never read
    * the float vectors. */
  def search(model: PqModel, codes: DataFrame, queries: DataFrame,
             k: Int = 5): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding"))
    val qsv = subvectors(q, model.m, model.subDim, idCol = "query_id", pin = false)
    val table = qsv.join(broadcast(model.codebook), "sub")
      .select(col("query_id"), col("sub"), col("code"),
        (col("sn") - lit(2.0) * dot(col("svec"), col("cvec")) + col("cn")).as("d"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2"), col("neighbor_id"))
    codes.join(broadcast(table), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("d").cast(D)).cast("double").as("adc_d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_d2"))
  }
}
