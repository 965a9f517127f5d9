package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition: fusing a lexical (BM25) candidate list
  * with a dense (embedding-cosine) one — the two-tower search stack every
  * retrieval-augmented data pipeline runs, expressed over the operators
  * this engine already has ([[TextAnalysis.bm25Rank]],
  * [[Similarity.knnBruteForce]] / [[Ivf.search]] at scale).
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09): fuse
    * two ranked candidate lists by score(d) = Σᵢ 1 / (c + rankᵢ(d)),
    * absence from a list contributing zero. RRF needs no score
    * calibration between the lists — only ranks — which is why it is the
    * standard lexical⊕dense combiner.
    *
    * Both inputs are top-N candidate lists (tiny — bounded by their
    * retrievers' k), so the fusion is a broadcast-sized full outer join;
    * nothing here touches the corpus. The two reciprocal terms are added
    * in a fixed order on both engines, so the fused score is
    * IEEE-deterministic and the (rrf DESC, doc_id) output order is
    * total.
    *
    * @param lexical (doc_id, rank) from the sparse retriever, rank 1-based
    * @param dense   (doc_id, rank) from the dense retriever, rank 1-based
    */
  def rrfFuse(lexical: DataFrame, dense: DataFrame,
              c: Int = 60, topN: Int = 20): DataFrame = {
    val l = lexical.select(col("doc_id"), col("rank").as("rank_lex"))
    val d = dense.select(col("doc_id"), col("rank").as("rank_dense"))
    val term = (r: String) =>
      coalesce(lit(1.0) / (lit(c).cast("double") + col(r)), lit(0.0))
    l.join(d, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_dense"),
        (term("rank_lex") + term("rank_dense")).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topN)
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** lcm(1..k) — the common denominator that turns rank-reciprocal metrics
    * (RR, AP) into exact integer arithmetic. 60 for the default k=5. */
  def rankLcm(k: Int): Long =
    (1 to k).foldLeft(1L)((l, i) => l / gcd(l, i) * i)

  /** Per-query ranking-quality metrics over a relevance-labeled candidate
    * list — the offline eval every retrieval stack runs before trusting a
    * ranker: reciprocal rank, precision@k and average precision@k per
    * query, from (query_id, rank, rel) rows (rank 1-based and dense per
    * query, rel ∈ {0,1}).
    *
    * Exactness: RR and AP are sums of rank reciprocals, which in floating
    * point would be summation-order-dependent. Both are computed here as
    * INTEGER rationals over the common denominator lcm(1..k) — AP's
    * numerator is Σ_{rel ranks r} (lcm div r)·relcnt(r), an exact integer
    * window-plus-group aggregate — and only the final value is a single
    * IEEE division, so any engine and any partitioning reproduces the
    * identical doubles. A query with no relevant candidate yields NULL
    * first_rel_rank / rr / ap (the honest reading, never a fake 0).
    *
    * Scale: the input is candidate-bounded (|queries|·k rows); the window
    * and the group-by both run per query_id — one narrow shuffle of the
    * candidate list, nothing corpus-sized.
    *
    * @param ranked candidate rows (query_id, rank, rel) + carried columns
    * @param carry  query-constant columns to carry through the group-by
    */
  def rankEval(ranked: DataFrame, k: Int = 5,
               carry: Seq[String] = Nil): DataFrame = {
    val l = rankLcm(k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val keys = ("query_id" +: carry).map(col)
    ranked
      .filter(col("rank") <= k)
      .select(keys :+ col("rank") :+ col("rel").cast("long").as("rel"): _*)
      .withColumn("rel_cnt", sum(col("rel")).over(w))
      .groupBy(keys: _*)
      .agg(
        sum(col("rel")).as("n_rel"),
        min(when(col("rel") === 1L, col("rank"))).as("first_rel_rank"),
        sum(when(col("rel") === 1L,
          expr(s"$l div rank") * col("rel_cnt"))).as("ap_num"))
      .select(keys ++ Seq(
        col("n_rel"),
        col("first_rel_rank"),
        (lit(1.0) / col("first_rel_rank")).as("rr"),
        (col("n_rel").cast("double") / k).as(s"prec_at_$k"),
        when(col("n_rel") > 0,
          col("ap_num").cast("double") / (col("n_rel") * l).cast("double"))
          .as(s"ap_at_$k")): _*)
  }
}
