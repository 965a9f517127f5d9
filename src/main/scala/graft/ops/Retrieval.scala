package graft.ops

import org.apache.spark.sql.DataFrame
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
}
