package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics as plain DataFrame plans (no GraphX/GraphFrames
  * dependency — the same posture as [[Dedup.clusters]]' pointer-jumping
  * connected components).
  *
  * PageRank here is the fixed-iteration, FIXED-POINT form: ranks live as
  * 64-bit integers in 10⁻¹⁵ units, the damping factor is the rational
  * 85/100, and every step is integer multiply/divide/sum — exact,
  * reduction-order-independent, and identical across engines and
  * partitionings BIT FOR BIT. Floating-point (or even decimal-cast)
  * formulations are not: contribution sums are order-dependent in fp, and
  * a double→decimal cast rounds differently across engines whenever the
  * scaled value lands near a half-unit boundary (measured here — ~1e-16
  * drift per node per iteration). Fixed-point integer math is how a
  * distributed PageRank is made reproducible at any scale; the only cost
  * is truncation at the 15th decimal, far below any ranking signal. A
  * fixed iteration count then makes the whole computation SQL-replayable
  * by an oracle as unrolled CTEs.
  *
  * Scale shape per iteration: one join of the rank table onto the edge
  * list (both keyed by src — at 100 TB both sides bucket by src and the
  * join is co-located) and one hash aggregate by dst. Lineage is
  * truncated per iteration the same way [[Dedup.clusters]] does it.
  * Range safety: Σ rank_u ≈ U = 10¹⁵, so 85·in_sum ≤ 8.5e16 ≪ 2⁶³.
  */
object Graph {

  /** Rank unit: 1 rank = 10¹⁵ units. */
  val U: Long = 1000000000000000L

  /** Fixed-iteration fixed-point PageRank over a directed edge list
    * (src, dst). Nodes = every id appearing as src or dst; nodes with no
    * outgoing edges contribute nothing (standard dangling simplification —
    * absent from symmetrized graphs, where every node has out-degree ≥ 1).
    *
    * @return (node, rank_u, rank): integer 10⁻¹⁵ units and the double view
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
               dampingPct: Int = 85): DataFrame = {
    // materialize the deduped edge list ONCE: nodes, degrees and every
    // iteration's join all read it, and without the checkpoint each of
    // those branches would re-evaluate the whole upstream edge pipeline
    // (scan + joins + distinct) — 5 evaluations for 3 iterations
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    // nodes and degrees are tiny next to the edges — checkpoint them too,
    // or every iteration's job re-pays their distinct/agg shuffles from e
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
      .localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) // no edges, no graph — empty result, not a divide-by-zero
      return nodes.select(col("node"), lit(0L).as("rank_u"),
        lit(0.0).as("rank"))
    var ranks = nodes.select(col("node"), lit(U / n).as("rank_u"))
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("node"), expr("rank_u DIV out_deg").as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("in_sum"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((100L - dampingPct) * U / (100L * n)) +
            expr(s"$dampingPct * coalesce(in_sum, 0L) DIV 100")).as("rank_u"))
        .localCheckpoint(true)
      Checkpoints.unpersist(ranks)
      ranks = next
    }
    // after ≥1 iteration the final ranks checkpoint stands alone — release
    // the inputs; at iters=0 the returned frame still READS the nodes
    // checkpoint (initial ranks are a projection over it), so only the
    // edge blocks may go
    Checkpoints.unpersist(e)
    if (iters >= 1) { Checkpoints.unpersist(nodes); Checkpoints.unpersist(outDeg) }
    ranks.select(col("node"), col("rank_u"),
      (col("rank_u") / lit(U.toDouble)).as("rank"))
  }

  /** Fixed-iteration multi-source BFS hop labeling: every node reachable
    * from `sources` within `iters` hops, tagged with its MINIMUM hop
    * count — the neighborhood-expansion primitive (blast-radius audits,
    * k-hop feature extraction). Pure set semantics — frontier-join,
    * distinct, anti-join — so every step is order-free and engine-exact
    * with no fixed-point arithmetic needed at all.
    *
    * Scale shape per round: the frontier joins the src-keyed edge list
    * (the same bucketable co-located join as [[pageRank]]'s) and
    * anti-joins the union of the per-round frontier checkpoints
    * (node-keyed). ONLY the new frontier is checkpointed each round —
    * O(frontier) materialization, never a rewrite of the whole visited
    * set (which a billion-node graph cannot afford round after round).
    * Anti-join before labeling is what makes hop = MIN hop: a node
    * enters a frontier in the first round that reaches it and is never
    * relabeled.
    *
    * @param sources (node) rows; hop 0
    * @return (node, hop) — one row per reached node
    */
  def bfsHops(edges: DataFrame, sources: DataFrame, iters: Int = 3): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    expand(e, sources, iters)
  }

  /** [[bfsHops]] with the seeds selected FROM the edge set itself:
    * sources = distinct src nodes satisfying `sourcePred` over the
    * checkpointed edge list. When the edge list is derived from an
    * expensive pipeline (fact joins), an externally-built `sources`
    * frame re-plans that whole pipeline just to pick the seeds — this
    * overload reads the one materialized copy instead. */
  def bfsHopsFrom(edges: DataFrame, sourcePred: Column, iters: Int = 3): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    expand(e, e.filter(sourcePred).select(col("src").as("node")), iters)
  }

  private def expand(e: DataFrame, sources: DataFrame, iters: Int): DataFrame = {
    var frontiers = List(sources.select(col("node")).distinct()
      .select(col("node"), lit(0).as("hop")).localCheckpoint(true))
    (1 to iters).foreach { r =>
      val visited = frontiers.map(_.select(col("node"))).reduce(_ union _)
      val next = e.join(frontiers.head.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(r).as("hop"))
        .localCheckpoint(true)
      frontiers = next :: frontiers
    }
    Checkpoints.unpersist(e)
    // the result unions the (small) frontier checkpoints themselves —
    // they stay alive for the caller; only the edge copy is released
    frontiers.reverse.reduce(_ union _)
  }
}
