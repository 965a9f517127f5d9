package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("bfsHops: minimum hop labels on a path with a shortcut") {
    // path 1→2→3→4 plus shortcut 1→4: node 4 must label hop 1 (the
    // shortcut), NOT hop 3 (the path) — the anti-join-before-label rule
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val out = Graph.bfsHops(edges, Seq(1L).toDF("node"), iters = 3)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    // bounded horizon: iters = 1 reaches only the direct neighbors
    val near = Graph.bfsHops(edges, Seq(1L).toDF("node"), iters = 1)
      .as[(Long, Int)].collect().toMap
    assert(near === Map(1L -> 0, 2L -> 1, 4L -> 1))
  }

  test("pageRank: hub outranks leaves, ranks are exact integers summing to ~1") {
    // star graph: node 0 connected to 1..4 (symmetrized)
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 3)
      .select("node", "rank_u", "rank").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(out.length === 5)
    val hub = out.find(_._1 == 0L).get
    out.filter(_._1 != 0L).foreach { leaf =>
      assert(hub._2 > leaf._2, s"hub must outrank leaf $leaf")
      // leaves are symmetric — identical EXACT integer ranks
      assert(leaf._2 === out.find(_._1 == 1L).get._2)
    }
    // fixed-point truncation only ever loses mass — sum stays in (1-eps, 1]
    val total = out.map(_._2).sum
    assert(total <= Graph.U && total > (Graph.U * 0.999).toLong, s"mass $total")
    // determinism: a second run reproduces the exact integers
    val again = Graph.pageRank(edges, iters = 3)
      .select("node", "rank_u").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.map(_._2).toSeq === out.map(_._2).toSeq)
  }

  test("pageRank: empty edge list yields an empty frame; iters=0 yields uniform initial ranks") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRank(empty).isEmpty)
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r0 = Graph.pageRank(edges, iters = 0)
      .select("rank_u").as[Long].collect()
    assert(r0.toSet === Set(Graph.U / 2))
  }
}
