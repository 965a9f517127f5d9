package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)), // nearly parallel to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(0.7f, 0.7f, 0.0f, 0.0f)),  // 45 degrees
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))  // opposite of 0
  ).toDF("vec_id", "embedding")

  test("cosine expression matches hand-computed values") {
    val c = vecs.filter($"vec_id" === 3L)
      .select(VectorFunctions.cosine(
        VectorFunctions.toDouble($"embedding"),
        array(lit(1.0), lit(0.0), lit(0.0), lit(0.0))).as("c"))
      .as[Double].head()
    assert(math.abs(c - math.sqrt(0.5)) < 1e-9)
  }

  test("brute-force kNN ranks by cosine with id tiebreak, excludes self") {
    val out = Similarity.knnBruteForce(vecs, vecs.filter($"vec_id" === 0L), k = 4)
      .orderBy("rank")
      .select("rank", "neighbor_id").as[(Int, Long)].collect()
    assert(out.map(_._2).toSeq === Seq(1L, 3L, 2L, 4L))
    assert(out.map(_._1).toSeq === Seq(1, 2, 3, 4))
  }

  test("LSH kNN matches brute-force on the testdata embeddings") {
    val queries = graft.sources.Tables.embeddings(spark, sf).filter($"vec_id" < 5)
    val data = graft.sources.Tables.embeddings(spark, sf)
    val bf = Similarity.knnBruteForce(data, queries, k = 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val lsh = Similarity.knnLsh(data, queries, k = 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    // LSH top-k over verified candidates should recover the exact top-3
    // at these similarity levels (recall >> 99% per the band analysis)
    assert(lsh === bf)
  }

  test("embedding near-dup returns symmetric-free ordered pairs above threshold") {
    val pairs = Similarity.embeddingNearDup(vecs, threshold = 0.9, dim = 4)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.forall(p => p._1 < p._2))
    assert(!pairs.contains((0L, 4L)) && !pairs.contains((0L, 2L)))
  }
}
