package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor and embedding near-dup operators over an
  * `array<float>` embedding column.
  *
  * Brute-force top-k is the exactness baseline; random-hyperplane LSH is the
  * 100 TB scale path (candidates via bucket join, exact cosine verification,
  * no n² pair space).
  */
object Similarity {

  /** Vectors with embedding cast to double and L2 norm precomputed once. */
  private def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .withColumn("nrm", norm(col("emb")))

  /** Exact brute-force cosine top-k: the (small) query set is broadcast and
    * every data partition scores its vectors locally, keeping a per-partition
    * top-k per query before the final per-query merge — so the shuffle
    * carries at most numPartitions × |queries| × k rows, never the full
    * |queries| × n score matrix.
    *
    * Deterministic: ties broken by neighbor id (descending sort on
    * (cos, -neighbor_id) structs).
    */
  def knnBruteForce(embeddings: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val data = prepared(embeddings)
    val q = prepared(queries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = data.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosinePrenormed(col("emb"), col("q_emb"), col("nrm"), col("q_nrm")).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Two-stage top-k: partial top-k per (partition, query), then a final
    * per-query merge of the k-bounded partials. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val row = struct(col("cos"), (-col("neighbor_id")).as("negid"))
    val partial = scored
      .groupBy(spark_partition_id().as("pid"), col("query_id"))
      .agg(slice(reverse(array_sort(collect_list(row))), 1, k).as("top"))
    partial
      .groupBy(col("query_id"))
      .agg(slice(reverse(array_sort(flatten(collect_list(col("top"))))), 1, k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        (-col("col.negid")).as("neighbor_id"), col("col.cos").as("cos"))
  }

  /** Deterministic random hyperplanes: `planes` vectors of dimension `dim`,
    * components from a seeded Gaussian. Returned as a literal column so the
    * signature is pure per-row math (the plane matrix broadcasts with the
    * plan — fine up to thousands of planes). */
  private[ops] def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Column = {
    val rnd = new java.util.Random(seed)
    array(Seq.fill(planes)(array(Seq.fill(dim)(lit(rnd.nextGaussian())): _*)): _*)
  }

  /** Sign-random-projection (SimHash-for-cosine, Charikar'02) bit signature:
    * bit i = sign(v · plane_i). */
  def srpSignature(emb: Column, planesCol: Column): Column =
    transform(planesCol, p => when(dot(emb, p) >= 0, 1).otherwise(0))

  /** Random-hyperplane LSH ANN: b bands of r sign bits; vectors sharing any
    * band bucket become candidates, candidates get exact cosine, per-query
    * top-k of the verified candidates. Recall at cosine s is
    * 1-(1-p^r)^b with p = 1 - acos(s)/π; the default (32×4) gives ~99.6% at
    * s=0.4 and >99.9% above 0.6. The shuffle carries only
    * (band, bucket, vec_id) triples. */
  def knnLsh(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
             bands: Int = 32, rows: Int = 4, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(bands * rows, dim, seed)
    def banded(df: DataFrame, idCol: String): DataFrame =
      df.select(col(idCol), col("emb"), col("nrm"),
          srpSignature(col("emb"), planes).as("sig"))
        .select(col(idCol), col("emb"), col("nrm"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val data = banded(prepared(embeddings), "vec_id")
    val q = banded(
      prepared(queries).select(col("vec_id").as("query_id"), col("emb"), col("nrm")),
      "query_id")
      .select(col("query_id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"),
              col("band"), col("bucket"))
    val candidates = data.join(broadcast(q), Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("emb"), col("nrm"),
              col("q_emb"), col("q_nrm"))
      .dropDuplicates("query_id", "vec_id")
    val scored = candidates.select(col("query_id"), col("vec_id").as("neighbor_id"),
      cosinePrenormed(col("emb"), col("q_emb"), col("nrm"), col("q_nrm")).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Embedding near-dup pairs: all (v1 < v2) pairs with cosine >= threshold,
    * found via the same banded LSH self-join + exact verification (never the
    * n² cross join). */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.4,
                       bands: Int = 32, rows: Int = 4, dim: Int = 64,
                       seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(bands * rows, dim, seed)
    val banded = prepared(embeddings)
      .withColumn("sig", srpSignature(col("emb"), planes))
      .select(col("vec_id"), col("emb"), col("nrm"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))))))
      .toDF("vec_id", "emb", "nrm", "band", "bucket")
    val l = banded.toDF("v1", "emb1", "nrm1", "band", "bucket")
    val r = banded.toDF("v2", "emb2", "nrm2", "band", "bucket")
    l.join(r, Seq("band", "bucket"))
      .filter(col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        cosinePrenormed(col("emb1"), col("emb2"), col("nrm1"), col("nrm2")).as("cos"))
      .dropDuplicates("v1", "v2")
      .filter(col("cos") >= threshold)
  }
}
