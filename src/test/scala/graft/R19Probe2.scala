package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** r19 probe 2: A/B the guarded spread on heavy 1x registry operators by
  * passing a pre-repartitioned input frame; also verifies that predicate
  * pushdown survives a Repartition above the scan. Test-scoped. */
object R19Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("r19-probe2")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id) AS s")
      .write.format("noop").mode("overwrite").save()

    def time(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        f.write.format("noop").mode("overwrite").save()
        println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
      } catch {
        case t: Throwable =>
          println(s"FAIL $tag ${t.getClass.getName}: ${Option(t.getMessage).getOrElse("").take(200)}")
      }
    }
    def sp(df: DataFrame): DataFrame =
      df.repartition(spark.sparkContext.defaultParallelism)
    def docs = graft.sources.Tables.documents(spark, d)
    def embs = graft.sources.Tables.embeddings(spark, d)

    // pushdown-through-repartition check: PushedFilters must still name
    // l_shipdate at the scan under the repartition
    val pd = sp(graft.sources.Tables.lineitem(spark, d))
      .filter(col("l_shipdate") <= lit("1995-01-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"))
    val pdPlan = pd.queryExecution.explainString(FormattedMode)
    println("PUSHDOWN_THROUGH_REPARTITION=" +
      (if (pdPlan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate")
           || pdPlan.contains("LessThanOrEqual(l_shipdate")) "YES" else "NO"))

    // gauge
    time("gauge_q1")(graft.queries.Analytics.q1PricingSummary(spark, d))
    time("gauge_q1_w")(graft.queries.Analytics.q1PricingSummary(spark, d))

    for (r <- 1 to 2) {
      graft.ops.InternalCaches.clear()
      time(s"containment_join_asis_$r")(graft.ops.Dedup.containmentJoin(docs))
      graft.ops.InternalCaches.clear()
      time(s"containment_join_spread_$r")(graft.ops.Dedup.containmentJoin(sp(docs)))
      graft.ops.InternalCaches.clear()
      time(s"fuzzy_asis_$r")(graft.ops.Dedup.fuzzyBlockDedup(docs))
      graft.ops.InternalCaches.clear()
      time(s"fuzzy_spread_$r")(graft.ops.Dedup.fuzzyBlockDedup(sp(docs)))
      graft.ops.InternalCaches.clear()
      time(s"minhash_asis_$r")(graft.ops.Dedup.minhashLsh(docs))
      graft.ops.InternalCaches.clear()
      time(s"minhash_spread_$r")(graft.ops.Dedup.minhashLsh(sp(docs)))
      graft.ops.InternalCaches.clear()
      time(s"exact_substr_asis_$r")(graft.ops.Dedup.exactSubstrSpans(docs))
      graft.ops.InternalCaches.clear()
      time(s"exact_substr_spread_$r")(graft.ops.Dedup.exactSubstrSpans(sp(docs)))
      graft.ops.InternalCaches.clear()
      time(s"mutual_knn_clusters_asis_$r")(graft.ops.Dedup.clusters(
        graft.ops.Similarity.mutualKnn(embs).select("d1", "d2")))
      graft.ops.InternalCaches.clear()
      time(s"mutual_knn_clusters_spread_$r")(graft.ops.Dedup.clusters(
        graft.ops.Similarity.mutualKnn(sp(embs)).select("d1", "d2")))
      graft.ops.InternalCaches.clear()
      time(s"pca_1x_asis_$r")(graft.ops.Similarity.pcaPower(embs))
      graft.ops.InternalCaches.clear()
      time(s"pca_1x_spread_$r")(graft.ops.Similarity.pcaPower(sp(embs)))
      graft.ops.InternalCaches.clear()
      time(s"host_boiler_asis_$r")(graft.ops.Dedup.hostBoilerplateRate(
        docs.withColumn("url", concat(lit("https://www."), col("source"),
          lit(".example.com/doc/"), col("doc_id").cast("string")))))
      graft.ops.InternalCaches.clear()
      time(s"host_boiler_spread_$r")(graft.ops.Dedup.hostBoilerplateRate(
        sp(docs).withColumn("url", concat(lit("https://www."), col("source"),
          lit(".example.com/doc/"), col("doc_id").cast("string")))))
      graft.ops.InternalCaches.clear()
      time(s"block_dedup_asis_$r")(graft.ops.Dedup.blockDedup(docs))
      graft.ops.InternalCaches.clear()
      time(s"block_dedup_spread_$r")(graft.ops.Dedup.blockDedup(sp(docs)))
      graft.ops.InternalCaches.clear()
      time(s"simhash_asis_$r")(graft.ops.Dedup.simhashDup(docs))
      graft.ops.InternalCaches.clear()
      time(s"simhash_spread_$r")(graft.ops.Dedup.simhashDup(sp(docs)))
    }
    println("ALLDONE")
    spark.stop()
  }
}
