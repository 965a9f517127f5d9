package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 probe 3: corpus_roundtrip gate spread, qualityFilter spread,
  * lshBandsCurve spread, Pq fit/encode spread, graph-1x head spread,
  * scd2Batches pin. Test-scoped. */
object R19Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("r19-probe3")
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
          println(s"FAIL $tag ${t.getClass.getName}: ${Option(t.getMessage).getOrElse("").take(300)}")
      }
    }
    def sp(df: DataFrame): DataFrame =
      df.repartition(spark.sparkContext.defaultParallelism)
    def docs = graft.sources.Tables.documents(spark, d)
    def embs = graft.sources.Tables.embeddings(spark, d)
    def lineitem = graft.sources.Tables.lineitem(spark, d)
    def orders = graft.sources.Tables.orders(spark, d)
    def queries20 = {
      import graft.functions.VectorFunctions._
      embs
    }

    time("gauge_q1")(graft.queries.Analytics.q1PricingSummary(spark, d))
    time("gauge_q1_w")(graft.queries.Analytics.q1PricingSummary(spark, d))

    for (r <- 1 to 2) {
      graft.ops.InternalCaches.clear()
      time(s"quality_filter_asis_$r")(graft.ops.TextAnalysis.qualityFilter(docs))
      graft.ops.InternalCaches.clear()
      time(s"quality_filter_spread_$r")(graft.ops.TextAnalysis.qualityFilter(sp(docs)))
      graft.ops.InternalCaches.clear()
      time(s"corpus_rt_asis_$r")(graft.queries.DocQueries.corpusRoundtripFrom(spark, docs,
        graft.sources.Scratch.dir("r19_crt_a")))
      graft.ops.InternalCaches.clear()
      time(s"corpus_rt_spread_$r")(graft.queries.DocQueries.corpusRoundtripFrom(spark, sp(docs),
        graft.sources.Scratch.dir("r19_crt_b")))
      graft.ops.InternalCaches.clear()
      time(s"lsh_bands_asis_$r")(graft.ops.Similarity.lshBandsCurve(embs,
        embs.filter(col("vec_id") < 20)))
      graft.ops.InternalCaches.clear()
      time(s"lsh_bands_spread_$r")(graft.ops.Similarity.lshBandsCurve(sp(embs),
        embs.filter(col("vec_id") < 20)))
      graft.ops.InternalCaches.clear()
      time(s"pq_encode_asis_$r") {
        val m = graft.ops.Pq.fit(embs, m = 8, ncodes = 16, iters = 1)
        graft.ops.Pq.encode(m, embs)
      }
      graft.ops.InternalCaches.clear()
      time(s"pq_encode_spread_$r") {
        val m = graft.ops.Pq.fit(sp(embs), m = 8, ncodes = 16, iters = 1)
        graft.ops.Pq.encode(m, sp(embs))
      }
      graft.ops.InternalCaches.clear()
      time(s"pagerank1x_asis_$r")(pagerank1x(spark, d, sp = false))
      graft.ops.InternalCaches.clear()
      time(s"pagerank1x_spread_$r")(pagerank1x(spark, d, sp = true))
      time(s"scd2_batches_asis_$r")(scd2BatchesEval(spark, d, pin = false))
      time(s"scd2_batches_pin_$r")(scd2BatchesEval(spark, d, pin = true))
    }
    println("ALLDONE")
    spark.stop()
  }

  private def pagerank1x(s: SparkSession, d: String, sp: Boolean): DataFrame = {
    val li0 = graft.sources.Tables.lineitem(s, d)
    val li = if (sp) li0.repartition(s.sparkContext.defaultParallelism) else li0
    val pairs = li.select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.sources.Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
    graft.ops.Graph.pageRank(edges, iters = 3)
      .orderBy(col("rank").desc, col("node")).limit(100)
  }

  /** The 6-batch ntile split both SCD2 sink entries replay: without a pin
    * each batch filter re-evaluates the global-order window. Returns the
    * union row count frame to force all 6. */
  private def scd2BatchesEval(s: SparkSession, d: String, pin: Boolean): DataFrame = {
    val ev = graft.sources.Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
    val sixth = ntile(6).over(org.apache.spark.sql.expressions.Window
      .orderBy(col("ts_us"), col("event_id")))
    val parts0 = ev.withColumn("__b", sixth)
    val parts = if (pin) graft.ops.InternalCaches.persistBounded(parts0) else parts0
    (1 to 6).map(i => parts.filter(col("__b") === i).drop("__b")
        .groupBy().agg(count(lit(1)).as("n")))
      .reduce(_.unionByName(_))
  }
}
