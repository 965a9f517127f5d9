package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Builder-side measurement probe for the r19 optimization round: dumps
  * `.explain("formatted")` for bench entries under study and times
  * candidate plan variants with the noop sink. Test-scoped, never shipped;
  * run with `sbt "Test/runMain graft.R19Probe"`.
  */
object R19Probe {
  private val RO = 10000000L

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("r19-probe")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id) AS s")
      .write.format("noop").mode("overwrite").save()

    def dump(name: String, df: DataFrame): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/root/repo/plans/r19/$name.txt"),
        df.queryExecution.explainString(FormattedMode))

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

    def lineitem = graft.sources.Tables.lineitem(spark, d)
    def orders = graft.sources.Tables.orders(spark, d)
    def docs = graft.sources.Tables.documents(spark, d)
    def embs = graft.sources.Tables.embeddings(spark, d)
    def spreadDF(df: DataFrame): DataFrame =
      df.repartition(spark.sparkContext.defaultParallelism)

    def stressLineitem(factor: Int, sp: Boolean): DataFrame =
      (if (sp) spreadDF(lineitem) else lineitem)
        .withColumn("__r", explode(sequence(lit(0), lit(factor - 1))))
        .withColumn("l_orderkey",
          col("l_orderkey") + col("__r").cast("long") * 1000000000L)
        .drop("__r")
    def stressOrders(factor: Int, sp: Boolean): DataFrame =
      (if (sp) spreadDF(orders) else orders)
        .withColumn("__r", explode(sequence(lit(0), lit(factor - 1))))
        .withColumn("o_orderkey",
          col("o_orderkey") + col("__r").cast("long") * 1000000000L)
        .drop("__r")
    def stressDocs(factor: Int, sp: Boolean): DataFrame =
      (if (sp) spreadDF(docs) else docs)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(factor - 1))).as("r"))
        .select((col("doc_id") + col("r").cast("long") * RO).as("doc_id"),
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1x"), col("r").cast("string"))).as("text"))
    def stressEmbeddings(factor: Int, sp: Boolean): DataFrame =
      (if (sp) spreadDF(embs) else embs)
        .select(col("vec_id"), col("embedding"), col("label"),
          explode(sequence(lit(0), lit(factor - 1))).as("r"))
        .select((col("vec_id") + col("r").cast("long") * RO).as("vec_id"),
          concat(
            slice(col("embedding"), col("r") + 1,
              size(col("embedding")) - col("r")),
            slice(col("embedding"), lit(1), col("r"))).as("embedding"),
          col("label"))

    // remaining before-plans (console run captured the fact trio + fuzzy)
    dump("embedding_pca_4x_before",
      graft.ops.Similarity.pcaPower(stressEmbeddings(4, sp = false)))
    dump("graph_pagerank_10x_before", pagerank10x(spark, d, sp = false))
    dump("host_dup_stats_10x_before", hostDup10x(spark, d, sp = false))

    // --- timed variants ---
    time("q1_100x_asis")(graft.queries.Analytics.q1Core(stressLineitem(100, sp = false)))
    time("q1_100x_spread")(graft.queries.Analytics.q1Core(stressLineitem(100, sp = true)))
    time("q1_100x_spread_w")(graft.queries.Analytics.q1Core(stressLineitem(100, sp = true)))
    time("fact_sales_100x_shj")(graft.olap.StarSchema.factSales(
      stressLineitem(100, sp = true), stressOrders(100, sp = true).hint("shuffle_hash"),
      graft.sources.Tables.part(spark, d), graft.sources.Tables.supplier(spark, d)))
    time("fact_sales_100x_shj_w")(graft.olap.StarSchema.factSales(
      stressLineitem(100, sp = true), stressOrders(100, sp = true).hint("shuffle_hash"),
      graft.sources.Tables.part(spark, d), graft.sources.Tables.supplier(spark, d)))
    time("fact_sales_100x_smj")(graft.olap.StarSchema.factSales(
      stressLineitem(100, sp = true), stressOrders(100, sp = true).hint("merge"),
      graft.sources.Tables.part(spark, d), graft.sources.Tables.supplier(spark, d)))
    time("q9_100x_asis")(graft.queries.TpchDeep.q9Core(stressLineitem(100, sp = false),
      graft.sources.Tables.part(spark, d), stressOrders(100, sp = false),
      graft.sources.Tables.supplier(spark, d), graft.sources.Tables.nation(spark, d)))
    time("q9_100x_spread_shj")(graft.queries.TpchDeep.q9Core(stressLineitem(100, sp = true),
      graft.sources.Tables.part(spark, d), stressOrders(100, sp = true).hint("shuffle_hash"),
      graft.sources.Tables.supplier(spark, d), graft.sources.Tables.nation(spark, d)))
    time("q9_100x_spread_shj_w")(graft.queries.TpchDeep.q9Core(stressLineitem(100, sp = true),
      graft.sources.Tables.part(spark, d), stressOrders(100, sp = true).hint("shuffle_hash"),
      graft.sources.Tables.supplier(spark, d), graft.sources.Tables.nation(spark, d)))
    // fact_sales_10x: current (broadcast) vs spread+shj — decide whether to
    // keep one generator policy across decades
    time("fact_sales_10x_asis")(graft.olap.StarSchema.factSales(
      stressLineitem(10, sp = false), stressOrders(10, sp = false),
      graft.sources.Tables.part(spark, d), graft.sources.Tables.supplier(spark, d)))
    time("fact_sales_10x_spread")(graft.olap.StarSchema.factSales(
      stressLineitem(10, sp = true), stressOrders(10, sp = true),
      graft.sources.Tables.part(spark, d), graft.sources.Tables.supplier(spark, d)))
    time("fact_sales_10x_spread_shj")(graft.olap.StarSchema.factSales(
      stressLineitem(10, sp = true), stressOrders(10, sp = true).hint("shuffle_hash"),
      graft.sources.Tables.part(spark, d), graft.sources.Tables.supplier(spark, d)))
    // docs/embeddings stress: spread effect
    time("fuzzy_10x_asis")(graft.ops.Dedup.fuzzyBlockDedup(stressDocs(10, sp = false)))
    time("fuzzy_10x_spread")(graft.ops.Dedup.fuzzyBlockDedup(stressDocs(10, sp = true)))
    time("pca_4x_asis")(graft.ops.Similarity.pcaPower(stressEmbeddings(4, sp = false)))
    time("pca_4x_spread")(graft.ops.Similarity.pcaPower(stressEmbeddings(4, sp = true)))
    time("pagerank_10x_asis")(pagerank10x(spark, d, sp = false))
    time("pagerank_10x_spread")(pagerank10x(spark, d, sp = true))
    println("ALLDONE")
    spark.stop()
  }

  private def pagerank10x(s: SparkSession, d: String, sp: Boolean): DataFrame = {
    val li0 = graft.sources.Tables.lineitem(s, d)
    val li = if (sp) li0.repartition(s.sparkContext.defaultParallelism) else li0
    val pairs = li
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.sources.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("r", explode(sequence(lit(0), lit(9))))
      .select(
        ((col("o_custkey") + col("r").cast("long") * RO) * 2).as("c"),
        ((col("l_suppkey") + col("r").cast("long") * RO) * 2 + 1).as("s"))
      .distinct()
    graft.ops.Graph.pageRank(
      pairs.select(col("c").as("src"), col("s").as("dst"))
        .union(pairs.select(col("s").as("src"), col("c").as("dst"))),
      iters = 3)
  }

  private def hostDup10x(s: SparkSession, d: String, sp: Boolean): DataFrame = {
    val docs0 = graft.sources.Tables.documents(s, d)
    val base = if (sp) docs0.repartition(s.sparkContext.defaultParallelism) else docs0
    val docs = base
      .select(col("doc_id"), col("text"), col("source"),
        explode(sequence(lit(0), lit(9))).as("r"))
      .select((col("doc_id") + col("r").cast("long") * RO).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1x"), col("r").cast("string"))).as("text"),
        concat(lit("https://www."), col("source"), lit("-r"),
          col("r").cast("string"), lit(".example.com/doc/"),
          col("doc_id").cast("string")).as("url"))
    graft.ops.Dedup.hostDupStats(docs)
  }
}
