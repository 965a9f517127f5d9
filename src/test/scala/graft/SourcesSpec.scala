package graft

import java.nio.file.Files
import org.apache.spark.sql.types.DateType
import graft.sources.{FileFormats, Jdbc, Tables}

/** §2D source/sink layer: JDBC upsert statement shape (no live database in
  * the container — the statement is a pure function), CSV/JSON explicit-
  * schema readers, and the StarSchemaJob parquet star sink (typed partition
  * column, partition-pruned read-back). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("upsertSql emits the reference ON CONFLICT DO UPDATE shape") {
    val sql = Jdbc.upsertSql("dim_c", Seq("k1", "k2", "a", "b"), Seq("k1", "k2"))
    assert(sql === "INSERT INTO dim_c (k1, k2, a, b) VALUES (?, ?, ?, ?) " +
      "ON CONFLICT (k1, k2) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")
    assert(Jdbc.upsertSql("t", Seq("k"), Seq("k")).endsWith("DO NOTHING"))
    assertThrows[IllegalArgumentException] {
      Jdbc.upsertSql("t", Seq("a"), Seq("missing"))
    }
  }

  test("csv and json readers roundtrip with explicit schemas") {
    val dir = Files.createTempDirectory("graft_ff").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "name", "x")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    df.write.mode("overwrite").json(s"$dir/json")
    assert(FileFormats.csv(spark, s"$dir/csv", df.schema)
      .orderBy("id").collect() === df.orderBy("id").collect())
    assert(FileFormats.json(spark, s"$dir/json", df.schema)
      .orderBy("id").collect() === df.orderBy("id").collect())
  }

  test("StarSchemaJob writes a readable star: typed partitions, pruned scans") {
    val out = Files.createTempDirectory("graft_star_spec").toString
    val star = graft.olap.StarSchemaJob.run(spark, sf, out)
    val fact = spark.read.parquet(s"$out/fact_sales")
    // partition column comes back typed, and the inner star joins drop no rows
    assert(fact.schema("date_key").dataType === DateType)
    assert(fact.count() === Tables.lineitem(spark, sf).count())
    star.dims.keys.foreach { name =>
      assert(spark.read.parquet(s"$out/$name").count() > 0, s"$name is empty")
    }
    // a date filter must prune partitions at the source, not post-filter
    val plan = planOf(fact.filter($"date_key" === java.sql.Date.valueOf("1995-01-01")))
    assert(plan.contains("PartitionFilters") && plan.contains("date_key"))
    // health surface: every table present with its true count
    val status = graft.olap.StarSchemaJob.status(spark, out)
      .as[(String, Long)].collect().toMap
    assert(status("fact_sales") === fact.count())
    assert(status.size === 8 && status.values.forall(_ > 0))
  }

  test("incremental sync rewrites only affected partitions and preserves the star") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft_star_inc").toString
    graft.olap.StarSchemaJob.run(spark, sf, out)
    def checksum() = spark.read.parquet(s"$out/fact_sales")
      .agg(count(lit(1)), graft.queries.Exact.dsum($"total_sale"),
           graft.queries.Exact.dsum($"margin"))
      .as[(Long, Double, Double)].head()
    val before = checksum()
    // source unchanged => the partition-grain rewrite must be a no-op in
    // content: identical row count and exact sums, nothing clobbered
    val changed = Tables.events(spark, sf)
      .filter($"event_type" === "purchase").select($"user_id").distinct()
    val rewritten = graft.olap.StarSchemaJob.syncIncremental(spark, sf, out, changed)
    assert(rewritten > 0 && rewritten < before._1,
      s"re-sync should touch a strict subset of rows ($rewritten of ${before._1})")
    assert(checksum() === before)
  }
}
