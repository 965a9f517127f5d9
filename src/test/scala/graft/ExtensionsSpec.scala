package graft

import graft.functions.NativeExpressions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions registration: the native expressions must be
  * reachable from plain SQL and agree with the Scala API. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_simhash_bits is SQL-callable and matches the Scala API") {
    val fromSql = spark.sql(
      "SELECT graft_simhash_bits(array(1L, 2L, 3L, 2L), 60) AS fp")
      .as[Long].head()
    val fromApi = Seq(Seq(1L, 2L, 3L, 2L)).toDF("hs")
      .select(NativeExpressions.simhashBits($"hs", 60).as("fp"))
      .as[Long].head()
    assert(fromSql === fromApi)
  }

  test("graft_minhash_signature is SQL-callable and matches the Scala API") {
    val fromSql = spark.sql(
      "SELECT graft_minhash_signature(array(7L, 8L), 16, 42L) AS sig")
      .as[Seq[Long]].head()
    val fromApi = Seq(Seq(7L, 8L)).toDF("hs")
      .select(NativeExpressions.minhashSignature($"hs", 16, 42L).as("sig"))
      .as[Seq[Long]].head()
    assert(fromSql === fromApi)
  }

  test("graft_dot is SQL-callable and matches the Scala API") {
    val fromSql = spark.sql(
      "SELECT graft_dot(array(0.5D, -1.5D, 2.0D), array(1.0D, 2.0D, 0.25D)) AS d")
      .as[Double].head()
    val fromApi = Seq((Seq(0.5, -1.5, 2.0), Seq(1.0, 2.0, 0.25))).toDF("a", "b")
      .select(NativeExpressions.dotProduct($"a", $"b").as("d"))
      .as[Double].head()
    assert(fromSql === fromApi)
    assert(fromSql === 0.5 * 1.0 + -1.5 * 2.0 + 2.0 * 0.25)
  }

  test("graft_nfc_normalize is SQL-callable and matches the Scala API") {
    val fromSql = spark.sql("SELECT graft_nfc_normalize('café') AS n")
      .as[String].head()
    val fromApi = Seq("café").toDF("s")
      .select(NativeExpressions.nfcNormalize($"s").as("n"))
      .as[String].head()
    assert(fromSql === fromApi)
    assert(fromSql === "café")
  }

  test("graft_sample_bucket is SQL-callable and matches the Scala API") {
    val docs = graft.sources.Tables.documents(spark, sf).select($"doc_id")
    docs.createOrReplaceTempView("ext_docs_ids")
    val fromSql = spark.sql(
      "SELECT doc_id, graft_sample_bucket(doc_id) AS b FROM ext_docs_ids")
      .as[(Long, Int)].collect().toMap
    val fromApi = docs
      .select($"doc_id", graft.ops.Sampling.bucket($"doc_id").as("b"))
      .as[(Long, Int)].collect().toMap
    assert(fromSql === fromApi)
    assert(fromSql.values.forall(b => b >= 0 && b < 100))
  }

  test("graft_asof_join TVF builds the native plan and matches the Scala API") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id")
    val marks = graft.sources.Tables.events(spark, sf)
      .filter($"event_id" % 5 === 0)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"value")
    ev.createOrReplaceTempView("ext_asof_l")
    marks.createOrReplaceTempView("ext_asof_r")
    val sql = spark.sql("SELECT * FROM graft_asof_join(" +
      "'ext_asof_l', 'ext_asof_r', 'user_id', 'ts_us', 'value')")
    // the TVF path must plan the NATIVE exec, not a composed fallback
    assert(planOf(sql).contains("AsOfJoin"),
      s"graft_asof_join should plan AsOfJoinExec:\n${planOf(sql)}")
    val api = graft.plans.AsOfJoin(ev, marks, "user_id", "ts_us", Seq("value"))
    assert(sql.columns.toSeq === api.columns.toSeq)
    assert(sql.collect().map(_.toString).sorted.toSeq ===
      api.collect().map(_.toString).sorted.toSeq)
  }

  test("graft_dedup_exact and graft_minhash_pairs TVFs match the Scala operators") {
    graft.sources.Tables.documents(spark, sf)
      .createOrReplaceTempView("ext_docs")
    val exactSql = spark.sql("SELECT * FROM graft_dedup_exact('ext_docs')")
      .collect().map(_.toString).sorted.toSeq
    val exactApi = graft.ops.Dedup
      .exact(graft.sources.Tables.documents(spark, sf))
      .collect().map(_.toString).sorted.toSeq
    assert(exactSql === exactApi && exactSql.nonEmpty)
    val pairsSql = spark.sql(
      "SELECT * FROM graft_minhash_pairs('ext_docs', '3', '0.8')")
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val pairsApi = graft.ops.Dedup
      .minhashLsh(graft.sources.Tables.documents(spark, sf), 3, 0.8)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(pairsSql === pairsApi && pairsSql.nonEmpty)
  }

  test("graft_heavy_hitters TVF and the MG sketch/merge aggregates match the Scala API") {
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"source".as("bucket"),
        explode(graft.ops.TextAnalysis.tokens($"text")).as("item"))
    toks.createOrReplaceTempView("ext_toks")
    val sql = spark.sql(
      "SELECT * FROM graft_heavy_hitters('ext_toks', 'bucket', 'item', '16')")
      .collect().map(_.toString).sorted.toSeq
    val api = graft.ops.Sketches.heavyHittersMerged(
        graft.ops.Sketches.heavyHitterSketch(
          toks, $"bucket", lit(0L), $"item", 16), 16)
      .collect().map(_.toString).sorted.toSeq
    assert(sql === api && sql.nonEmpty)
    // the sketch pair composes from SQL exactly as from Scala: shard-build
    // then merged read, identical decoded counters
    val sqlAgg = spark.sql("""
      WITH shards AS (
        SELECT bucket, pmod(hash(item), 4) AS shard,
               graft_mg_sketch(item, 16) AS sketch
        FROM ext_toks GROUP BY 1, 2),
      merged AS (
        SELECT bucket, graft_mg_merge(sketch, 16) AS items
        FROM shards GROUP BY bucket)
      SELECT bucket, it.item AS item, it.count_est AS count_est
      FROM merged LATERAL VIEW explode(items) ex AS it""")
      .collect().map(_.toString).sorted.toSeq
    val apiAgg = {
      val shards = toks.groupBy($"bucket", pmod(hash($"item"), lit(4)).as("shard"))
        .agg(graft.functions.MisraGries.mgSketchAgg($"item", 16).as("sketch"))
      shards.groupBy($"bucket")
        .agg(graft.functions.MisraGries.mgMergeAgg($"sketch", 16).as("items"))
        .select($"bucket", explode($"items").as("it"))
        .select($"bucket", $"it.item".as("item"), $"it.count_est".as("count_est"))
    }.collect().map(_.toString).sorted.toSeq
    assert(sqlAgg === apiAgg && sqlAgg.nonEmpty)
  }

  test("graft_gopher_rules and graft_sessionize TVFs match the Scala operators") {
    graft.sources.Tables.documents(spark, sf)
      .createOrReplaceTempView("ext_docs_gr")
    val gSql = spark.sql("SELECT * FROM graft_gopher_rules('ext_docs_gr')")
    val gApi = graft.ops.TextAnalysis.gopherRules(
      graft.sources.Tables.documents(spark, sf))
    assert(gSql.columns.toSeq === gApi.columns.toSeq)
    assert(gSql.collect().map(_.toString).sorted.toSeq ===
      gApi.collect().map(_.toString).sorted.toSeq)
    graft.sources.Tables.events(spark, sf)
      .createOrReplaceTempView("ext_events_sess")
    val sSql = spark.sql(
      "SELECT * FROM graft_sessionize('ext_events_sess', '1800000000')")
    val sApi = graft.ops.Events.sessionize(
      graft.sources.Tables.events(spark, sf), 1800000000L)
    assert(sSql.columns.toSeq === sApi.columns.toSeq)
    assert(sSql.collect().map(_.toString).sorted.toSeq ===
      sApi.collect().map(_.toString).sorted.toSeq)
  }

  test("graft_boilerplate_spans and graft_exact_substr_spans TVFs match the Scala operators") {
    graft.sources.Tables.documents(spark, sf)
      .createOrReplaceTempView("ext_docs_spans")
    val bSql = spark.sql("SELECT * FROM graft_boilerplate_spans('ext_docs_spans', '2')")
    val bApi = graft.ops.Dedup.boilerplateSpans(
      graft.sources.Tables.documents(spark, sf), minDf = 2)
    assert(bSql.columns.toSeq === bApi.columns.toSeq)
    assert(bSql.collect().map(_.toString).sorted.toSeq ===
      bApi.collect().map(_.toString).sorted.toSeq)
    val eSql = spark.sql("SELECT * FROM graft_exact_substr_spans('ext_docs_spans', '8')")
    val eApi = graft.ops.Dedup.exactSubstrSpans(
      graft.sources.Tables.documents(spark, sf), minLen = 8)
    assert(eSql.columns.toSeq === eApi.columns.toSeq)
    assert(eSql.collect().map(_.toString).sorted.toSeq ===
      eApi.collect().map(_.toString).sorted.toSeq)
    assert(eSql.count() > 0, "testdata should produce cross-doc spans")
  }

  test("graft_knn_graph and graft_mixture_schedule TVFs match the Scala operators") {
    graft.sources.Tables.embeddings(spark, sf)
      .createOrReplaceTempView("ext_embs")
    val kSql = spark.sql("SELECT * FROM graft_knn_graph('ext_embs', '5')")
    val kApi = Similarity.knnGraph(graft.sources.Tables.embeddings(spark, sf), 5)
    assert(kSql.columns.toSeq === kApi.columns.toSeq)
    assert(kSql.collect().map(_.toString).sorted.toSeq ===
      kApi.collect().map(_.toString).sorted.toSeq)
    assert(kSql.count() > 0)
    graft.sources.Tables.documents(spark, sf)
      .createOrReplaceTempView("ext_docs_mix")
    val mSql = spark.sql("SELECT * FROM graft_mixture_schedule('ext_docs_mix', '1000000')")
    import org.apache.spark.sql.functions.{size => fsize, sum => fsum}
    val st = graft.sources.Tables.documents(spark, sf)
      .select($"source", fsize(graft.ops.TextAnalysis.tokens($"text")).cast("long").as("n"))
      .groupBy($"source").agg(fsum($"n").as("n_tokens"))
    val mApi = graft.ops.Sampling.temperatureMixture(st, budgetTokens = 1e6)
    assert(mSql.columns.toSeq === mApi.columns.toSeq)
    assert(mSql.collect().map(_.toString).sorted.toSeq ===
      mApi.collect().map(_.toString).sorted.toSeq)
  }

  test("r13-family TVFs match the Scala operators") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val embs = graft.sources.Tables.embeddings(spark, sf)
    docs.createOrReplaceTempView("ext_docs_r13")
    embs.createOrReplaceTempView("ext_embs_r13")
    def pin(sql: org.apache.spark.sql.DataFrame,
            api: org.apache.spark.sql.DataFrame, nonEmpty: Boolean): Unit = {
      assert(sql.columns.toSeq === api.columns.toSeq)
      assert(sql.collect().map(_.toString).sorted.toSeq ===
        api.collect().map(_.toString).sorted.toSeq)
      if (nonEmpty) assert(sql.count() > 0)
    }
    pin(spark.sql("SELECT * FROM graft_block_dedup('ext_docs_r13', '8')"),
      graft.ops.Dedup.blockDedup(docs, 8), nonEmpty = true)
    pin(spark.sql("SELECT * FROM graft_cdc_chunk_dedup('ext_docs_r13', '3', '8')"),
      graft.ops.Dedup.cdcChunkDedup(docs, 3, 8), nonEmpty = true)
    pin(spark.sql("SELECT * FROM graft_containment_join('ext_docs_r13', '3', '0.8')"),
      graft.ops.Dedup.containmentJoin(docs, 3, 0.8), nonEmpty = true)
    pin(spark.sql(
        "SELECT * FROM graft_label_propagation('ext_embs_r13', '5', '5', '2')"),
      Similarity.labelPropagate(embs, 5, 5, 2), nonEmpty = true)
    pin(spark.sql("SELECT * FROM graft_random_projection('ext_embs_r13', '16')"),
      Similarity.randomProjection(embs, 16), nonEmpty = true)
  }

  test("r14-family TVFs match the Scala operators") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val embs = graft.sources.Tables.embeddings(spark, sf)
    docs.createOrReplaceTempView("ext_docs_r14")
    embs.createOrReplaceTempView("ext_embs_r14")
    def pin(sql: org.apache.spark.sql.DataFrame,
            api: org.apache.spark.sql.DataFrame, nonEmpty: Boolean): Unit = {
      assert(sql.columns.toSeq === api.columns.toSeq)
      assert(sql.collect().map(_.toString).sorted.toSeq ===
        api.collect().map(_.toString).sorted.toSeq)
      if (nonEmpty) assert(sql.count() > 0)
    }
    pin(spark.sql("SELECT * FROM graft_graph_triangles('ext_embs_r14', '5')"),
      Similarity.graphTriangles(embs, 5), nonEmpty = true)
    pin(spark.sql("SELECT * FROM graft_dsir_weights('ext_docs_r14', 'src0')"),
      graft.ops.Dsir.weights(docs, $"source" === "src0"), nonEmpty = true)
    pin(spark.sql("SELECT * FROM graft_dsir_sample('ext_docs_r14', 'src0')"),
      graft.ops.Dsir.resample(docs, $"source" === "src0"), nonEmpty = true)
    pin(spark.sql("SELECT * FROM graft_source_overlap('ext_docs_r14', '3')"),
      graft.ops.Dedup.sourceOverlap(docs, 3), nonEmpty = true)
    pin(spark.sql("SELECT * FROM graft_corpus_drift('ext_docs_r14', '8', '3')"),
      graft.streaming.StreamingCorpusStats.driftFromState(
        graft.streaming.StreamingCorpusStats.taggedPartials(docs, 8), 3L),
      nonEmpty = true)
    // the standing-index serve path: census TVF over the index relation ≡
    // the Scala index read ≡ the inline whole-corpus matrix
    val idxDir = graft.sources.Scratch.dir("graft_ext_srcsh")
    graft.ops.Dedup.writeSourceShingleIndex(docs.filter($"doc_id" < 400), idxDir)
    graft.ops.Dedup.appendSourceShingleIndex(docs.filter($"doc_id" >= 400), idxDir)
    spark.read.parquet(idxDir).createOrReplaceTempView("ext_srcsh_idx")
    pin(spark.sql("SELECT * FROM graft_source_overlap_census('ext_srcsh_idx')"),
      graft.ops.Dedup.sourceOverlapFromIndex(spark, idxDir), nonEmpty = true)
    pin(spark.sql("SELECT * FROM graft_source_overlap_census('ext_srcsh_idx')"),
      graft.ops.Dedup.sourceOverlap(docs, 3), nonEmpty = true)
  }

  test("binary arrival-screen TVFs match their batch identities") {
    val all = graft.sources.Tables.documents(spark, sf)
    all.filter($"doc_id" < 400).createOrReplaceTempView("ext_arr_standing")
    all.filter($"doc_id" >= 400).createOrReplaceTempView("ext_arr_arrivals")
    def pin(sql: org.apache.spark.sql.DataFrame,
            api: org.apache.spark.sql.DataFrame, nonEmpty: Boolean): Unit = {
      assert(sql.columns.toSeq === api.columns.toSeq)
      assert(sql.collect().map(_.toString).sorted.toSeq ===
        api.collect().map(_.toString).sorted.toSeq)
      if (nonEmpty) assert(sql.count() > 0)
    }
    // monotone identity: corpus-wide first-instance stats on arrival ids
    pin(spark.sql("SELECT * FROM graft_incremental_block_dedup(" +
        "'ext_arr_standing', 'ext_arr_arrivals', '8')"),
      graft.ops.Dedup.blockDedup(all, 8).filter($"doc_id" >= 400),
      nonEmpty = true)
    // pairwise identity: corpus-wide containment on (arrival, standing)
    pin(spark.sql("SELECT * FROM graft_incremental_containment(" +
        "'ext_arr_standing', 'ext_arr_arrivals', '3', '0.8')"),
      graft.ops.Dedup.containmentJoin(all, 3, 0.8)
        .filter($"d_sub" >= 400 && $"d_super" < 400),
      nonEmpty = true)
    // and the TVF identity equals the REAL standing-index screen
    val dir = graft.sources.Scratch.dir("graft_ext_cont")
    graft.ops.Dedup.writeContainmentIndex(all.filter($"doc_id" < 400), dir)
    pin(spark.sql("SELECT * FROM graft_incremental_containment(" +
        "'ext_arr_standing', 'ext_arr_arrivals', '3', '0.8')"),
      graft.ops.Dedup.incrementalContainmentScreen(
        spark, dir, all.filter($"doc_id" >= 400), 3, 0.8),
      nonEmpty = true)
    // the INDEXED probe TVFs (cost ∝ batch): same rows as the Scala
    // screens over the same standing index — the cheap paths from SQL
    pin(spark.sql(
        s"SELECT * FROM graft_containment_screen('ext_arr_arrivals', '$dir', '3', '0.8')"),
      graft.ops.Dedup.incrementalContainmentScreen(
        spark, dir, all.filter($"doc_id" >= 400), 3, 0.8),
      nonEmpty = true)
    val spanIdx = graft.sources.Scratch.dir("graft_ext_span")
    val corpusDir = graft.sources.Scratch.dir("graft_ext_corp")
    graft.ops.Dedup.writeFingerprintIndex(all.filter($"doc_id" < 400), spanIdx)
    all.filter($"doc_id" < 400).write.mode("overwrite").parquet(corpusDir)
    pin(spark.sql("SELECT * FROM graft_span_screen_indexed(" +
        s"'ext_arr_arrivals', '$spanIdx', '$corpusDir', '8')"),
      graft.ops.Dedup.incrementalSpanScreen(spark, spanIdx,
        spark.read.parquet(corpusDir), all.filter($"doc_id" >= 400), 8),
      nonEmpty = true)
  }

  test("graft_span_screen TVF matches the incremental span screen") {
    val all = graft.sources.Tables.documents(spark, sf)
    all.filter($"doc_id" < 400).createOrReplaceTempView("ext_span_standing")
    all.filter($"doc_id" >= 400).createOrReplaceTempView("ext_span_arrivals")
    val sSql = spark.sql(
      "SELECT * FROM graft_span_screen('ext_span_standing', 'ext_span_arrivals', '8')")
    // the TVF's documented identity: the corpus-wide keep-first pipeline
    // restricted to arrival ids (= keep-standing under monotone ingestion,
    // the same equivalence the incremental screen's DedupSpec pins)
    val sApi = graft.ops.Dedup.exactSubstrSpans(all, minLen = 8)
      .filter($"doc_id" >= 400)
    assert(sSql.columns.toSeq === sApi.columns.toSeq)
    assert(sSql.collect().map(_.toString).sorted.toSeq ===
      sApi.collect().map(_.toString).sorted.toSeq)
    assert(sSql.count() > 0, "testdata should produce arrival spans")
  }

  test("EXPLAIN of analysis-invoked graph ops launches no Spark jobs") {
    // The resolution rule invokes labelPropagate/graphTriangles DURING
    // analysis; with the r13 eager localCheckpoints merely EXPLAINing a
    // graft_label_propagation call executed the full kNN build as real
    // jobs (r13 ADVICE). Lazy checkpoints defer materialization to the
    // first real action — pinned here with a job-start listener over an
    // in-memory relation (no incidental file-listing jobs to exclude).
    Seq((0L, Array(1.0f, 0.0f), "a"), (1L, Array(0.9f, 0.1f), "b"),
        (2L, Array(0.0f, 1.0f), null.asInstanceOf[String]))
      .toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("ext_lazy_emb")
    // warm-up outside the listener window: one-time lazy session init
    spark.sql(
      "EXPLAIN SELECT * FROM graft_label_propagation('ext_lazy_emb', '1', '5', '1')")
      .collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      spark.sql(
        "EXPLAIN SELECT * FROM graft_label_propagation('ext_lazy_emb', '1', '5', '2')")
        .collect()
      org.apache.spark.sql.graft.GraftSqlShim.drainListenerBus(spark)
      assert(jobs.get() === 0,
        s"EXPLAIN of graft_label_propagation ran ${jobs.get()} Spark jobs " +
          "— an analysis-reachable operator materialized eagerly")
      // and the standing-index containment screen (r14 ADVICE: its eager
      // probe checkpoints ran jobs at analysis time; now lazy bounded
      // persists). File-source jobs from parquet schema inference are
      // excluded by pre-building the index and warming the read below.
      val contIdx = graft.sources.Scratch.dir("graft_ext_cs_lazy")
      Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
        .createOrReplaceTempView("ext_lazy_arr")
      graft.ops.Dedup.writeContainmentIndex(
        Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
        contIdx)
      spark.sql(s"EXPLAIN SELECT * FROM graft_containment_screen(" +
          s"'ext_lazy_arr', '$contIdx', '3', '0.8')").collect()
      def jobsDuring(body: => Unit): Int = {
        val n = new java.util.concurrent.atomic.AtomicInteger(0)
        val lis = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            n.incrementAndGet(); ()
          }
        }
        spark.sparkContext.addSparkListener(lis)
        try {
          body
          org.apache.spark.sql.graft.GraftSqlShim.drainListenerBus(spark)
        } finally spark.sparkContext.removeSparkListener(lis)
        n.get()
      }
      // a parquet-backed plan pays fixed source-side jobs (schema
      // inference / file listing) merely to CONSTRUCT the read — measure
      // that floor on the raw index reads, then require the screen's
      // EXPLAIN to add NOTHING on top of it (the probe itself runs no
      // jobs at analysis; pre-fix it ran the full probe pipeline here)
      val readFloor = jobsDuring {
        Seq("shingles", "sizes", "df").foreach { t =>
          spark.read.parquet(s"$contIdx/$t").queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
        }
      }
      val screenJobs = jobsDuring {
        spark.sql(s"EXPLAIN SELECT * FROM graft_containment_screen(" +
            s"'ext_lazy_arr', '$contIdx', '3', '0.9')").collect()
      }
      assert(screenJobs <= readFloor,
        s"EXPLAIN of graft_containment_screen ran $screenJobs Spark jobs vs " +
          s"a $readFloor-job source floor — probe frames materialized at analysis time")
      // same pin for the standing fingerprint-index span screen (r15
      // verdict: its probe frames were still eager localCheckpoints;
      // now lazy bounded persists like the containment screen's)
      val spanIdx = graft.sources.Scratch.dir("graft_ext_ss_lazy")
      val spanCorpus = graft.sources.Scratch.dir("graft_ext_ss_corpus")
      val standingDocs = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text")
      graft.ops.Dedup.writeFingerprintIndex(standingDocs, spanIdx)
      standingDocs.write.mode("overwrite").parquet(spanCorpus)
      Seq((10L, "alpha beta gamma delta epsilon zeta eta theta iota mu"))
        .toDF("doc_id", "text").createOrReplaceTempView("ext_lazy_span_arr")
      spark.sql(s"EXPLAIN SELECT * FROM graft_span_screen_indexed(" +
          s"'ext_lazy_span_arr', '$spanIdx', '$spanCorpus', '8')").collect()
      val spanFloor = jobsDuring {
        Seq(spanIdx, spanCorpus).foreach { t =>
          spark.read.parquet(t).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
        }
      }
      val spanJobs = jobsDuring {
        spark.sql(s"EXPLAIN SELECT * FROM graft_span_screen_indexed(" +
            s"'ext_lazy_span_arr', '$spanIdx', '$spanCorpus', '9')").collect()
      }
      assert(spanJobs <= spanFloor,
        s"EXPLAIN of graft_span_screen_indexed ran $spanJobs Spark jobs vs " +
          s"a $spanFloor-job source floor — probe frames materialized at analysis time")
    } finally spark.sparkContext.removeSparkListener(l)
    // and the operator still computes correctly after the lazy change
    val out = Similarity.labelPropagate(
      Seq((0L, Array(1.0f, 0.0f), "a"), (1L, Array(0.9f, 0.1f), "b"))
        .toDF("vec_id", "embedding", "label"), k = 1, seedMod = 5, rounds = 1)
      .orderBy("vec_id").collect()
    assert(out.length === 2)
  }

  test("graft_srp_band_values is SQL-callable and matches the Scala API") {
    val planes = Similarity.planeMatrix(8, 4, 42L)
    val planesSql = planes
      .map(_.map(_.toString).mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val fromSql = spark.sql(
      s"SELECT graft_srp_band_values(array(0.5D, -1.5D, 2.0D, 0.25D), $planesSql, 4) AS b")
      .as[Seq[Long]].head()
    val fromApi = Seq(Seq(0.5, -1.5, 2.0, 0.25)).toDF("emb")
      .select(NativeExpressions.srpBandValues($"emb", planes, 4).as("b"))
      .as[Seq[Long]].head()
    assert(fromSql === fromApi)
    assert(fromSql.length === 2) // 8 planes / 4 rows
  }
}
