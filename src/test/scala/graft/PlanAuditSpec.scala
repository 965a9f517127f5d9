package graft

/** Whole-registry physical-plan audit — the 100 TB posture checks that
  * don't show up in row-level correctness: no accidental cross products, no
  * unintended nested-loop joins, and scans pruned to the columns an
  * operator actually uses (documents carries lang/source/n_chars and
  * embeddings a label column precisely so sloppy scans would be caught).
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val plans: Seq[(String, String)] =
    SparkEntry.registry.map(q => q.name -> planOf(q.run(spark, sf)))

  test("no query plans a cartesian product") {
    plans.foreach { case (name, p) =>
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("nested-loop joins only where the operator intends one") {
    // knn_bruteforce intentionally broadcast-NL-joins the (tiny) query set
    // against every vector — that IS the brute-force contract; knn_ivf and
    // knn_ivf_disk likewise broadcast-NL-join the tiny centroid set for
    // assignment/probe scoring (every vector scores every centroid by
    // design); tfidf_topterms and bigram_pmi broadcast-NL-join their
    // single-row corpus totals onto the scored rows; incremental_distinct
    // joins its single-row sketch-merge total to the single-row exact
    // count; quantile_sketch cross-joins its 4-row quantile list onto the
    // cumulative bins (every bin scores every requested quantile by
    // design); q22_sales_opportunity broadcasts its single-row global
    // average balance onto the customer dim (the scalar-subquery plan);
    // events_gap_fill broadcasts its single-row day-span bounds onto the
    // user list before the map-side grid explode; coreset_kcenter
    // broadcasts the single-row newest center onto every corpus row each
    // round (the Gonzalez update IS a corpus × 1 product); ann_recall
    // cross-joins its single-row truth-count and hit-count summaries;
    // lm_bigram_score broadcasts its single-row vocabulary size onto the
    // scored bigrams, rfm_segments its single-row corpus max-date onto
    // the customer aggregate; knn_classify_eval votes over the
    // brute-force search so it inherits knn_bruteforce's intended BNLJ;
    // semi_additive_balance broadcasts its single-row month span onto the
    // customer dim before the map-side grid explode (events_gap_fill's
    // shape); ccnet_perplexity_buckets wraps lm_bigram_score and inherits
    // its single-row vocabulary-size broadcast
    plans.filterNot(p =>
        Set("knn_bruteforce", "knn_ivf", "knn_ivf_disk", "knn_ivf_pq",
            "tfidf_topterms", "bigram_pmi", "incremental_distinct",
            "bm25_rank", "quantile_sketch", "q22_sales_opportunity",
            "events_gap_fill", "coreset_kcenter",
            "sliding_active_users", "hybrid_rrf", "skew_report",
            "knn_ivf_partial", "ann_recall", "ivf_recall",
            "lm_bigram_score", "rfm_segments", "knn_classify_eval",
            "semi_additive_balance", "ccnet_perplexity_buckets",
            "source_keywords", "basket_lift",
            // the r11 knn family inherits knn_bruteforce's intended
            // broadcast-NL scoring join (every vector scores the
            // broadcast query/corpus set by design)
            "hard_negatives", "knn_graph", "mutual_knn",
            "mutual_knn_clusters",
            // r11 continuation: the retrieval evals inherit
            // knn_bruteforce's intended BNLJ; mixture_schedule /
            // label_balance broadcast their single-row totals onto the
            // |sources|/|labels|-sized rollup; dau_wau_stickiness
            // broadcasts its single-row day bound before the grid
            // explode (sliding_active_users' shape)
            "retrieval_rank_eval", "retrieval_eval_by_label",
            "mixture_schedule", "label_balance",
            "dau_wau_stickiness",
            // r13: the DSIR pair broadcasts its two single-row model
            // totals (and dsir_sample the single-row weight max) onto
            // the scored feature stream — the broadcast-totals pattern
            "dsir_weights", "dsir_sample",
            // r13 continuation: the reduced-recall pair inherits
            // knn_bruteforce's intended BNLJ via knnGraph on BOTH the
            // full and reduced spaces, and cross-joins its two
            // single-row count summaries — ann_recall's exact shape
            "rp_knn_recall", "truncation_recall",
            // r14: the mutual-kNN consumers inherit knn_bruteforce's
            // intended BNLJ too — it was always in their lineage, but
            // the r13 eager localCheckpoint hid the kNN subtree behind
            // an ExistingRDD scan; the lazy persist (no-jobs-at-analysis,
            // r13 ADVICE) leaves the cached subtree visible to this audit
            "label_propagation", "graph_triangles",
            // r15: the nprobe sweep re-runs ann_recall's shape per
            // nprobe value — knn_bruteforce's intended BNLJ scoring
            // plus the two single-row count-summary crossJoins
            "ivf_nprobe_curve",
            // r16: the SRP banding sweep is ann_recall's exact shape per
            // (bands, rows) scheme — the brute-force truth is
            // knn_bruteforce's intended BNLJ, and each scheme's hit /
            // candidate summaries are the two 1-row crossJoins
            "lsh_bands_curve",
            // r18: crawl_budget broadcasts its single-row exact-decimal
            // score total onto the |hosts|-bounded census — the
            // broadcast-totals pattern (mixture_schedule's shape)
            "crawl_budget")(p._1))
      .foreach { case (name, p) =>
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a BNLJ")
      }
  }

  test("text operators scan only (doc_id, text) from documents") {
    Seq("lang_id", "text_quality", "token_count", "doc_fingerprint",
        "dedup_exact", "ngram_jaccard", "dedup_minhash", "dedup_simhash",
        "quality_repetition", "pii_redact", "text_normalize",
        "quality_filter", "bpe_pair_counts", "decontaminate",
        "tfidf_topterms", "bigram_pmi", "quality_weighted_sample",
        "dedup_eval", "contamination_score", "span_dedup",
        "bm25_rank", "gopher_rules", "lm_bigram_score",
        "doc_chunking", "ccnet_perplexity_buckets",
        // r16: the vocab frontier buckets by doc_id and tokenizes text
        "vocab_growth",
        // r16 tuning curves: all four sweep signal/pair frames derived
        // from (doc_id, text) alone (dedup_threshold_curve's doc-id list
        // is a second, narrower scan — also pruned)
        "minhash_band_curve", "simhash_radius_curve",
        "dedup_threshold_curve", "quality_threshold_curve",
        "contamination_threshold_curve").foreach { name =>
      // (dedup_clusters' final plan starts from localCheckpointed label
      // RDDs — its upstream scans are audited via dedup_minhash;
      // bpe_pair_counts builds pairs per-doc with lead windows keyed by
      // doc_id — pairs must not span document boundaries)
      val p = plans.toMap.apply(name)
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        s"$name reads more than (doc_id, text) from documents")
    }
    // heavy_hitters buckets/shards by doc_id and tokenizes text — same pair
    assert(plans.toMap.apply("heavy_hitters")
      .contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "heavy_hitters reads more than (doc_id, text) from documents")
    // corpus-level heads need only text
    Seq("token_topk").foreach { name =>
      assert(plans.toMap.apply(name).contains("ReadSchema: struct<text:string>"),
        s"$name reads more than (text) from documents")
    }
    // quantile_sketch needs exactly the bucket timestamp and the price
    assert(plans.toMap.apply("quantile_sketch")
      .contains("ReadSchema: struct<l_extendedprice:double,l_shipdate:timestamp"),
      "quantile_sketch reads more than (l_extendedprice, l_shipdate) from lineitem")
  }

  test("vector operators scan only (vec_id, embedding) from embeddings") {
    // (dedup_semantic's final plan embeds checkpointed codebook RDDs, but
    // its pair/assignment scans still read only the id+vector columns)
    Seq("knn_bruteforce", "knn_lsh", "knn_ivf", "dedup_embedding",
        "embedding_quantize", "embedding_norm_stats", "pq_encode",
        "knn_pq", "dedup_semantic").foreach { name =>
      val p = plans.toMap.apply(name)
      assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
        s"$name reads more than (vec_id, embedding) from embeddings")
    }
    // centroids group by the label column, nothing else beyond it
    assert(plans.toMap.apply("embedding_centroids")
      .contains("ReadSchema: struct<embedding:array<float>,label:int>"),
      "embedding_centroids reads more than (embedding, label)")
    // the drift read needs the parity id too — exactly those three
    assert(plans.toMap.apply("embedding_drift")
      .contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>,label:int>"),
      "embedding_drift reads more than (vec_id, embedding, label)")
  }

  test("round-5 operators keep their intended shuffle shapes") {
    val m = plans.toMap
    // decontaminate: the benchmark shingle set must BROADCAST into a semi
    // join — a shuffled semi join would move the whole corpus's shingles
    val decon = m("decontaminate")
    assert(decon.contains("BroadcastHashJoin") && decon.contains("LeftSemi"),
      s"decontaminate should broadcast-semi-join the benchmark shingles:\n$decon")
    // domain_balance: the tiny rate table broadcasts onto the scan; the
    // sample filter itself is map-side (no aggregate after the join)
    assert(m("domain_balance").contains("BroadcastHashJoin"),
      "domain_balance should broadcast the per-stratum rates")
    // seq_packing: exactly ONE exchange — the per-shard repartition feeding
    // the cumsum window; anything more means the packing gained a shuffle
    val packExchanges = "Exchange hashpartitioning".r
      .findAllIn(m("seq_packing")).length
    assert(packExchanges === 1,
      s"seq_packing should shuffle once (per-shard), found $packExchanges")
    // ccnet_length_buckets: the per-language threshold table broadcasts
    // back onto the corpus — the corpus itself must not shuffle for the
    // bucket assignment
    assert(m("ccnet_length_buckets").contains("BroadcastHashJoin"),
      "ccnet_length_buckets should broadcast the per-language thresholds")
    // incremental_dedup: the arrival batch's bands BROADCAST onto the
    // persisted index scan and old text is touched only through a semi
    // join — the standing corpus must never shuffle on arrival
    val inc = m("incremental_dedup")
    assert(inc.contains("BroadcastHashJoin"),
      s"incremental_dedup should broadcast the new-arrival bands onto the index:\n$inc")
    assert(inc.contains("LeftSemi"),
      s"incremental_dedup should prune old text via a semi join:\n$inc")
  }

  test("round-7 operators keep their intended shuffle shapes") {
    val m = plans.toMap
    // cube_sales: the 2-column customer projection broadcasts, and all four
    // grouping sets come from ONE Expand over a single fact pass — never a
    // union of per-grouping aggregates
    val cube = m("cube_sales")
    assert(cube.contains("BroadcastHashJoin"),
      s"cube_sales should broadcast the customer projection:\n$cube")
    assert(cube.contains("Expand"),
      s"cube_sales should plan CUBE as one Expand, not unioned aggs:\n$cube")
    // contamination_score: like decontaminate, the benchmark hash set
    // broadcasts — the corpus side must not shuffle to discover hits
    assert(m("contamination_score").contains("BroadcastHashJoin"),
      "contamination_score should broadcast the benchmark shingle hashes")
    // table_stats: the exact multi-column NDVs plan as one scan + one
    // Expand (k-way row multiplication of id-width rows), not k scans
    val stats = m("table_stats")
    assert(stats.contains("Expand"),
      s"table_stats should plan multi-distinct via Expand:\n$stats")
    assert("Scan parquet".r.findAllIn(stats).length === 1,
      s"table_stats should read the table exactly once:\n$stats")
    // window_moving_avg: exactly one hash exchange — the o_custkey window
    // partition; both frames and the lag ride the same sort
    val mv = "Exchange hashpartitioning".r
      .findAllIn(m("window_moving_avg")).length
    assert(mv === 1,
      s"window_moving_avg should shuffle once on o_custkey, found $mv")
  }

  test("round-8 event operators keep their intended shuffle shapes") {
    val m = plans.toMap
    // events_funnel: the step frontiers are checkpointed, so the final
    // plan joins three user-sized RDDs and re-reads the FACT zero times
    // (before the checkpoint fix, frame chaining re-derived every earlier
    // frontier inside every later one: k(k+1)/2 = 6 fact scans for 3
    // steps); each frontier appears exactly once, and any hash exchange
    // left in the assembly is user-keyed
    val funnel = m("events_funnel")
    assert(!funnel.contains("Scan parquet"),
      s"events_funnel should assemble checkpointed frontiers, not rescan the fact:\n$funnel")
    assert("Scan ExistingRDD".r.findAllIn(funnel).length === 3,
      s"events_funnel should join exactly its 3 step frontiers once each:\n$funnel")
    "Exchange hashpartitioning\\(([^)]*)".r.findAllMatchIn(funnel).foreach { ex =>
      assert(ex.group(1).contains("user_id"),
        s"events_funnel plans a non-user-keyed exchange: ${ex.matched}\n$funnel")
    }
    // events_retention: ONE fact scan feeding the distinct (user, week)
    // base; the cohort is a window over the user-keyed exchange (a join
    // back to a separate first-event aggregate re-plans as a second scan);
    // every exchange is user- or cohort-keyed
    val ret = m("events_retention")
    assert("Scan parquet".r.findAllIn(ret).length === 1,
      s"events_retention should scan the fact exactly once:\n$ret")
    assert(ret.contains("Window") && ret.contains("min(active_week"),
      s"events_retention should take the cohort as a window min:\n$ret")
    "Exchange hashpartitioning\\(([^)]*)".r.findAllMatchIn(ret).foreach { ex =>
      assert(ex.group(1).contains("user_id") || ex.group(1).contains("cohort_week"),
        s"events_retention plans an unexpected exchange: ${ex.matched}\n$ret")
    }
  }

  test("round-8 pipeline operators keep their intended shuffle shapes") {
    val m = plans.toMap
    // events_gap_fill: every hash exchange is user-keyed (the daily agg
    // checkpoints, the grid explodes map-side, the fill window rides the
    // user key) — a day- or global-keyed exchange would mean the grid
    // traveled a shuffle
    "Exchange hashpartitioning\\(([^)]*)".r
      .findAllMatchIn(m("events_gap_fill")).foreach { ex =>
        assert(ex.group(1).contains("user_id"),
          s"events_gap_fill plans a non-user-keyed exchange: ${ex.matched}")
      }
    // coreset_kcenter: Checkpoints.drain lands the k center rows
    // driver-local — the returned plan is a single LocalTableScan; the
    // corpus appears in NO scan and NO exchange (all corpus passes
    // happened eagerly inside the rounds), no per-round ExistingRDD
    // checkpoint survives into the plan, and — drain's actual contract —
    // no checkpoint blocks stay pinned on the executors after the call
    val kc = m("coreset_kcenter")
    assert(!kc.contains("Scan parquet"),
      s"coreset_kcenter's assembled plan should be driver-local rows:\n$kc")
    assert(kc.contains("LocalTableScan"),
      s"coreset_kcenter's drained plan should be a LocalTableScan:\n$kc")
    assert(!kc.contains("Scan ExistingRDD"),
      s"coreset_kcenter should retain no checkpoint RDDs in its plan:\n$kc")
    // event_transitions: the lead window shuffles on user_id; the matrix
    // aggregate keys on the (from, to) pair (pre-rename name:
    // event_type); the conditional-probability window re-keys the
    // |types|²-row matrix on from_type; nothing else
    "Exchange hashpartitioning\\(([^)]*)".r
      .findAllMatchIn(m("event_transitions")).foreach { ex =>
        assert(ex.group(1).contains("user_id") || ex.group(1).contains("event_type") ||
            ex.group(1).contains("from_type"),
          s"event_transitions plans an unexpected exchange: ${ex.matched}")
      }
  }

  test("round-10 curation operators keep their intended shuffle shapes") {
    val m = plans.toMap
    // gopher_rules: one explode + one doc_id-keyed aggregate — every hash
    // exchange rides the doc key; rule verdicts are a pure projection
    "Exchange hashpartitioning\\(([^)]*)".r
      .findAllMatchIn(m("gopher_rules")).foreach { ex =>
        assert(ex.group(1).contains("doc_id"),
          s"gopher_rules plans a non-doc-keyed exchange: ${ex.matched}")
      }
    // length_outliers: the |sources|-row moment table must BROADCAST back
    // onto the rows — a shuffled join would move the corpus for a
    // dim-sized lookup; the row side reads only (doc_id, source, n_chars)
    val lo = m("length_outliers")
    assert(lo.contains("BroadcastHashJoin"),
      s"length_outliers should broadcast the group moments:\n$lo")
    assert(lo.contains("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"),
      s"length_outliers reads more than (doc_id, source, n_chars):\n$lo")
    // source_dup_stats: the (doc_id, source) side prunes to exactly those
    // two columns — duplication health must not re-read text for the join
    assert(m("source_dup_stats")
      .contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"source_dup_stats' join side reads more than (doc_id, source)")
    // rfm_segments: ONE orders scan pruned to the three RFM source
    // columns; the dim-sized ntiles never touch the fact again
    val rfm = m("rfm_segments")
    assert("Scan parquet .*orders".r.findAllIn(rfm).length <= 2,
      s"rfm_segments should scan orders for the aggregate + 1-row max only:\n$rfm")
    assert(rfm.contains(
      "ReadSchema: struct<o_custkey:bigint,o_totalprice:double,o_orderdate:timestamp"),
      s"rfm_segments reads more than (custkey, totalprice, orderdate):\n$rfm")
  }

  test("q15 takes the global max as a window over the aggregate, not a second fact scan") {
    // The argmax-report shape: the naive scalar-subquery plan evaluates
    // the revenue CTE twice (two lineitem scans); the window form scans
    // the fact once and runs max() over the |suppliers|-row aggregate
    val p = plans.toMap.apply("q15_top_supplier")
    assert("Scan parquet .*lineitem".r.findAllIn(p).length === 1,
      s"q15_top_supplier should scan lineitem exactly once:\n$p")
    assert(p.contains("Window"),
      s"q15_top_supplier should take the global max as a window:\n$p")
  }

  test("coreset_kcenter drains its round checkpoints from executor storage") {
    // Checkpoints.drain's contract: the k center rows land driver-local
    // and EVERY checkpoint the call pinned is released before it returns
    // — repeated invocations in one session (the bench's cold+warm double
    // run) must not accumulate executor block storage. Measured as a
    // before/after delta so checkpoints legitimately held by other suites
    // sharing the session don't bleed into the assert.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = SparkEntry.queries("coreset_kcenter")(spark, sf)
    assert(out.count() === 8)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"coreset_kcenter left ${leaked.size} checkpoint RDD(s) pinned: $leaked")
  }

  test("internal operator caches dedupe repeat inputs and stay LRU-bounded") {
    // InternalCaches' lifecycle contract (the r14 ADVICE leak class): an
    // operator that persists a shared internal subtree (ngramJaccard,
    // containmentJoin, mutualKnn, sourceOverlap...) must (a) NOT grow
    // executor storage when re-invoked on the SAME input — CacheManager
    // is canonical-plan-keyed and the LRU dedupes — and (b) hold at most
    // spark.graft.internalCache.maxEntries distinct plans in a long-lived
    // session, evicting least-recently-used beyond that. Without the
    // bound, every distinct corpus ever passed through a standing
    // analytics service pins a corpus×k InMemoryRelation forever.
    import org.apache.spark.sql.functions.col
    val docs = sources.Tables.documents(spark, sf).limit(60)
    graft.ops.InternalCaches.clear()
    val base = spark.sparkContext.getPersistentRDDs.keySet

    graft.ops.Dedup.ngramJaccard(docs).count()
    val after1 = spark.sparkContext.getPersistentRDDs.keySet -- base
    graft.ops.Dedup.ngramJaccard(docs).count()
    val after2 = spark.sparkContext.getPersistentRDDs.keySet -- base
    assert(after2 === after1,
      s"re-invoking ngramJaccard on the same input grew persistent RDDs: ${after2 -- after1}")

    val old = spark.conf.getOption("spark.graft.internalCache.maxEntries")
    spark.conf.set("spark.graft.internalCache.maxEntries", "3")
    try {
      for (i <- 0 to 5)
        graft.ops.Dedup.ngramJaccard(docs.filter(col("doc_id") % 7 =!= i)).count()
      assert(graft.ops.InternalCaches.size <= 3,
        s"LRU held ${graft.ops.InternalCaches.size} entries over the cap of 3")
      val pinned = spark.sparkContext.getPersistentRDDs.keySet -- base
      assert(pinned.size <= 3 + after1.size,
        s"distinct-input invocations pinned ${pinned.size} RDDs past the cap")
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.graft.internalCache.maxEntries", v)
        case None    => spark.conf.unset("spark.graft.internalCache.maxEntries")
      }
      graft.ops.InternalCaches.clear()
    }
    assert((spark.sparkContext.getPersistentRDDs.keySet -- base).isEmpty,
      "InternalCaches.clear() left internally-persisted RDDs pinned")

    // release(df): the single-owner caller-side free path (r15 ADVICE —
    // a bare df.unpersist() desyncs the LRU's book-keeping). Releasing a
    // held frame unpins its blocks AND forgets the entry; releasing an
    // unheld frame is a no-op.
    val held = graft.ops.InternalCaches.persistBounded(docs.select(col("doc_id")))
    held.count()
    assert(graft.ops.InternalCaches.size === 1)
    graft.ops.InternalCaches.release(held)
    assert(graft.ops.InternalCaches.size === 0,
      "release() left the LRU entry behind")
    assert((spark.sparkContext.getPersistentRDDs.keySet -- base).isEmpty,
      "release() left the frame's RDD pinned")
    graft.ops.InternalCaches.release(docs.select(col("source"))) // no-op
    assert(graft.ops.InternalCaches.size === 0)
  }

  test("runtime bloom-filter pruning engages for non-broadcastable selective joins") {
    // The 100 TB posture when a selective join side is too big to
    // broadcast (the size-tiered incremental-sync case: millions of
    // changed keys): Spark's InjectRuntimeFilter builds a bloom filter on
    // the creation side and pushes a might_contain probe into the fact
    // scan, cutting the shuffle before the SMJ. Pinned here so a Spark
    // upgrade or conf drift that silently loses the rewrite is caught.
    // Thresholds are lowered because test-scale tables are far below the
    // 10 GB application-side default.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.col
      val changed = graft.sources.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val resync = graft.sources.Tables.lineitem(spark, sf)
        .join(changed, col("l_orderkey") === col("o_orderkey"), "left_semi")
      val p = planOf(resync)
      assert(p.contains("might_contain"),
        s"runtime bloom filter did not inject into the semi-join plan:\n$p")
    } finally olds.foreach { case (k, old) =>
      old.fold(spark.conf.unset(k))(v => spark.conf.set(k, v))
    }
  }

  test("q17 decorrelates to a windowed threshold: one fact scan, no fact join shuffle") {
    val p = plans.toMap.apply("q17_small_quantity")
    assert(p.contains("BroadcastHashJoin"),
      s"q17 should broadcast the brand-filtered part side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q17 must not shuffle the fact for its joins:\n$p")
    // the whole query reads exactly two tables once each — an agg +
    // broadcast-join-back formulation re-evaluates the fact scan per branch
    assert("Scan parquet".r.findAllIn(p).length === 2,
      s"q17 should scan lineitem and part exactly once each:\n$p")
  }

  test("q2/q20 catalog analogs: broadcast join-backs, one fact shuffle each") {
    val p2 = plans.toMap.apply("q2_min_cost_supplier")
    // part filter and the EUROPE roster broadcast onto the pair aggregate;
    // the only SMJ-eligible shuffle is the (partkey, suppkey) groupBy
    assert(p2.contains("BroadcastHashJoin"),
      s"q2 should broadcast parts + roster onto the catalog:\n$p2")
    assert(!p2.contains("SortMergeJoin"),
      s"q2 must not shuffle the fact for its joins:\n$p2")
    // argmin runs as a window over the catalog-sized frame, never a
    // second fact scan (the scalar-subquery plan would re-scan lineitem)
    assert(p2.contains("Window"), s"q2 argmin should be a window:\n$p2")
    assert("Scan parquet".r.findAllIn(p2).length === 5,
      s"q2 should scan lineitem/part/supplier/nation/region once each:\n$p2")
    val p20 = plans.toMap.apply("q20_potential_promotion")
    // the promo-part prune enters the fact scan as a broadcast semi-join;
    // the supplier roster semi-join is likewise broadcast
    assert(p20.contains("BroadcastHashJoin") && p20.contains("LeftSemi"),
      s"q20's nested chain should be broadcast semi-joins:\n$p20")
    assert(!p20.contains("SortMergeJoin"),
      s"q20 must not shuffle the fact for its joins:\n$p20")
    // the correlated threshold folds into ONE grouped scan of lineitem
    assert("Scan parquet".r.findAllIn(p20).length === 4,
      s"q20 should scan lineitem/part/supplier/nation once each:\n$p20")
  }

  test("r11 entries prune their scans and keep the argmax/merge windows off the raw data") {
    val gm = plans.toMap.apply("group_mode")
    // the events scan feeds a (type, user) aggregate — value/props/ts must
    // not be read at all
    val evScan = gm.linesIterator.filter(_.contains("events.parquet")).mkString
    Seq("props", "value").foreach(c =>
      assert(!evScan.contains(c), s"group_mode reads events.$c needlessly:\n$gm"))
    val td = plans.toMap.apply("token_drift")
    // token_drift needs (doc_id, source, text) only — the decoy columns
    // (lang, n_chars) exist precisely to catch sloppy scans
    val docScan = td.linesIterator.filter(_.contains("documents.parquet")).mkString
    Seq("lang", "n_chars").foreach(c =>
      assert(!docScan.contains(c), s"token_drift reads documents.$c needlessly:\n$td"))
    assert(!td.contains("SortMergeJoin") && !td.contains("Window"),
      s"token_drift is one grouped scan — no join, no window:\n$td")
    val ess = plans.toMap.apply("exact_substr_spans")
    // candidate pairs are small → both match-join probes must broadcast;
    // the only SMJ-eligible shuffles are the gram/window exchanges
    assert(ess.contains("BroadcastHashJoin"),
      s"exact_substr_spans should broadcast the pair set:\n$ess")
    assert(!ess.contains("CartesianProduct"))
  }

  test("r11 continuation entries keep their intended shapes") {
    val bp = plans.toMap.apply("boilerplate_spans")
    // the hot-gram semi-join is size-adaptive — Catalyst broadcasts when
    // the aggregated hot set's stats prove it small (true here and
    // usually in production: hot grams are few by definition) and falls
    // back to a hash-partitioned join when they don't; the audit pins
    // only that it is a HASH join, never a nested-loop product
    val semiJoins = bp.linesIterator.filter(_.contains("LeftSemi")).mkString
    assert(semiJoins.contains("HashJoin"),
      s"boilerplate_spans' hot-gram probe should be a hash join:\n$bp")
    // documents scan prunes to (doc_id, text)
    assert(bp.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"boilerplate_spans reads more than (doc_id, text):\n$bp")
    val ftc = plans.toMap.apply("funnel_time_to_convert")
    // funnel frontiers are checkpointed: one pushed-filter events scan per
    // step, never the k(k+1)/2 re-derivation
    val evScans = ftc.linesIterator.count(_.contains("events.parquet"))
    assert(evScans <= 3,
      s"funnel_time_to_convert re-derives frontiers ($evScans event scans):\n$ftc")
    // fertility needs (source, text) only — doc_id and the decoy columns
    // must be pruned from every documents scan
    val bf = plans.toMap.apply("bpe_fertility")
    val bfScans = bf.linesIterator.filter(_.contains("documents.parquet")).mkString
    Seq("doc_id", "lang", "n_chars").foreach(c =>
      assert(!bfScans.contains(c),
        s"bpe_fertility reads documents.$c needlessly:\n$bf"))
  }

  test("event operators do not read the props payload column") {
    Seq("events_windowed", "events_sessionize", "scd1_upsert", "cdc_apply",
        "attribution_linear", "attribution_position", "dau_wau_stickiness",
        "user_concentration")
      .foreach { name =>
        val p = plans.toMap.apply(name)
        assert(!p.contains("props"), s"$name reads events.props needlessly")
      }
  }

  test("r11 eval/attribution entries keep their intended shapes") {
    // attribution: ONE fact scan + window pass feeding both union branches
    // (the conversion-sized base is checkpointed), never a self-join of
    // events to events
    Seq("attribution_linear", "attribution_position").foreach { name =>
      val p = plans.toMap.apply(name)
      val evScans = p.linesIterator.count(_.contains("events.parquet"))
      assert(evScans === 0, // checkpointed base: branches start from RDD
        s"$name re-derives the window pass ($evScans fact scans):\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$name self-joins the fact:\n$p")
    }
    // the window pass itself shuffles user-keyed exactly once
    val base = planOf(graft.ops.Events.attributionBase(
      graft.sources.Tables.events(spark, sf)))
    assert(base.linesIterator.count(_.contains("hashpartitioning(user_id")) === 1,
      s"attributionBase should shuffle user-keyed exactly once:\n$base")
    assert(base.linesIterator.count(_.contains("events.parquet")) === 1,
      s"attributionBase should scan the fact exactly once:\n$base")
    // stickiness: fact collapses to distinct (user, day) before the grid
    // explode — the explode must run over the checkpointed user-day frame
    val st = plans.toMap.apply("dau_wau_stickiness")
    assert(st.linesIterator.count(_.contains("events.parquet")) === 0,
      "stickiness must reuse ONE checkpointed user-day frame for both aggregates")
    // retrieval evals stay probe-bounded: embeddings scans prune to the
    // columns the search + label attach need
    val re = plans.toMap.apply("retrieval_rank_eval")
    assert(re.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>")
        || re.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>,label:int>"),
      s"retrieval_rank_eval scans unpruned embeddings:\n$re")
  }
}
