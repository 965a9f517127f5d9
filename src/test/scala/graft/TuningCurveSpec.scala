package graft

import org.apache.spark.sql.Row

/** Pins for the deployment tuning curves (minhash banding, simhash radius,
  * Jaccard threshold, quality-gate knobs): each curve must stay anchored to
  * the already-verified operator it sweeps (same machinery ⇒ identical
  * numbers at the production point) and monotone wherever the construction
  * guarantees monotonicity — a curve that crosses its own anchor or bends
  * the wrong way is measuring something other than the knob.
  */
class TuningCurveSpec extends SparkSpec {

  private def run(n: String) = SparkEntry.queries(n)(spark, sf)

  test("minhash_band_curve: truth anchored to ngram_jaccard, nested bandings monotone") {
    val rows = run("minhash_band_curve").collect()
    assert(rows.length === 5)
    val truthCount = run("ngram_jaccard").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_truth") === truthCount,
        "every sweep point measures against the same exact pair set")
      assert(r.getAs[Long]("n_both") <= r.getAs[Long]("n_candidate"))
      assert(r.getAs[Long]("n_both") <= r.getAs[Long]("n_truth"))
      val rec = r.getAs[Double]("pair_recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // a band of r rows is a union of consecutive r'-row bands when r' | r,
    // so a coarser band match implies every finer sub-band matches too:
    // candidate sets (and with them hits) are nested along divisibility
    // chains — 2 | 4 | 12 and 3 | 6 | 12
    val byR = rows.map(r => r.getAs[Int]("rows_per_band") -> r).toMap
    def cand(r: Int) = byR(r).getAs[Long]("n_candidate")
    def hits(r: Int) = byR(r).getAs[Long]("n_both")
    Seq(Seq(2, 4, 12), Seq(3, 6, 12)).foreach { chain =>
      chain.sliding(2).foreach { case Seq(fine, coarse) =>
        assert(cand(fine) >= cand(coarse),
          s"candidates must be nested along r=$fine | r=$coarse")
        assert(hits(fine) >= hits(coarse),
          s"hits must be nested along r=$fine | r=$coarse")
      }
    }
  }

  test("simhash_radius_curve: radius-3 point equals dedup_eval, monotone in radius") {
    val rows = run("simhash_radius_curve").collect().sortBy(_.getAs[Int]("radius"))
    assert(rows.length === 4)
    val eval3 = run("dedup_eval").collect().head
    val r3 = rows.last
    assert(r3.getAs[Int]("radius") === 3)
    Seq("n_truth", "n_candidate", "n_both").foreach { c =>
      assert(r3.getAs[Long](c) === eval3.getAs[Long](c),
        s"the radius-3 sweep point must equal dedup_eval's fixed-radius row ($c)")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_candidate") <= b.getAs[Long]("n_candidate"),
        "hamming <= r sets are nested in r")
      assert(a.getAs[Long]("n_both") <= b.getAs[Long]("n_both"))
    }
  }

  test("dedup_threshold_curve: 0.8 point equals ngram_jaccard, keep-rate monotone") {
    val rows = run("dedup_threshold_curve").collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.length === 5)
    val jaccardPairs = run("ngram_jaccard").count()
    val at08 = rows.find(_.getAs[Double]("threshold") == 0.8).get
    assert(at08.getAs[Long]("n_pairs") === jaccardPairs,
      "the production-threshold point must equal the verified pair operator")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped")
        === r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_pairs"),
        "each dropped doc accounts for at least one pair (it is some pair's d2)")
    }
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_pairs") >= hi.getAs[Long]("n_pairs"),
        "raising the threshold can only shrink the pair set")
      assert(lo.getAs[Double]("keep_rate") <= hi.getAs[Double]("keep_rate"),
        "raising the threshold can only keep more docs")
    }
  }

  test("contamination_threshold_curve: zero point equals decontaminate's flag, monotone") {
    val rows = run("contamination_threshold_curve").collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.length === 5)
    val flagged = run("decontaminate")
      .filter(org.apache.spark.sql.functions.col("contaminated")).count()
    val at0 = rows.head
    assert(at0.getAs[Double]("threshold") === 0.0)
    assert(at0.getAs[Long]("n_flagged") === flagged,
      "score > 0 is exactly the boolean contamination flag")
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_flagged") >= hi.getAs[Long]("n_flagged"),
        "raising the cut can only flag fewer docs")
      assert(lo.getAs[Long]("flagged_ngrams") >= hi.getAs[Long]("flagged_ngrams"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
    }
  }

  test("lsh_bands_curve: truth anchored to knn_bruteforce, nested along aligned splits") {
    val rows = run("lsh_bands_curve").collect()
    assert(rows.length === 4)
    val truthCount = run("knn_bruteforce").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_truth") === truthCount,
        "every scheme measures against the same exact top-5 set")
      val rec = r.getAs[Double]("recall_at_5")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
    }
    // an r'-bit band is a union of aligned r-bit bands when r | r' (all
    // bands start at bit 0), so coarse-band candidate sets are nested in
    // the fine ones along 4 | 8, 4 | 12 and 6 | 12
    val byR = rows.map(r => r.getAs[Int]("rows_per_band") -> r).toMap
    def cand(r: Int) = byR(r).getAs[Long]("n_candidates")
    def hits(r: Int) = byR(r).getAs[Long]("n_hit")
    Seq((4, 8), (4, 12), (6, 12)).foreach { case (fine, coarse) =>
      assert(cand(fine) >= cand(coarse),
        s"candidates must be nested along r=$fine | r=$coarse")
      assert(hits(fine) >= hits(coarse),
        s"hits must be nested along r=$fine | r=$coarse")
    }
  }

  test("bpe_budget_curve: endpoints anchored to the char split and bpe_encode") {
    import org.apache.spark.sql.functions._
    val rows = run("bpe_budget_curve").collect().sortBy(_.getAs[Int]("n_merges"))
    assert(rows.map(_.getAs[Int]("n_merges")).toSeq === Seq(0, 2, 4, 8))
    val enc = run("bpe_encode")
    val a = enc.agg(
      sum(col("freq") * col("n_tokens")).as("t"),
      sum(col("freq")).as("w"),
      count(lit(1)).as("v"),
      sum(col("freq") * (length(col("word")) + 1)).as("c")).collect().head
    val at8 = rows.last
    assert(at8.getAs[Long]("n_bpe_tokens") === a.getAs[Long]("t"),
      "the 8-merge point IS bpe_encode's final state")
    assert(at8.getAs[Long]("n_words") === a.getAs[Long]("w"))
    assert(at8.getAs[Long]("vocab_words") === a.getAs[Long]("v"))
    assert(rows.head.getAs[Long]("n_bpe_tokens") === a.getAs[Long]("c"),
      "budget 0 is the char-split baseline: every word costs len+1 symbols")
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_bpe_tokens") > hi.getAs[Long]("n_bpe_tokens"),
        "every applied merge strictly shrinks the encoded corpus")
      assert(lo.getAs[Long]("vocab_words") === hi.getAs[Long]("vocab_words"),
        "the word inventory never changes — only its encoding")
    }
  }

  test("session_gap_curve: 30-minute point equals events_sessionize, monotone in gap") {
    val rows = run("session_gap_curve").collect().sortBy(_.getAs[Long]("gap_us"))
    assert(rows.length === 5)
    val sessions30 = run("events_sessionize").count()
    val at30 = rows.find(_.getAs[Long]("gap_us") == 30L * 60 * 1000000).get
    assert(at30.getAs[Long]("n_sessions") === sessions30,
      "the production-gap point counts exactly the sessionize output's sessions")
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_sessions") >= hi.getAs[Long]("n_sessions"),
        "a wider gap can only merge sessions")
      assert(lo.getAs[Long]("in_session_us") <= hi.getAs[Long]("in_session_us"),
        "a wider gap can only keep more deltas in-session")
      assert(lo.getAs[Long]("n_events") === hi.getAs[Long]("n_events"))
    }
  }

  test("quality_threshold_curve: production anchors equal quality_filter, knobs monotone") {
    val rows = run("quality_threshold_curve").collect()
    assert(rows.length === 10)
    val gateKeep = run("quality_filter")
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    def half(k: String): Array[Row] =
      rows.filter(_.getAs[String]("knob") == k)
        .sortBy(_.getAs[Double]("threshold"))
    val mw = half("min_words")
    val dr = half("max_dup_ratio")
    assert(mw.length === 5 && dr.length === 5)
    assert(mw.find(_.getAs[Double]("threshold") == 20.0).get
      .getAs[Long]("n_kept") === gateKeep,
      "the (min_words, 20) point IS the production gate")
    assert(dr.find(_.getAs[Double]("threshold") == 0.65).get
      .getAs[Long]("n_kept") === gateKeep,
      "the (max_dup_ratio, 0.65) point IS the production gate")
    mw.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_kept") >= hi.getAs[Long]("n_kept"),
        "a stricter min_words can only drop more docs")
    }
    dr.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_kept") <= hi.getAs[Long]("n_kept"),
        "a looser dup-ratio cap can only keep more docs")
    }
    val corpus = graft.sources.Tables.documents(spark, sf).count()
    rows.foreach(r => assert(r.getAs[Long]("n_docs") === corpus,
      "every sweep point sees the whole corpus"))
  }
}
