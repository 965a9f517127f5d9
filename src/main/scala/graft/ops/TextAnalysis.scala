package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators for LLM training-data pipelines: language
  * ID, quality scoring, token counting, document fingerprinting.
  *
  * All operators are pure per-row expression pipelines (higher-order array
  * functions, no UDFs, no shuffle) — at 100 TB they run scan-speed,
  * map-side-only, inside whole-stage codegen.
  */
object TextAnalysis {

  /** Canonical tokenization shared by every text operator (and mirrored
    * verbatim in the DuckDB oracles): lowercase, trim, split on single
    * spaces. */
  def tokens(text: Column): Column = split(lower(trim(text)), " ")

  /** Per-language stopword marker lists for the n-gram/stopword language-ID
    * heuristic. Tiny by design — the heuristic is the operator; swapping in
    * real per-language lexicons is a data change, not a code change. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "en", "du", "les"),
    "de" -> Seq("der", "die", "das", "und", "ein", "zu", "von", "mit"))

  private def stopHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Language ID by stopword-hit scoring: per-language hit counts over the
    * token stream, argmax with a fixed de<en<es<fr precedence on ties and
    * 'unknown' when nothing hits. One projection, zero shuffles. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = docs.select(
      col("doc_id"),
      stopHits(toks, stopwords("en")).as("en_score"),
      stopHits(toks, stopwords("es")).as("es_score"),
      stopHits(toks, stopwords("fr")).as("fr_score"),
      stopHits(toks, stopwords("de")).as("de_score"))
    scored.withColumn("predicted_lang",
      when(greatest(col("en_score"), col("es_score"), col("fr_score"), col("de_score")) === 0, "unknown")
        .when(col("de_score") >= col("en_score") && col("de_score") >= col("es_score") &&
              col("de_score") >= col("fr_score"), "de")
        .when(col("en_score") >= col("es_score") && col("en_score") >= col("fr_score"), "en")
        .when(col("es_score") >= col("fr_score"), "es")
        .otherwise("fr"))
  }

  /** Confusion matrix of [[langId]]'s heuristic against the corpus's
    * stored `lang` label — the calibration read-out run before trusting
    * the heuristic as a routing/filter signal: one row per (lang,
    * predicted_lang) cell with the count and the cell's fraction of its
    * TRUE-label row (the per-language recall on the diagonal). The matrix
    * is |langs|²-sized; the corpus contributes one hash aggregate over
    * (doc_id → two small columns), and the per-row fraction is a window
    * over the tiny matrix, never the corpus. Long/long IEEE division —
    * oracle-hashed like [[graft.queries.DocQueries]]'s other metrics. */
  def langConfusion(docs: DataFrame): DataFrame = {
    val cells = docs.select(col("doc_id"), col("lang"))
      .join(langId(docs).select(col("doc_id"), col("predicted_lang")), "doc_id")
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
    cells.select(col("lang"), col("predicted_lang"), col("n"),
      (col("n") / sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
        .as("frac_of_lang"))
  }

  /** Quality scores: length, word count, punctuation ratio, stopword ratio,
    * mean word length. Per-row double arithmetic (IEEE-deterministic, matches
    * the oracle bit-for-bit).
    *
    * Shape: explode tokens + one hash-aggregate per doc. The per-row
    * higher-order formulation (`filter(toks, isin)` + `aggregate`) is
    * CodegenFallback — every token paid an interpreted 31-way isin walk;
    * exploded, the stopword test compiles to an InSet hash probe and the
    * whole pipeline stays in whole-stage codegen. Char-level metrics are
    * computed once per doc BEFORE the explode and carried through. */
  def quality(docs: DataFrame): DataFrame = {
    val allStops = stopwords.values.flatten.toSeq.distinct
    docs.select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).as("n_punct"),
        col("text"))
      // explode in a SEPARATE projection: an expression selected alongside a
      // generator is placed in the Project above the Generate and re-runs
      // per exploded row — the regexp would execute once per token
      .select(col("doc_id"), col("n_chars"), col("n_punct"),
        explode(tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"))
      .agg(first(col("n_chars")).as("n_chars"),
           first(col("n_punct")).as("n_punct"),
           count(lit(1)).as("n_words"),
           sum(when(col("t").isin(allStops: _*), 1L).otherwise(0L)).as("n_stop"),
           sum(length(col("t"))).as("sum_word_len"))
      .select(col("doc_id"), col("n_chars"),
        col("n_words").cast("int").as("n_words"),
        (col("n_punct").cast("double") / col("n_chars")).as("punct_ratio"),
        (col("n_stop").cast("double") / col("n_words")).as("stopword_ratio"),
        (col("sum_word_len").cast("double") / col("n_words")).as("mean_word_len"))
  }

  /** Repetition-based quality signals (the Gopher-style filters a
    * training-data pipeline runs to drop degenerate/templated text):
    * duplicate-word fraction (1 - distinct/total) and the frequency share
    * of the single most repeated word bigram. Explode + lead windows + two
    * hash aggregates — all codegen, shuffles keyed on doc_id only. */
  def repetition(docs: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val ex = docs.select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "t")
      .select(col("doc_id"), col("pos"), col("t"),
        concat_ws(" ", col("t"), lead(col("t"), 1).over(byDoc)).as("bg"),
        lead(col("t"), 1).over(byDoc).isNotNull.as("has_bg"))
    val words = ex.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           countDistinct(col("t")).as("n_distinct"))
    val topBigram = ex.filter(col("has_bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bigram_count"), sum(col("c")).as("n_bigrams"))
    words.join(topBigram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
          .as("dup_word_ratio"),
        (col("top_bigram_count").cast("double") / col("n_bigrams"))
          .as("top_bigram_ratio"))
  }

  /** Token counts: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs | digit runs | single non-alnum marks). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .as("bpe_tokens"))

  /** Winnowing-style document fingerprints (Schleimer et al., MOSS), exploded
    * to (doc_id, fp_hash) rows: hash every k-word shingle, slide a window of
    * `w` hashes, keep each window's minimum — the distinct minima are the
    * fingerprint. Guarantees any match of length >= w+k-1 words shares a
    * fingerprint hash. Docs shorter than k words have no shingles and emit
    * no rows.
    *
    * Shape: explode tokens once, build shingles with `lead` and take window
    * minima with `min over (rows current..w-1 following)` — one doc_id
    * shuffle feeding chained window frames, every hash computed exactly
    * once by a codegen'd expression. (The per-row array formulation is a
    * trap: nested `transform`/`slice` lambdas re-evaluate the inlined hash
    * array per window after project collapse — O(m²) interpreted hashing.)
    *
    * @param shingleHash hash expression per shingle string. Default is
    *                    xxhash64 (fastest); pass e.g.
    *                    `c => md5(c.cast("binary"))` for a hash any engine
    *                    can recompute (fixed-width hex strings order
    *                    lexicographically = numerically, so window minima
    *                    are engine-independent).
    */
  def fingerprintHashes(docs: DataFrame, k: Int = 3, w: Int = 4,
                        shingleHash: Column => Column = xxhash64(_)): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val sh = docs.select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "t")
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", (0 until k).map(j => lead(col("t"), j).over(byDoc)): _*).as("g"),
        lead(col("t"), k - 1).over(byDoc).isNotNull.as("full"))
      .filter(col("full"))
      .select(col("doc_id"), col("pos"), shingleHash(col("g")).as("h"))
    val winMin = byDoc.rowsBetween(Window.currentRow, w - 1)
    sh
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("wmin", min(col("h")).over(winMin))
      // full windows only (start pos <= m-w); if the doc has fewer than w
      // shingles, the single window anchored at its first shingle covers all
      .filter(col("pos") + w <= col("m") ||
              (col("m") < w && col("pos") === 0))
      .select(col("doc_id"), col("wmin").as("fp_hash"))
      .distinct()
  }

  /** Per-doc fingerprint arrays (sorted, distinct) over [[fingerprintHashes]]
    * — the collected form for set-intersection use. */
  def fingerprint(docs: DataFrame, k: Int = 3, w: Int = 4,
                  shingleHash: Column => Column = xxhash64(_)): DataFrame =
    fingerprintHashes(docs, k, w, shingleHash)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("fp_hash"))).as("fingerprint"),
           count(lit(1)).as("n_hashes"))

  /** Composite quality gate — the decision layer a training-data pipeline
    * runs over the per-doc signals: keep/drop plus the FIRST failing rule
    * as a reason (reasons make filter-rate dashboards and ablations
    * possible; a bare boolean does not). Composes the langId, quality and
    * repetition operators by doc_id joins — each signal pass prunes its
    * scan to (doc_id, text) and shuffles on doc_id only; a pipeline
    * computing many signal families would cache the exploded-token frame
    * they share. */
  def qualityFilter(docs: DataFrame, minWords: Int = 20,
                    maxDupWordRatio: Double = 0.65): DataFrame = {
    val lang = langId(docs).select(col("doc_id"), col("predicted_lang"))
    val qual = quality(docs).select(col("doc_id"), col("n_words"))
    val rep = repetition(docs).select(col("doc_id"), col("dup_word_ratio"))
    qual.join(lang, "doc_id").join(rep, "doc_id")
      .select(col("doc_id"), col("predicted_lang"), col("n_words"),
        col("dup_word_ratio"),
        when(col("predicted_lang") === "unknown", "lang")
          .when(col("n_words") < minWords, "too_short")
          .when(col("dup_word_ratio") > maxDupWordRatio, "repetition")
          .otherwise("ok").as("reason"),
        (col("predicted_lang") =!= "unknown" &&
          col("n_words") >= minWords &&
          col("dup_word_ratio") <= maxDupWordRatio).as("keep"))
  }

  /** TF-IDF-style top terms per document — the keyword-extraction pass
    * behind corpus tagging, topic routing, and quality heuristics. One
    * token explode feeds BOTH aggregates (per-doc tf, corpus df); the tiny
    * df/N side joins back by term. The rarity weight is the RATIONAL
    * (N+1)/(df+1) rather than its log: monotone-identical ranking per term,
    * and tf·(N+1) is integer-valued in a double, so one IEEE division is
    * the only rounding — bit-identical across engines, where `ln` differs
    * in the last ulp between libm implementations and flips near-tie ranks.
    * Top `k` per doc by (score desc, term asc) — fully deterministic. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val ex = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = ex.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df DERIVES from tf (each tf row is one distinct (doc, term)), so the
    // corpus is scanned and tokenized exactly once — a separate
    // ex.groupBy(term) branch would re-run the whole explode (different
    // output partitioning, no exchange reuse)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf
      .join(df, "term")
      .join(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * (col("n_docs") + 1) / (col("df") + 1)).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf").cast("long").as("tf"),
              col("df").cast("long").as("df"), col("score"))
  }

  /** BM25 relevance of every document against a small query term set — the
    * standard retrieval scorer (Robertson/Spärck Jones; k1 saturates term
    * frequency, b normalizes by document length), used in training-data
    * pipelines to mine corpus slices relevant to a reference set. The IDF
    * is kept RATIONAL ((N − df + ½)/(df + ½) + 1, no log) for the
    * [[tfidfTopTerms]] reason: log is monotone per term, and the rational
    * form is bit-identical across engines (the classic log form differs in
    * the last ulp and flips near-tie ranks). Deviation from textbook BM25
    * is the dropped log only — df-monotonicity and the tf/length scaling
    * are exactly BM25's.
    *
    * Plan shape: ONE tokenize/explode builds the (doc, token) count table;
    * document lengths, term frequencies and document frequencies all
    * DERIVE from it (dl = per-doc sum, df = per-term row count — each tf
    * row is one distinct (doc, term)), so the corpus is scanned and
    * tokenized once via exchange reuse — the [[tfidfTopTerms]] shape. The
    * per-term df table and the 1-row (N, avgdl) stats broadcast; per-term
    * scores sum in exact decimal (order-free) and the final top-k is a
    * TakeOrdered — no full-corpus sort. */
  def bm25Rank(docs: DataFrame, queryTerms: Seq[String],
               k1: Double = 1.2, b: Double = 0.75, k: Int = 50): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    val tfAll = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
    val dl = tfAll.groupBy(col("doc_id")).agg(sum(col("cnt")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl").cast(dec)).cast("double") / count(col("dl"))).as("avgdl"))
    val tf = tfAll.filter(col("tok").isin(queryTerms.map(lit): _*))
      .select(col("doc_id"), col("tok"), col("cnt").cast("double").as("tf"))
    val df = tf.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)
    val tfScale = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl"))))
    tf.join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .join(broadcast(stats))
      .select(col("doc_id"), (idf * tfScale).as("term_score"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score").cast(dec)).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Bigram association strength for vocabulary/merge-rule building — the
    * PMI ratio p(xy)/(p(x)p(y)) = n_xy·N / (n_x·n_y), kept as the RATIONAL
    * (not its log) for the same reason as [[tfidfTopTerms]]: log is
    * monotone, so ranking by the ratio ranks by PMI, and the ratio is two
    * IEEE multiplies and one divide — bit-identical across engines, where
    * libm `ln` differs in the last ulp and flips near-tie ranks. Computed
    * in double (not int64 products) because n_xy·N overflows 64 bits at
    * corpus scale.
    *
    * Plan shape: one tokenize/explode feeds both the bigram counts (lead
    * window per doc — pairs never span documents) and the unigram counts;
    * the `minCount` filter drops the hapax tail BEFORE the joins, so the
    * two vocabulary joins see only frequent pairs; the 1-row total
    * broadcasts. */
  def bigramPmi(docs: DataFrame, minCount: Long = 5, k: Int = 50): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = docs.select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "t")
    val uni = toks.groupBy(col("t").as("w")).agg(count(lit(1)).as("n_w"))
    val total = uni.agg(sum(col("n_w")).as("n_total"))
    val pairs = toks
      .select(col("t").as("w1"), lead(col("t"), 1).over(byDoc).as("w2"))
      .filter(col("w2").isNotNull)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_y")), "w2")
      .join(broadcast(total))
      .select(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"),
        ((col("n_xy").cast("double") * col("n_total")) /
         (col("n_x").cast("double") * col("n_y"))).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Concat-and-chunk sequence packing — the pretraining batch layout:
    * within each shard, documents are laid end-to-end in deterministic
    * doc_id order and the token stream is cut into fixed `ctxLen` windows
    * (the GPT-style packing that wastes zero tokens to padding). Per doc:
    * its first token's offset in the shard stream (`tok_start`), the chunk
    * it starts in (`seq_id`), its offset inside that chunk, and whether it
    * crosses a chunk boundary (split docs are where downstream writers
    * reset the attention mask).
    *
    * Packing is PER SHARD on purpose: shards pack independently and in
    * parallel (one cumsum window per shard partition), exactly how real
    * pipelines pack per output file — a single corpus-wide ordering would
    * serialize the cumulative sum onto one reducer at 100 TB. Token counts
    * here are whitespace tokens; swap the counter column for real tokenizer
    * counts without touching the layout logic. */
  def packSequences(docs: DataFrame, ctxLen: Int,
                    shardCol: String = "source"): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive: $ctxLen")
    val before = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col(shardCol).as("shard"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"))
      .withColumn("tok_start",
        coalesce(sum(col("n_tokens")).over(before), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("tok_start"),
        floor(col("tok_start") / ctxLen).cast("long").as("seq_id"),
        pmod(col("tok_start"), lit(ctxLen.toLong)).cast("int").as("seq_offset"),
        (floor((col("tok_start") + col("n_tokens") - 1) / ctxLen) >
          floor(col("tok_start") / ctxLen)).as("spans_boundary"))
  }

  /** Per-source quality gate rollup over [[qualityFilter]] — the
    * filter-rate dashboard sliced the way curation decisions are made:
    * for each source, docs seen/kept, the keep rate, and the count per
    * drop reason (first-fail attribution, same as the per-doc gate). A
    * source whose keep rate collapses or whose drop mix shifts is the
    * re-crawl / re-extract signal. One |sources|-sized aggregate over
    * the gate frame; integer counts, one IEEE division. */
  def qualityBySource(docs: DataFrame, minWords: Int = 20,
                      maxDupWordRatio: Double = 0.65): DataFrame =
    qualityFilter(docs, minWords, maxDupWordRatio)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("reason") === "lang", 1L).otherwise(0L)).as("n_lang"),
        sum(when(col("reason") === "too_short", 1L).otherwise(0L)).as("n_too_short"),
        sum(when(col("reason") === "repetition", 1L).otherwise(0L)).as("n_repetition"))
      .withColumn("keep_rate",
        col("n_kept").cast("double") / col("n_docs"))
      .orderBy(col("source"))

  /** Vocabulary-growth curve (Heaps'-law frontier): the corpus in doc_id
    * order sliced into `bucketWidth`-doc buckets (the corpus_drift
    * arrival stand-in — swap for an ingest-batch column in production),
    * and per bucket the doc/token volume, the NEW types (distinct tokens
    * whose global first occurrence lands in the bucket), and the
    * cumulative vocabulary and token totals. The read: a vocab_size
    * curve that keeps climbing against cum_tokens says the corpus is
    * still adding language; a flattening curve says new data is
    * lexically redundant — the "keep crawling vs start training" signal,
    * corpus-level where [[graft.ops.Dedup.noveltyBySource]] is
    * per-source. Types reduce map-side to xxhash64 of the token (the
    * dedup_exact collision contract; the oracle groups the strings —
    * hash≡string at these corpus sizes, the decontaminate precedent), so
    * the shuffle carries (hash, bucket) with a partial min; everything
    * past the per-hash min is |buckets|-sized, the cumulative window a
    * single-partition pass over that tiny frame. Empty tokens (double
    * spaces) are excluded in both engines. doc_id is non-negative so
    * Spark's truncating `div` ≡ DuckDB's flooring `//`. */
  def vocabGrowth(docs: DataFrame, bucketWidth: Long = 64): DataFrame = {
    val bucket = expr(s"doc_id div $bucketWidth").as("bucket")
    val toks = docs
      .select(bucket, explode(tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("bucket"), xxhash64(col("tok")).as("h"))
    val vol = toks.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
    val newTypes = toks.groupBy(col("h")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
    val nd = docs.select(bucket).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    vocabCurve(nd, vol, newTypes)
  }

  /** The curve's serve tail, shared verbatim by [[vocabGrowth]] and the
    * standing-index read ([[vocabGrowthFromIndex]]) so the incremental
    * identity holds by construction: join the per-bucket doc/token
    * volumes with the first-occurrence type counts and run the two
    * cumulative windows over the |buckets|-sized frame. */
  private def vocabCurve(nDocs: DataFrame, vol: DataFrame,
                         newTypes: DataFrame): DataFrame = {
    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nDocs
      .join(vol, Seq("bucket"), "left")
      .join(newTypes, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("vocab_size", sum(col("new_types")).over(cum))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(cum))
      .orderBy(col("bucket"))
  }

  /** Standing vocabulary index — [[vocabGrowth]]'s write/append/serve
    * lifecycle, so the frontier curve is servable after every ingest
    * batch WITHOUT rescanning history (the gram-df posture). Two
    * hash-/key-clustered tables under `dir`:
    *
    *  - `types`: per batch, each distinct token hash with the MINIMUM
    *    bucket the batch saw it in. The reader takes the per-hash min
    *    across all rows — min is idempotent AND order-free, so blind
    *    re-appends and out-of-order batches perturb NOTHING on this half
    *    (the source_overlap census posture, via min instead of set
    *    union).
    *  - `vol`: per batch, per-bucket doc/token count partials — additive
    *    across DISJOINT batches (each doc arrives once). Engine retries
    *    should replace their partition (StateSink-style); source-level
    *    redelivery double-counts volumes (the gram-df caveat) while
    *    leaving the type half untouched.
    *
    * Served after any batches covering the corpus, the curve equals the
    * batch [[vocabGrowth]] bit for bit (counts are longs; the windows
    * replay identically) — the registry entry reuses the batch oracle
    * verbatim, and batch splits need NOT align with bucket boundaries
    * (everything the reader does is a sum or a min). */
  def writeVocabIndex(docs: DataFrame, dir: String,
                      bucketWidth: Long = 64): Unit = {
    vocabPartials(docs, bucketWidth, s"$dir", overwrite = true)
  }

  /** Blind-append an arrival batch's partials to the standing vocabulary
    * index (see [[writeVocabIndex]] for the replay contract). */
  def appendVocabIndex(docs: DataFrame, dir: String,
                       bucketWidth: Long = 64): Unit = {
    vocabPartials(docs, bucketWidth, s"$dir", overwrite = false)
  }

  private def vocabPartials(docs: DataFrame, bucketWidth: Long, dir: String,
                            overwrite: Boolean): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    val bucket = expr(s"doc_id div $bucketWidth").as("bucket")
    val toks = docs
      .select(bucket, explode(tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("bucket"), xxhash64(col("tok")).as("h"))
    toks.groupBy(col("h")).agg(min(col("bucket")).as("bucket"))
      .repartition(col("h")).sortWithinPartitions(col("h"))
      .write.mode(mode).parquet(s"$dir/types")
    toks.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
      .join(docs.select(bucket).groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs")),
        Seq("bucket"), "full")
      .select(col("bucket"), coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .repartition(col("bucket")).sortWithinPartitions(col("bucket"))
      .write.mode(mode).parquet(s"$dir/vol")
  }

  /** Serve the vocabulary-growth curve from the standing index — one
    * hash-only co-scan of the two partial tables, never the corpus text;
    * equals the batch [[vocabGrowth]] over everything absorbed. */
  def vocabGrowthFromIndex(spark: org.apache.spark.sql.SparkSession,
                           dir: String): DataFrame = {
    val types = spark.read.parquet(s"$dir/types")
      .groupBy(col("h")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
    val volAll = spark.read.parquet(s"$dir/vol").groupBy(col("bucket"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    vocabCurve(volAll.select(col("bucket"), col("n_docs")),
      volAll.select(col("bucket"), col("n_tokens")), types)
  }

  /** Packing-efficiency report over [[packSequences]]' concat-and-chunk
    * layout — the number a training run actually watches: per shard, how
    * many ctxLen sequences the token stream fills, how much tail padding
    * the final partial sequence wastes, and how many documents straddle
    * a sequence boundary (the attention-mask break cost for trainers
    * that do not cross-attend chunks). Pure rollup of the packing frame
    * — one |shards|-sized aggregate over the same single window pass;
    * integer arithmetic throughout, one IEEE division for the
    * efficiency. All quantities are non-negative, so truncating and
    * flooring division agree across engines. */
  def packingEfficiency(docs: DataFrame, ctxLen: Int,
                        shardCol: String = "source"): DataFrame = {
    val packed = packSequences(docs, ctxLen, shardCol)
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("spans_boundary"), 1L).otherwise(0L)).as("n_boundary_docs"))
      .withColumn("n_sequences",
        expr(s"(total_tokens + ${ctxLen - 1}) div $ctxLen"))
      .withColumn("padding_tokens",
        col("n_sequences") * ctxLen - col("total_tokens"))
      .withColumn("efficiency",
        col("total_tokens").cast("double") / (col("n_sequences") * ctxLen))
      .orderBy(col("shard"))
  }

  /** PII patterns shared by the Spark plan and the DuckDB oracle. Kept to
    * the regex subset with identical semantics in java.util.regex and RE2
    * (no backreferences/lookaround; `\b` is ASCII word boundary in both).
    * Application order matters at the margins: a dotted quad inside an
    * email's local part matches the IP pattern too, so counts are taken on
    * the PROGRESSIVELY redacted text (class i counted after classes 1..i-1
    * replaced) — counts then always agree with what the redacted output
    * shows. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "ip"    -> """\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b""",
    "phone" -> """\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b""")

  /** PII scrub — the redaction pass a training-data pipeline runs before
    * anything else sees the text: per-doc match counts for each PII class
    * plus the redacted text (matches replaced by `<CLASS>` placeholders).
    * Each class is counted on the text with the PRIOR classes already
    * redacted, so n_X is exactly the number of `<X>` placeholders in the
    * output. Pure per-row regex expressions: codegen'd, no shuffle,
    * scan-speed. The registry variant returns md5(redacted) instead of the
    * full text so the oracle compare stays compact. */
  def piiRedact(docs: DataFrame): DataFrame = {
    // stages(i) = text after the first i patterns are applied
    val stages = piiPatterns.scanLeft(col("text")) { case (acc, (name, re)) =>
      regexp_replace(acc, re, s"<${name.toUpperCase}>")
    }
    val counts = piiPatterns.zipWithIndex.map { case ((name, re), i) =>
      size(regexp_extract_all(stages(i), lit(re), lit(0))).as(s"n_${name}s")
    }
    docs.select(col("doc_id") +: counts :+ stages.last.as("redacted_text"): _*)
  }

  /** CCNet-style per-language length terciles: each document lands in the
    * head (longest third), middle, or tail of ITS language's length
    * distribution — the bucketing CCNet uses to rank web text by quality
    * proxy before sampling (head-heavy mixes train better).
    *
    * Two passes, both scale-safe: (1) a per-language aggregate computes the
    * exact interpolated 1/3 and 2/3 length percentiles — `percentile`'s
    * buffer is a count-map over DISTINCT values, and document lengths have
    * bounded cardinality (≤ max doc bytes), so the buffer stays small no
    * matter how many rows; for unbounded metrics swap in approx_percentile.
    * (2) the tiny (one row per language) threshold table broadcast-joins
    * back onto the corpus and bucket assignment is a map-side CASE — the
    * corpus itself never shuffles.
    *
    * Thresholds are interpolated doubles; both probability arguments are
    * single IEEE divisions (1.0/3, 2.0/3) so any engine reproduces the
    * exact thresholds and therefore the exact bucket membership. */
  def lengthBuckets(docs: DataFrame,
                    lenCol: String = "n_chars"): DataFrame = {
    val thresholds = docs
      .groupBy(col("lang"))
      .agg(percentile(col(lenCol).cast("double"), lit(1.0 / 3)).as("t1"),
           percentile(col(lenCol).cast("double"), lit(2.0 / 3)).as("t2"))
    docs.select(col("doc_id"), col("lang"), col(lenCol))
      .join(broadcast(thresholds), "lang")
      .select(col("doc_id"), col("lang"), col(lenCol), col("t1"), col("t2"),
        when(col(lenCol) <= col("t1"), "tail")
          .when(col(lenCol) <= col("t2"), "middle")
          .otherwise("head").as("bucket"))
  }

  /** One greedy left-to-right non-overlapping BPE merge pass over a symbol
    * array: every adjacent (a, b) becomes the single symbol a+b, scanning
    * left to right, a merged symbol never re-used as the LEFT of another
    * merge in the same pass (so [a,a,a] with rule (a,a) → [aa, a] — the
    * Sennrich et al. 2016 semantics). Expressed as a codegen'd
    * `aggregate` fold with state (accumulated symbols, one pending
    * lookbehind symbol) — per-row, map-side, no explode/window/shuffle. */
  private[graft] def bpeMergePass(syms: Column, a: String, b: String): Column = {
    val nullStr = lit(null).cast("string")
    aggregate(
      syms,
      struct(array().cast("array<string>").as("acc"), nullStr.as("pend")),
      (st, s) => {
        val acc = st.getField("acc")
        val pend = st.getField("pend")
        when(pend.isNull, struct(acc.as("acc"), s.as("pend")))
          .when(pend === lit(a) && s === lit(b),
            struct(concat(acc, array(lit(a + b))).as("acc"), nullStr.as("pend")))
          .otherwise(struct(concat(acc, array(pend)).as("acc"), s.as("pend")))
      },
      st => when(st.getField("pend").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("pend")))))
  }

  /** Full BPE tokenizer-training loop (Sennrich et al. 2016, "Neural
    * Machine Translation of Rare Words with Subword Units" — public
    * literature): `nMerges` deterministic rounds of [count all adjacent
    * symbol pairs weighted by word frequency → take the argmax pair
    * (count DESC, then lexicographic (left, right) tie-break) → apply the
    * merge greedily left-to-right in every word → repeat]. Returns the
    * learned merge table (merge_rank, left_sym, right_sym, pair_count) —
    * the artifact a tokenizer ships.
    *
    * Scale shape — the reason real BPE trainers are feasible at all: the
    * corpus collapses to its WORD HISTOGRAM first (one groupBy — the only
    * corpus-sized shuffle), and every round after that works on
    * vocabulary-sized data: pair counting is an explode + hash aggregate
    * with map-side partials over (pairs-per-word × vocab) rows, the argmax
    * is a tiny take(1), and the merge pass is the per-row codegen'd
    * [[bpeMergePass]] fold with NO shuffle at all. Each round's state is
    * eagerly checkpointed and the previous round released
    * ([[Checkpoints]]) — the [[Graph.pageRank]] posture — so lineage and
    * executor storage stay bounded for any merge count.
    *
    * Training is restricted to ASCII-alphanumeric words (the classic
    * pre-normalization), which also pins character-splitting semantics
    * cross-engine (Java regex splits code units, DuckDB code points — the
    * two only agree on ASCII). Words carry the standard `</w>` end-of-word
    * sentinel so merges can capture suffixes. Determinism end to end:
    * integer pair counts, total-ordered argmax, order-free merge pass —
    * any engine (and any partitioning) reproduces the identical merge
    * table, which is what the unrolled-CTE DuckDB oracle checks. */
  def bpeTrain(docs: DataFrame, nMerges: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, vocab) = bpeTrainState(docs, nMerges)
    Checkpoints.unpersist(vocab)
    merges.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .orderBy("merge_rank")
  }

  /** The corpus vocabulary ENCODED with the learned merges — the other
    * half of a tokenizer (train produces the merge table; encode is what
    * every downstream job runs). Training already carries the vocabulary
    * through every merge pass, so the encoded form IS the final training
    * state: one row per word with its frequency, post-merge token count
    * and the encoded symbol string. Encoding an unseen corpus is the same
    * [[bpeMergePass]] chain applied in merge-rank order — per-row,
    * codegen'd, shuffle-free — against a broadcast merge list. */
  def bpeEncode(docs: DataFrame, nMerges: Int = 8): DataFrame = {
    val (_, vocab) = bpeTrainState(docs, nMerges)
    vocab.select(col("w").as("word"), col("freq"),
        size(col("syms")).as("n_tokens"),
        concat_ws(" ", col("syms")).as("encoded"))
      .orderBy("word")
  }

  /** Tokenizer fertility by source — THE tokenizer-health metric a
    * pipeline tracks per corpus slice: BPE tokens per word (fertility;
    * 1.0 = every word is one token, higher = the tokenizer fragments
    * this slice) and characters per token (compression), over the
    * ASCII-alphanumeric vocabulary the trainer sees. A slice whose
    * fertility spikes is out-of-distribution for the tokenizer —
    * the signal that decides re-training or re-weighting.
    *
    * Shape: the corpus collapses to its word histogram once inside
    * [[bpeTrainState]] (the one corpus-sized shuffle) and per-(source,
    * word) counts are a second single shuffle; everything else is
    * vocabulary-sized — the encode state joins on the word key and three
    * integer sums roll up per source. Token counts include the `</w>`
    * sentinel exactly as [[bpeEncode]] publishes them. */
  def bpeFertility(docs: DataFrame, nMerges: Int = 8): DataFrame = {
    val (_, vocab) = bpeTrainState(docs, nMerges)
    val enc = vocab.select(col("w"), size(col("syms")).as("n_tokens"))
    docs.select(col("source"), explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
      .join(enc, Seq("w"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_tokens")).as("n_bpe_tokens"),
        sum(col("cnt") * length(col("w"))).as("n_chars"))
      .select(col("source"), col("n_words"), col("n_bpe_tokens"), col("n_chars"),
        (col("n_bpe_tokens").cast("double") / col("n_words")).as("fertility"),
        (col("n_chars").cast("double") / col("n_bpe_tokens")).as("chars_per_token"))
      .orderBy(col("source"))
  }

  /** Merge-budget tuning curve — the vocabulary-size read a tokenizer
    * design makes BEFORE committing a merge count: ONE training run to the
    * maximal budget, measured at each intermediate budget (merge tables
    * are prefix-closed — the first k merges of a longer run ARE the
    * k-budget tokenizer, so the sweep shares every training round). Per budget:
    * distinct words, corpus word/BPE-token counts, symbol-type count (the
    * vocabulary a budget ships) and fertility (BPE tokens per word — the
    * number that decides whether more merges still pay). Budget 0 is the
    * character-split baseline every curve needs as an anchor. Each point
    * costs two vocabulary-sized aggregates against the round's already
    * checkpointed state (the training loop's own collect-per-round
    * posture; nothing corpus-sized moves). */
  def bpeBudgetCurve(docs: DataFrame,
                     budgets: Seq[Int] = Seq(0, 2, 4, 8)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val want = budgets.toSet
    val stats =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long)]
    def record(nm: Int, vocab: DataFrame): Unit = {
      // coalesce: an empty vocabulary (corpus with no trainable words) sums
      // to NULL — the curve reports explicit zeros, not an unboxing crash
      val r = vocab.agg(count(lit(1)).as("vw"),
        coalesce(sum(col("freq")), lit(0L)).as("nw"),
        coalesce(sum(col("freq") * size(col("syms"))), lit(0L)).as("nt"))
        .collect()(0)
      val nsym = vocab.select(explode(col("syms")).as("s"))
        .agg(countDistinct(col("s"))).collect()(0).getLong(0)
      stats += ((nm, r.getAs[Long]("vw"), r.getAs[Long]("nw"),
        r.getAs[Long]("nt"), nsym))
    }
    def measure(nm: Int, vocab: DataFrame): Unit = if (want(nm)) record(nm, vocab)
    val (_, last) = bpeTrainState(docs, budgets.max, measure)
    // budgets past convergence: a k-budget tokenizer with k ≥ the total
    // applied merge count IS the converged tokenizer (prefix-closure's
    // other end), so every requested budget still gets its row — measured
    // from the fixed-point state the training stopped at. This matches the
    // SQL oracle, whose per-round CTEs degrade to the same fixed point once
    // merge pairs are exhausted (r16 ADVICE: the observe hook alone fires
    // only per APPLIED merge, so a corpus converging before the maximal
    // budget silently dropped the unreached rows).
    budgets.sorted.filterNot(b => stats.exists(_._1 == b))
      .foreach(b => record(b, last))
    Checkpoints.unpersist(last)
    stats.toSeq
      .toDF("n_merges", "vocab_words", "n_words", "n_bpe_tokens",
        "n_symbol_types")
      .select(col("n_merges"), col("vocab_words"), col("n_words"),
        col("n_bpe_tokens"), col("n_symbol_types"),
        when(col("n_words") === 0, lit(null))
          .otherwise(col("n_bpe_tokens").cast("double") / col("n_words"))
          .as("fertility"))
      .orderBy("n_merges")
  }

  /** Shared training loop: returns the merge table and the final
    * (w, freq, syms) vocabulary state (checkpointed — caller releases or
    * consumes it). `observe` fires with the checkpointed vocabulary at
    * rank 0 (the char-split state) and after every applied merge —
    * [[bpeBudgetCurve]]'s measurement hook; the frame it sees is released
    * on the NEXT round, so observers must aggregate eagerly. */
  private def bpeTrainState(docs: DataFrame, nMerges: Int,
                            observe: (Int, DataFrame) => Unit = (_, _) => ())
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        concat(split(col("w"), ""), array(lit("</w>"))).as("syms"))
      .localCheckpoint(true)
    observe(0, vocab)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= nMerges) {
      val best = vocab
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (best.isEmpty) { rank = nMerges + 1 } // corpus fully merged: stop
      else {
        val (l, r, n) = best.head
        merges += ((rank, l, r, n))
        val next = vocab
          .select(col("w"), col("freq"), bpeMergePass(col("syms"), l, r).as("syms"))
          .localCheckpoint(true)
        Checkpoints.unpersist(vocab)
        vocab = next
        observe(rank, vocab)
        rank += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** Gopher-style rule-suite quality gate (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A1.1 repetition/quality filters),
    * restricted to the word-level rules this corpus can exercise (the
    * line-level bullet/ellipsis rules need multi-line text): word-count
    * bounds, mean-word-length band, alphabetic-word ratio, and the
    * "contains at least `minDistinctStop` distinct stop words" rule.
    * Emits every signal plus the keep flag and the FIRST failing rule as
    * a reason — filter-rate dashboards and per-rule ablations need the
    * reason, not just the boolean.
    *
    * Shape: one token explode + one hash aggregate per doc (all counts
    * map-side-combined), then a pure projection for the verdicts — one
    * doc_id shuffle total, whole-stage codegen throughout. At 100 TB the
    * rule evaluation is scan-speed; threshold changes are a re-projection
    * of the persisted signal table, not a re-scan of text. */
  def gopherRules(docs: DataFrame, minWords: Int = 30, maxWords: Int = 10000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 5.0,
                  minAlphaRatio: Double = 0.8,
                  minDistinctStop: Int = 2): DataFrame = {
    val allStops = stopwords.values.flatten.toSeq.distinct
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
           sum(length(col("t"))).as("sum_word_len"),
           sum(when(col("t").rlike("[a-z]"), 1L).otherwise(0L)).as("n_alpha"),
           count_distinct(when(col("t").isin(allStops: _*), col("t")))
             .as("n_stop_distinct"))
      .select(col("doc_id"), col("n_words").cast("int").as("n_words"),
        (col("sum_word_len").cast("double") / col("n_words")).as("mean_word_len"),
        (col("n_alpha").cast("double") / col("n_words")).as("alpha_word_ratio"),
        col("n_stop_distinct").cast("int").as("n_stop_distinct"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("alpha_word_ratio"), col("n_stop_distinct"),
        when(col("n_words") < minWords, "too_short")
          .when(col("n_words") > maxWords, "too_long")
          .when(col("mean_word_len") < minMeanWordLen ||
                col("mean_word_len") > maxMeanWordLen, "word_len")
          .when(col("alpha_word_ratio") < minAlphaRatio, "alpha")
          .when(col("n_stop_distinct") < minDistinctStop, "stopwords")
          .otherwise("ok").as("fail_reason"),
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen &&
          col("alpha_word_ratio") >= minAlphaRatio &&
          col("n_stop_distinct") >= minDistinctStop).as("keep"))
  }

  /** Bigram-LM quality proxy (the CCNet-style "score each document with a
    * language model trained on the corpus" pass, Wenzek et al. 2020): train
    * add-one-smoothed bigram probabilities p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V)
    * on the corpus itself, then score each document by the arithmetic mean
    * of its bigram probabilities. Higher = more predictable text. The mean
    * of probabilities (not of their logs) keeps the score fully rational:
    * each p is one IEEE division of integer-valued doubles — bit-identical
    * across engines — and the mean accumulates in DECIMAL(38,6) (see
    * [[graft.queries.Exact]]); `ln` differs in the last ulp between libm
    * implementations, exactly the hazard tfidfTopTerms documents. The
    * ranking differs from true perplexity (arithmetic vs geometric mean)
    * but both order "predictable" above "chaotic" text, which is what the
    * filter consumes.
    *
    * Shape: ONE token explode feeds the unigram counts, the vocab size,
    * and (via a doc_id-windowed lead) the per-doc bigram stream; bigram
    * probabilities arrive by two shuffle joins keyed on the bigram and on
    * w1 — both map-side-combined aggregates over the same explode. At
    * 100 TB the count tables are corpus-level but key-partitioned; in a
    * production CCNet pipeline the counts come from a fixed reference
    * corpus and the join is a broadcast — the scoring shape is identical. */
  def lmBigramScore(docs: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = docs.select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "t")
    val uni = toks.groupBy(col("t").as("w1")).agg(count(lit(1)).as("n_w1"))
    val vocab = uni.select(count(lit(1)).as("v"))
    val bigrams = toks
      .select(col("doc_id"), col("t").as("w1"),
        lead(col("t"), 1).over(byDoc).as("w2"))
      .filter(col("w2").isNotNull)
    val pair = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
    bigrams
      .join(pair, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        ((col("n_pair") + lit(1L)).cast("double") /
          (col("n_w1") + col("v")).cast("double")).as("p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
           graft.queries.Exact.davg(col("p")).as("avg_p"))
  }

  /** Character-distribution diversity per doc — Gini impurity
    * (1 − Σ(cᵢ/n)²) plus the top-character share: the "is this document a
    * single character repeated / a low-diversity flood" signal next to the
    * word-level repetition metrics. Gini instead of Shannon entropy is the
    * POINT, not a shortcut: entropy needs ln, whose rounding differs
    * across libm implementations (the tfidf/lm_bigram rational-arithmetic
    * discipline), while Gini is Σcᵢ² over n² — exact integers below 2⁵³ —
    * and ONE correctly-rounded IEEE division, so the score replays
    * bit-for-bit in any engine. Per-char explode + two doc_id-keyed
    * aggregates; empty docs have no distribution and are absent (the
    * lm_bigram_score domain convention).
    *
    * Guard note: the explode grid comes from sequence(1, length) — Spark's
    * sequence DESCENDS when stop < start, so empty text would yield [1, 0]
    * and fabricate two phantom chars; the length > 0 filter is
    * load-bearing.
    */
  def charGini(docs: DataFrame): DataFrame =
    docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")))).as("i"))
      .select(col("doc_id"), expr("substring(text, i, 1)").as("ch"))
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_chars"),
        count(lit(1)).cast("int").as("distinct_chars"),
        sum(col("c") * col("c")).as("sq"), max(col("c")).as("maxc"))
      .select(col("doc_id"), col("n_chars"), col("distinct_chars"),
        (lit(1.0) - col("sq").cast("double") /
          (col("n_chars") * col("n_chars")).cast("double")).as("gini"),
        (col("maxc").cast("double") / col("n_chars")).as("top_char_ratio"))
}
