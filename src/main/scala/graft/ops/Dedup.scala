package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication operators: exact, exact n-gram Jaccard (prefix-filter
  * set-similarity join), MinHash+LSH, SimHash.
  *
  * The set-oriented analogue of a dedup pass a training-data pipeline runs
  * before tokenization. Every operator avoids the O(n²) cross join: exact
  * dedup is one hash shuffle on the normalized text; the similarity joins
  * generate candidates through lossless prefix filtering or LSH banding and
  * verify only the candidates.
  */
object Dedup {

  /** Normalized text form shared by all dedup operators (lowercase, trim,
    * collapse whitespace). */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Distinct word n-gram shingle set of a token array (empty when the doc is
    * shorter than n words). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Exact dedup: every doc mapped to the smallest doc_id sharing its
    * normalized text. One shuffle on the (hashed) norm text; at 100 TB
    * group-by-hash-of-text keeps shuffle rows narrow (hash + id), never the
    * document bodies. */
  def exact(docs: DataFrame): DataFrame = {
    val byText = Window.partitionBy(xxhash64(normText(col("text"))), normText(col("text")))
    docs.select(col("doc_id"), min(col("doc_id")).over(byText).as("canonical_id"))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact n-gram Jaccard similarity join via lossless prefix filtering
    * (Chaudhuri et al., SSJoin; Bayardo et al., WWW'07 "Scaling Up All
    * Pairs"): order each shingle set by a global total order (xxhash64), keep
    * only the first |s|-ceil(t*|s|)+1 shingles as the "prefix" — two sets
    * with Jaccard >= t MUST share a prefix shingle — then join on prefix
    * shingles, dedupe candidates, and verify exact Jaccard on just those.
    *
    * Shuffles: one on prefix-shingle hash (candidate generation), one on
    * doc_id (shingle re-attach). Never materializes the n² pair space; the
    * size filter t*|A| <= |B| prunes candidates before verification.
    */
  def ngramJaccard(docs: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = docs
      .select(col("doc_id"), shingles(TextAnalysis.tokens(col("text")), n).as("s"))
      .filter(size(col("s")) > 0)
    val withPrefix = sh.select(
      col("doc_id"), col("s"), size(col("s")).as("sz"),
      slice(
        array_sort(transform(col("s"), s => struct(xxhash64(s).as("h"), s.as("g")))),
        lit(1),
        (size(col("s")) - ceil(lit(threshold) * size(col("s"))).cast("int") + 1))
        .as("prefix"))
    val tokensOut = withPrefix
      .select(col("doc_id"), col("sz"), explode(col("prefix.h")).as("h"))
    val a = tokensOut.toDF("d1", "sz1", "h")
    val b = tokensOut.toDF("d2", "sz2", "h")
    val candidates = a.join(b,
        a("h") === b("h") && a("d1") < b("d2") &&
        b("sz2") >= ceil(lit(threshold) * a("sz1")) &&
        a("sz1") >= ceil(lit(threshold) * b("sz2")))
      .select(col("d1"), col("d2")).distinct()
    verifyJaccard(candidates, sh, threshold)
  }

  /** Attach both sides' shingle sets to candidate (d1, d2) pairs and keep
    * pairs whose exact Jaccard clears the threshold. */
  private def verifyJaccard(candidates: DataFrame, sh: DataFrame,
                            threshold: Double): DataFrame = {
    val s1 = sh.select(col("doc_id").as("d1"), col("s").as("s1"))
    val s2 = sh.select(col("doc_id").as("d2"), col("s").as("s2"))
    candidates.join(s1, "d1").join(s2, "d2")
      .select(col("d1"), col("d2"), jaccard(col("s1"), col("s2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature column: hash family member i is xxhash64 re-keyed by
    * (base shingle hash, i, seed) — i.e. an independent-ish permutation per
    * slot without the classic a*x+b modular form (which wraps 64-bit
    * arithmetic and trips ANSI overflow checks). Pure per-row array math —
    * the signature costs O(perms × shingles) compute but zero shuffle. */
  def minhashSignature(sh: Column, numPerms: Int = 128, seed: Long = 42L): Column = {
    val hs = transform(sh, s => xxhash64(s))
    array((0 until numPerms).map { i =>
      array_min(transform(hs, h => xxhash64(h, lit(i.toLong), lit(seed))))
    }: _*)
  }

  /** MinHash+LSH near-dup join: shingle → 128-perm minhash signature → 16
    * bands of 8 rows → band-bucket join → exact-Jaccard verification.
    *
    * With b=16, r=8 a pair at J=0.8 is missed with probability
    * (1-0.8^8)^16 ≈ 2e-2 … so the default uses b=32, r=4:
    * (1-0.8^4)^32 ≈ 5e-8 — effectively total recall at the threshold, and
    * precision is exact because candidates are verified. The shuffle carries
    * only (band, bandHash, doc_id) — never signatures or text. */
  def minhashLsh(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                 bands: Int = 32, rows: Int = 4, seed: Long = 42L): DataFrame = {
    val sh = docs
      .select(col("doc_id"), shingles(TextAnalysis.tokens(col("text")), n).as("s"))
      .filter(size(col("s")) > 0)
    val sig = sh.select(col("doc_id"),
      minhashSignature(col("s"), bands * rows, seed).as("sig"))
    val banded = sig.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))))))
      .toDF("doc_id", "band", "band_hash")
    val l = banded.toDF("d1", "band", "band_hash")
    val r = banded.toDF("d2", "band", "band_hash")
    val candidates = l.join(r, Seq("band", "band_hash"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
    verifyJaccard(candidates, sh, threshold)
  }

  /** 64-bit SimHash (Charikar; Manku et al., WWW'07): per token-hash bit,
    * vote +1/-1 weighted by occurrence; sign of each bit-sum is the
    * fingerprint bit. Computed entirely per-row with higher-order array
    * functions — no explode, no shuffle. */
  def simhash(toks: Column): Column = {
    val hs = transform(toks, t => xxhash64(t))
    (0 until 64).map { i =>
      when(aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)) >= 0L,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** SimHash near-dup join with pigeonhole bucketing: split the 64-bit
    * fingerprint into 4×16-bit chunks; any pair within Hamming distance
    * maxHamming <= 3 must agree on at least one chunk, so the join on
    * (chunk index, chunk value) is lossless. Verification is a bit_count
    * over XOR. */
  def simhashDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val withSim = docs
      .select(col("doc_id"), simhash(TextAnalysis.tokens(col("text"))).as("simhash"))
    val chunked = withSim.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .toDF("doc_id", "simhash", "chunk", "chunk_val")
    val l = chunked.toDF("d1", "sim1", "chunk", "chunk_val")
    val r = chunked.toDF("d2", "sim2", "chunk", "chunk_val")
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("sim1").bitwiseXOR(col("sim2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
