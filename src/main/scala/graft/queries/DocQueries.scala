package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** SparkEntry wrappers + DuckDB oracles for the LLM-data-pipeline block
  * (SURVEY.md §2C): text analysis, dedup, similarity search, multimodal
  * plumbing — over the `documents` and `embeddings` tables.
  */
object DocQueries {

  /** DuckDB list literal for a stopword set — generated from the same Scala
    * list the Spark plan uses so the two can't drift. */
  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ",", "]")

  private def scoreSql(lang: String): String =
    s"len(list_filter(w, x -> list_contains(${sqlList(TextAnalysis.stopwords(lang))}, x))) AS ${lang}_score"

  private def langId(s: SparkSession, d: String): DataFrame =
    TextAnalysis.langId(Tables.documents(s, d)).orderBy("doc_id")

  private val langIdSql = s"""
    WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
    s AS (SELECT doc_id, ${Seq("en", "es", "fr", "de").map(scoreSql).mkString(", ")} FROM t)
    SELECT doc_id, en_score, es_score, fr_score, de_score,
      CASE WHEN greatest(en_score, es_score, fr_score, de_score) = 0 THEN 'unknown'
           WHEN de_score >= en_score AND de_score >= es_score AND de_score >= fr_score THEN 'de'
           WHEN en_score >= es_score AND en_score >= fr_score THEN 'en'
           WHEN es_score >= fr_score THEN 'es'
           ELSE 'fr' END AS predicted_lang
    FROM s ORDER BY doc_id"""

  private def textQuality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.quality(Tables.documents(s, d)).orderBy("doc_id")

  private val textQualitySql = s"""
    WITH t AS (SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS w FROM documents)
    SELECT doc_id, length(text) AS n_chars, len(w) AS n_words,
      length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / length(text) AS punct_ratio,
      len(list_filter(w, x -> list_contains(${sqlList(TextAnalysis.stopwords.values.flatten.toSeq.distinct)}, x)))::DOUBLE
        / len(w) AS stopword_ratio,
      list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w) AS mean_word_len
    FROM t ORDER BY doc_id"""

  private def tokenCount(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenCount(Tables.documents(s, d)).orderBy("doc_id")

  private val tokenCountSql = raw"""
    SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens
    FROM documents ORDER BY doc_id"""

  private def docFingerprint(s: SparkSession, d: String): DataFrame =
    TextAnalysis.fingerprint(Tables.documents(s, d)).orderBy("doc_id")

  private def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(Tables.documents(s, d)).orderBy("doc_id")

  private val dedupExactSql = raw"""
    SELECT doc_id,
      min(doc_id) OVER (PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS canonical_id,
      doc_id <> min(doc_id) OVER (PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS is_dup
    FROM documents ORDER BY doc_id"""

  /** Shared oracle for the two near-dup text joins: exact all-pairs word-3gram
    * Jaccard at sf scale (the engines must find the same pair set; the Spark
    * side never materializes all pairs). */
  private val jaccardPairsSql = """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)]) AS s
      FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents)
      WHERE len(w) >= 3),
    p AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             len(list_intersect(a.s, b.s))::DOUBLE
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    SELECT d1, d2, jaccard FROM p WHERE jaccard >= 0.8 ORDER BY d1, d2"""

  private def ngramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccard(Tables.documents(s, d)).orderBy("d1", "d2")

  private def dedupMinhash(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(s, d)).orderBy("d1", "d2")

  private def dedupSimhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhashDup(Tables.documents(s, d)).orderBy("d1", "d2")

  private def dedupEmbedding(s: SparkSession, d: String): DataFrame =
    Similarity.embeddingNearDup(Tables.embeddings(s, d)).orderBy("v1", "v2")

  private def queries(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d).filter($"vec_id" < 20)
  }

  private def knnBruteForce(s: SparkSession, d: String): DataFrame =
    Similarity.knnBruteForce(Tables.embeddings(s, d), queries(s, d))
      .orderBy("query_id", "rank")

  private val knnBruteForceSql = """
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
               FROM embeddings),
    n AS (SELECT vec_id, emb, sqrt(list_sum(list_transform(emb, x -> x*x))) AS nrm FROM v),
    q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm FROM n WHERE vec_id < 20),
    p AS (SELECT query_id, vec_id AS neighbor_id,
            list_sum(list_transform(range(1, len(emb)+1), i -> emb[i]*q_emb[i]))
              / (nrm * q_nrm) AS cos
          FROM n JOIN q ON vec_id <> query_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rank FROM p)
    SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5
    ORDER BY query_id, rank"""

  private def knnLsh(s: SparkSession, d: String): DataFrame =
    Similarity.knnLsh(Tables.embeddings(s, d), queries(s, d))
      .orderBy("query_id", "rank")

  private def multimodalMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.pipeline(s, Tables.documents(s, d)).orderBy("doc_id")

  val registry: Seq[Q] = Seq(
    Q("lang_id", langId, Some(langIdSql)),
    Q("text_quality", textQuality, Some(textQualitySql)),
    Q("token_count", tokenCount, Some(tokenCountSql)),
    Q("doc_fingerprint", docFingerprint, None),
    Q("dedup_exact", dedupExact, Some(dedupExactSql)),
    Q("ngram_jaccard", ngramJaccard, Some(jaccardPairsSql)),
    Q("dedup_minhash", dedupMinhash, Some(jaccardPairsSql)),
    Q("dedup_simhash", dedupSimhash, None),
    Q("dedup_embedding", dedupEmbedding, None),
    Q("knn_bruteforce", knnBruteForce, Some(knnBruteForceSql)),
    Q("knn_lsh", knnLsh, None),
    Q("multimodal_meta", multimodalMeta, None))
}
