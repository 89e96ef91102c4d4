package graft.operators

import graft.functions.CrossHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end cleaning-pipeline audit — the one-row report a corpus
  * build emits: how many documents survive each cumulative stage
  *
  *   1. `n_total`     raw corpus;
  *   2. `n_dedup`     exact-dedup canonical keepers (min doc_id per
  *                    content hash);
  *   3. `n_decontam`  + zero eval 5-gram overlap ([[Dedup.decontaminate]]'s
  *                    rule — the d12 operator as a filter);
  *   4. `n_quality`   + token count in [20, 1000] (t9's length gate);
  *
  * plus `n_tokens`, the token yield of the final set — the number
  * that actually prices a training run.
  *
  * Composition shape: every stage is a FLAG on one pass over the
  * corpus — the canonical test is a window partitioned by content
  * hash, contamination arrives as a broadcast-joined hit set
  * (matched docs only), and the funnel is a single aggregate of
  * conditional sums. The corpus is scanned once and shuffled twice
  * (hash window, final aggregate) regardless of how many stages the
  * pipeline grows.
  */
object PipelineAudit {

  def cleanCorpusAudit(corpus: DataFrame, evalDocs: DataFrame, n: Int = 5,
      minTokens: Int = 20, maxTokens: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__h").orderBy("doc_id")
    val hits = Dedup.decontaminate(corpus, evalDocs, n)
      .select(col("doc_id"), lit(true).as("__hit"))
    corpus
      .select(col("doc_id"), CrossHash.charFold(col("text")).as("__h"),
        size(CrossHash.tokens(col("text"))).as("__nt"))
      .withColumn("__rk", row_number().over(w))
      .join(broadcast(hits), Seq("doc_id"), "left")
      .select(col("__nt"),
        (col("__rk") === 1).as("f1"),
        (col("__rk") === 1 && col("__hit").isNull).as("f2"),
        (col("__rk") === 1 && col("__hit").isNull &&
          col("__nt").between(minTokens, maxTokens)).as("f3"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("f1"), 1L).otherwise(0L)).as("n_dedup"),
        sum(when(col("f2"), 1L).otherwise(0L)).as("n_decontam"),
        sum(when(col("f3"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("f3"), col("__nt").cast("long")).otherwise(0L)).as("n_tokens"))
  }

  /** DuckDB oracle for [[cleanCorpusAudit]] over `documents` split by
    * the registration's eval predicate.
    */
  def sqlCleanCorpusAudit(evalPred: String, n: Int = 5,
      minTokens: Int = 20, maxTokens: Int = 1000): String =
    s"""WITH tok AS (SELECT doc_id, text, ${CrossHash.sqlTokens("text")} AS t FROM documents),
       |sh AS (SELECT doc_id, ${CrossHash.sqlShinglesOf("t", n)} AS s FROM tok),
       |eg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE $evalPred),
       |hits AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_id, unnest(s) AS g FROM sh WHERE NOT ($evalPred))
       |  WHERE g IN (SELECT g FROM eg)),
       |c AS (
       |  SELECT doc_id, len(t) AS nt,
       |    row_number() OVER (PARTITION BY ${CrossHash.sqlCharFold("text")} ORDER BY doc_id) AS rk,
       |    doc_id IN (SELECT doc_id FROM hits) AS hit
       |  FROM tok WHERE NOT ($evalPred))
       |SELECT count(*) AS n_total,
       |  count(*) FILTER (rk = 1) AS n_dedup,
       |  count(*) FILTER (rk = 1 AND NOT hit) AS n_decontam,
       |  count(*) FILTER (rk = 1 AND NOT hit AND nt BETWEEN $minTokens AND $maxTokens) AS n_quality,
       |  coalesce(CAST(sum(nt) FILTER (rk = 1 AND NOT hit AND nt BETWEEN $minTokens AND $maxTokens) AS BIGINT), 0) AS n_tokens
       |FROM c""".stripMargin
}
