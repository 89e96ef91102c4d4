package graft.operators

import graft.functions.CrossHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical relevance search over the document corpus — the retrieval
  * half of a training-data pipeline (dedup removes copies, search
  * selects on-topic material). Complements the vector-space operators
  * in [[Similarity]].
  */
object Search {

  /** Okapi BM25 defaults (Robertson & Zaragoza, "The Probabilistic
    * Relevance Framework: BM25 and Beyond", FnTIR 2009).
    */
  val K1 = 1.2
  val B = 0.75

  /** Top-k documents for a bag-of-terms query under BM25 scoring.
    *
    * score(d) = sum over query terms t of
    *   idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * |d|/avgdl))
    * with the non-negative idf variant
    *   idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1).
    *
    * Distribution shape: the corpus is scanned once to tokenize;
    * per-(doc, term) term frequencies come from ONE shuffle keyed by
    * (doc_id, term) after filtering to the query's terms (so the
    * shuffled volume is O(matching postings), not the full index);
    * document frequencies and the corpus stats (N, avgdl) are
    * aggregate-to-tiny DataFrames joined back by BROADCAST — the
    * 1000-executor plan never shuffles the corpus by term. The final
    * per-doc sum + global top-k is Spark's TakeOrderedAndProject
    * (per-partition heaps, no full sort).
    *
    * Cross-engine exactness: all derived constants (k1+1, 1-b) are
    * computed once in Scala and interpolated into the oracle SQL
    * (shortest-round-trip double printing), scores are rounded to 6
    * decimals on both sides before the ORDER BY, and ties break on
    * doc_id.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = K1, b: Double = B): DataFrame = {
    val tok = docs.select(col("doc_id"), CrossHash.tokens(col("text")).as("t"))
    val dl = tok.select(col("doc_id"), size(col("t")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = tok.select(col("doc_id"), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum(col("contrib")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB oracle for [[bm25TopK]], assembled from the same
    * constants.
    */
  def sqlBm25TopK(terms: Seq[String], k: Int,
                  k1: Double = K1, b: Double = B): String = {
    // SQL-escape: a term carrying a quote must not break (or inject
    // into) the oracle statement
    val in = terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id, ${CrossHash.sqlTokens("text")} AS t FROM documents),
       |dl AS (SELECT doc_id, len(t) AS dl FROM tok),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(t) AS term FROM tok)
       |  WHERE term IN ($in) GROUP BY doc_id, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |c AS (
       |  SELECT tf.doc_id,
       |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * ${k1 + 1}) /
       |      (tf + $k1 * (${1 - b} + $b * dl / avgdl)) AS contrib
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats)
       |SELECT doc_id, round(sum(contrib), 6) AS score
       |FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }
}
