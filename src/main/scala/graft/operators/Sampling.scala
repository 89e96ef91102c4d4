package graft.operators

import graft.functions.CrossHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling for training-data
  * pipelines. Unlike `DataFrame.sample` (seeded per-partition RNG —
  * the selected set changes whenever partitioning, task retries, or
  * Spark version change), a hash-mod rule selects the SAME rows on
  * every engine, every run, and every re-shard: the sample is a pure
  * function of row content. That reproducibility is what makes a
  * sample auditable (an exact oracle can recompute it) and stable
  * across incremental pipeline runs (a re-ingested document keeps its
  * in/out status). Per-row narrow filter — pushes to the scan, no
  * shuffle, any scale.
  */
object Sampling {

  /** Keep rows where charFold(key) ≡ keep (mod m) — a 1/m sample,
    * deterministic in the key's content.
    */
  def hashSample(df: DataFrame, key: Column, m: Int, keep: Int = 0): DataFrame =
    df.filter(CrossHash.charFold(key) % m === keep)

  /** Per-source audit of a content-hash sample of the document corpus:
    * how many documents the 1/m rule keeps in each stratum, and the
    * smallest kept id (a spot-checkable witness). A stratified sampler
    * would apply per-stratum `m`; the audit shape is the same.
    */
  def sampleAudit(docs: DataFrame, m: Int = 20): DataFrame =
    hashSample(docs, col("text"), m)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_kept"))
      .orderBy("source")

  /** DuckDB oracle for [[sampleAudit]]. */
  def sqlSampleAudit(m: Int = 20): String =
    s"""SELECT source, count(*) AS n_kept, min(doc_id) AS first_kept
       |FROM documents WHERE ${CrossHash.sqlCharFold("text")} % $m = 0
       |GROUP BY source ORDER BY source""".stripMargin

  /** Exact-n stratified sample: the `n` documents per stratum with
    * the smallest content hash (ties broken by doc_id) — a balanced
    * evaluation split that is a pure function of content, so every
    * engine and every rerun selects the same rows.
    *
    * Scale shape: the rank is a `Window.partitionBy(stratum)` — each
    * stratum sorts independently in parallel (never a global
    * single-partition window). The per-stratum sort is the cost; at
    * 100 TB with huge strata, pre-filter by an approximate hash
    * threshold (≈ n/|stratum| quantile of charFold) to shrink the
    * sort input — the rank step is unchanged, so the result stays
    * exact as long as the threshold keeps ≥ n rows per stratum.
    */
  def stratifiedSample(docs: DataFrame, stratum: String = "lang", n: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratum)).orderBy(col("__h"), col("doc_id"))
    docs.select(col(stratum), col("doc_id"), CrossHash.charFold(col("text")).as("__h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .select(col(stratum), col("doc_id"), col("rk"))
      .orderBy(col(stratum), col("rk"))
  }

  /** DuckDB oracle for [[stratifiedSample]]. */
  def sqlStratifiedSample(stratum: String = "lang", n: Int = 50): String =
    s"""WITH r AS (SELECT $stratum, doc_id,
       |  row_number() OVER (PARTITION BY $stratum
       |    ORDER BY ${CrossHash.sqlCharFold("text")}, doc_id)::BIGINT AS rk
       |  FROM documents)
       |SELECT $stratum, doc_id, rk FROM r WHERE rk <= $n ORDER BY $stratum, rk""".stripMargin
}
