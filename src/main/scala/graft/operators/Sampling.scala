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
}
