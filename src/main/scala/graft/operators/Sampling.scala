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

  /** Quality-curriculum selection: the `n` HIGHEST-quality documents
    * per source (the "select the best p% per domain" step most
    * curation pipelines run after dedup/decontamination). Quality is
    * [[TextAnalysis.qualityCol]] — a pure per-row expression, so the
    * only non-map cost is the per-source window rank; ties break on
    * doc_id over the 6-decimal-rounded score so every engine ranks
    * identically. Same scale shape as [[stratifiedSample]]: partition
    * windows sort strata independently, never a global window.
    */
  def topQualityPerSource(docs: DataFrame, n: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    docs.select(col("source"), col("doc_id"),
        TextAnalysis.qualityCol(col("text")).as("quality"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .select(col("source"), col("doc_id"), col("quality"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** Token-budget domain mixing: cap every source at `budgetTokens`
    * tokens by keeping a deterministic content-hash slice of its
    * documents. Per source the keep fraction is
    * `min(1, budget/total_tokens)` computed in 1/10000ths with
    * INTEGER arithmetic (`div`, so both engines truncate
    * identically), and a document stays iff
    * `charFold(text) mod 10000 < limit` — the same content-addressed
    * rule as [[hashSample]], so the selected set is reproducible
    * across engines, reruns, and re-shards, and the realized token
    * count concentrates near the budget without any per-source sort.
    * Output: per-source audit `(source, lim, n_kept, tokens_kept)`.
    *
    * Scale shape: one narrow scan computes tokens+bucket per doc; the
    * per-source totals are a map-side-combined aggregate broadcast
    * back (sources are few); the filter is a pure map. No shuffle of
    * the corpus, any scale.
    */
  def tokenBudgetSample(docs: DataFrame, budgetTokens: Long = 2000L): DataFrame = {
    val toks = docs.select(col("source"),
      size(CrossHash.tokens(col("text"))).cast("long").as("tok"),
      (CrossHash.charFold(col("text")) % 10000L).as("bucket"))
    val lims = toks.groupBy("source").agg(sum("tok").as("total"))
      .select(col("source"),
        least(lit(10000L), expr(s"(${budgetTokens}L * 10000L) div total")).as("lim"))
    toks.join(broadcast(lims), "source")
      .filter(col("bucket") < col("lim"))
      .groupBy("source", "lim")
      .agg(count(lit(1)).as("n_kept"), sum("tok").as("tokens_kept"))
      .select(col("source"), col("lim"), col("n_kept"), col("tokens_kept"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[tokenBudgetSample]]. */
  def sqlTokenBudgetSample(budgetTokens: Long = 2000L): String =
    s"""WITH toks AS (
       |  SELECT source, len(${CrossHash.sqlTokens("text")})::BIGINT AS tok,
       |    ${CrossHash.sqlCharFold("text")} % 10000 AS bucket
       |  FROM documents),
       |lims AS (
       |  SELECT source,
       |    CAST(least(10000, ($budgetTokens * 10000) // sum(tok)) AS BIGINT) AS lim
       |  FROM toks GROUP BY source)
       |SELECT t.source, l.lim, count(*) AS n_kept,
       |  CAST(sum(t.tok) AS BIGINT) AS tokens_kept
       |FROM toks t JOIN lims l USING (source)
       |WHERE t.bucket < l.lim
       |GROUP BY t.source, l.lim ORDER BY t.source""".stripMargin

  /** DuckDB oracle for [[topQualityPerSource]]. */
  def sqlTopQualityPerSource(n: Int = 25): String = {
    val stop = TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id, source, ${CrossHash.sqlTokens("text")} AS t, text FROM documents),
       |q AS (
       |  SELECT doc_id, source,
       |    round(0.4 * least(1.0, len(t)::DOUBLE / 20.0)
       |        + 0.3 * (len(list_filter(t, w -> w IN ($stop)))::DOUBLE / len(t)::DOUBLE)
       |        + 0.3 * (len(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE / len(text)::DOUBLE), 6) AS quality
       |  FROM tok),
       |r AS (
       |  SELECT source, doc_id, quality,
       |    row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id)::BIGINT AS rk
       |  FROM q)
       |SELECT source, doc_id, quality, rk FROM r WHERE rk <= $n
       |ORDER BY source, rk""".stripMargin
  }

  /** DuckDB oracle for [[stratifiedSample]]. */
  def sqlStratifiedSample(stratum: String = "lang", n: Int = 50): String =
    s"""WITH r AS (SELECT $stratum, doc_id,
       |  row_number() OVER (PARTITION BY $stratum
       |    ORDER BY ${CrossHash.sqlCharFold("text")}, doc_id)::BIGINT AS rk
       |  FROM documents)
       |SELECT $stratum, doc_id, rk FROM r WHERE rk <= $n ORDER BY $stratum, rk""".stripMargin

  /** Domain-mixture sampling — the data-mixing step that turns a raw
    * corpus into a weighted training mix (upweight code, downweight
    * low-quality web, ...): each source kept at its own rate. The
    * rule is content-addressed like [[hashSample]] — a row survives
    * iff `charFold(key) mod granularity < floor(rate(source) *
    * granularity)` (charFold is non-negative by construction) — so
    * the mix is a pure function of content: reproducible on any
    * engine or re-shard, auditable by an exact oracle, and a
    * re-ingested document keeps its in/out status. Sources absent
    * from `rates` are DROPPED (a mix is an explicit allowlist).
    *
    * Scale: the rates map is per-source (tiny) and broadcasts; the
    * filter itself is a per-row narrow map — no shuffle at any
    * corpus size.
    */
  def mixtureSample(docs: DataFrame, rates: Map[String, Double],
      key: Column, granularity: Int = 1000): DataFrame = {
    require(granularity > 0, "granularity must be positive")
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    val rdf = rates.toSeq
      .map { case (s, r) => (s, math.floor(r * granularity).toLong) }
      .toDF("source", "__thresh")
    docs.join(broadcast(rdf), Seq("source"))
      .filter(CrossHash.charFold(key) % granularity < col("__thresh"))
      .drop("__thresh")
  }

  /** TEMPERATURE-smoothed domain mixture (α-sampling) — the standard
    * LLM data-mix rule (GPT-3 §2.2, LLaMA §2): where [[mixtureSample]]
    * takes caller-given rates, this DERIVES them from the corpus —
    * domain i is drawn with probability ∝ n_i^α, so α=1 reproduces
    * natural proportions, α=0 equalizes domains, and the usual
    * α∈(0,1) upweights small domains without letting a giant one
    * dominate. Per-doc keep probability for domain i at target size T
    * is min(1, T·w_i/n_i) with w_i = n_i^α / Σ_j n_j^α.
    *
    * Determinism across engines: the per-domain keep probabilities
    * are computed ONCE, driver-side, from the exact domain counts and
    * frozen as INTEGER thresholds over the content hash
    * (`charFold(text) mod granularity < floor(p_i·granularity)`) —
    * returned to the caller so the oracle embeds the identical
    * literals and no cross-engine floating-point ever sits on a
    * comparison boundary. Content addressing keeps the rule
    * reproducible on any engine or re-shard ([[mixtureSample]]'s
    * property).
    *
    * Scale: the domain-count aggregate collects #domains rows (a mix
    * has tens of domains, metadata-scale by definition); the sample
    * itself is a per-row narrow filter — no shuffle at any corpus
    * size. Returns (per-domain thresholds, per-domain audit DF with
    * `(source, n_docs, n_kept, threshold)`).
    */
  def temperatureSample(docs: DataFrame, alpha: Double, targetDocs: Long,
      granularity: Long = 1000000L): (Map[String, Long], DataFrame) = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sumW = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    val thr: Map[String, Long] = counts.map { case (s, n) =>
      val w = math.pow(n.toDouble, alpha) / sumW
      val p = math.min(1.0, targetDocs.toDouble * w / n.toDouble)
      s -> math.floor(p * granularity).toLong
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val tdf = thr.toSeq.toDF("source", "threshold")
    val audit = docs.join(broadcast(tdf), Seq("source"))
      .groupBy(col("source"), col("threshold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(CrossHash.charFold(col("text")) % granularity < col("threshold"), 1L)
          .otherwise(0L)).as("n_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"), col("threshold"))
      .orderBy("source")
    (thr, audit)
  }

  /** DuckDB oracle for [[temperatureSample]]'s audit, embedding the
    * fitted integer thresholds as literals (the dynamic-oracle
    * contract s17/t16/t17 use).
    */
  def sqlTemperatureAudit(thr: Map[String, Long],
      granularity: Long = 1000000L): String = {
    val cases = thr.toSeq.sortBy(_._1)
      .map { case (s, t) => s"WHEN '$s' THEN ${t}::BIGINT" }
      .mkString(" ")
    s"""WITH t AS (SELECT *, CASE source $cases END AS threshold FROM documents)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  sum(CASE WHEN (${CrossHash.sqlCharFold("text")}) % $granularity < threshold
       |           THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |  threshold
       |FROM t GROUP BY source, threshold ORDER BY source""".stripMargin
  }

  /** Per-source audit of [[mixtureSample]]: achieved kept-counts and
    * a spot-checkable witness per source, the report a mixing run
    * emits next to its output.
    */
  def mixtureAudit(docs: DataFrame, rates: Map[String, Double],
      granularity: Int = 1000): DataFrame =
    mixtureSample(docs, rates, col("text"), granularity)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_kept"))
      .orderBy("source")

  /** Length-weighted deterministic sampling: each row's keep
    * probability is `min(1, weight / target)` — long documents
    * upweight toward certainty, short ones thin out — realized by
    * the same content-hash rule as [[hashSample]], so the selection
    * stays a pure function of content (reproducible, auditable,
    * re-ingest-stable) while being per-ROW weighted where
    * [[mixtureSample]] is per-source. Narrow filter, no shuffle.
    */
  def weightedSample(docs: DataFrame, weight: Column, target: Double,
      key: Column, granularity: Int = 1000): DataFrame = {
    require(granularity > 0 && target > 0, "granularity and target must be positive")
    docs.filter(CrossHash.charFold(key) % granularity <
      least(lit(granularity.toLong), floor(weight * granularity / target).cast("long")))
  }

  /** Per-source audit of a length-weighted sample (weight =
    * `n_chars`, certainty at `target` chars).
    */
  def weightedAudit(docs: DataFrame, target: Double = 2000.0,
      granularity: Int = 1000): DataFrame =
    weightedSample(docs, col("n_chars"), target, col("text"), granularity)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_kept"))
      .orderBy("source")

  /** DuckDB oracle for [[weightedAudit]]. */
  def sqlWeightedAudit(target: Double = 2000.0, granularity: Int = 1000): String =
    s"""SELECT source, count(*) AS n_kept, min(doc_id) AS first_kept
       |FROM documents
       |WHERE ${CrossHash.sqlCharFold("text")} % $granularity <
       |  least($granularity, floor(n_chars * $granularity / $target)::BIGINT)
       |GROUP BY source ORDER BY source""".stripMargin

  /** Deterministic train/val/test split: bucket = charFold(key) mod
    * 100, `train` below `pctTrain`, `val` in the next `pctVal`
    * points, `test` above. Content-addressed like [[hashSample]] —
    * the split is a pure function of row content, so no document
    * ever migrates between splits across re-shards, re-ingests, or
    * engines (the leakage guarantee a random split cannot give).
    * Narrow per-row map; no shuffle at any scale.
    */
  def assignSplit(df: DataFrame, key: Column,
      pctTrain: Int = 90, pctVal: Int = 5): DataFrame = {
    require(pctTrain > 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"bad split percents: train=$pctTrain val=$pctVal")
    val b = CrossHash.charFold(key) % 100
    df.withColumn("split",
      when(b < pctTrain, "train")
        .when(b < pctTrain + pctVal, "val")
        .otherwise("test"))
  }

  /** Split-balance audit: per (source, split) population and witness
    * — the report that catches a skewed or leaking split before a
    * training run does.
    */
  def splitAudit(docs: DataFrame, pctTrain: Int = 90, pctVal: Int = 5): DataFrame =
    assignSplit(docs, col("text"), pctTrain, pctVal)
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n"), min("doc_id").as("first_id"))
      .orderBy("source", "split")

  /** DuckDB oracle for [[splitAudit]]. */
  def sqlSplitAudit(pctTrain: Int = 90, pctVal: Int = 5): String =
    s"""SELECT source,
       |  CASE WHEN ${CrossHash.sqlCharFold("text")} % 100 < $pctTrain THEN 'train'
       |       WHEN ${CrossHash.sqlCharFold("text")} % 100 < ${pctTrain + pctVal} THEN 'val'
       |       ELSE 'test' END AS split,
       |  count(*) AS n, min(doc_id) AS first_id
       |FROM documents GROUP BY source, split ORDER BY source, split""".stripMargin

  /** DuckDB oracle for [[mixtureAudit]] (thresholds inlined from the
    * same map the Spark side uses).
    */
  def sqlMixtureAudit(rates: Map[String, Double], granularity: Int = 1000): String = {
    val cases = rates.toSeq.sortBy(_._1)
      .map { case (s, r) =>
        s"WHEN '${s.replace("'", "''")}' THEN ${math.floor(r * granularity).toLong}" }
      .mkString(" ")
    s"""SELECT source, count(*) AS n_kept, min(doc_id) AS first_kept
       |FROM documents
       |WHERE ${CrossHash.sqlCharFold("text")} % $granularity <
       |  (CASE source $cases ELSE -1 END)
       |GROUP BY source ORDER BY source""".stripMargin
  }
}
