package graft.operators

import graft.functions.CrossHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: lay the corpus out as one
  * concatenated token stream (documents in `doc_id` order) and chunk
  * it into fixed-`budget` sequences. Each document gets the sequence
  * id and offset where it starts, plus how many sequences it spans —
  * exactly the layout a concat-then-chunk data loader needs.
  *
  * The core is a GLOBAL prefix sum over document token counts. The
  * naive form (`Window.orderBy(doc_id)` with no partitioning) drags
  * the whole corpus through one partition; this implementation is the
  * classic two-level distributed prefix sum instead:
  *
  *   1. bucket documents by id range (`doc_id / width`, `buckets`
  *      buckets over the observed id span — arithmetic, not sampled,
  *      so the layout is deterministic);
  *   2. one tiny aggregate computes per-bucket token totals
  *      (map-side combined, O(buckets) rows to the driver — the same
  *      metadata cost class as a file listing);
  *   3. an exclusive scan over those totals gives each bucket's
  *      global offset, broadcast-joined back;
  *   4. the within-bucket running sum is a `Window.partitionBy
  *      (bucket)` — every bucket sorts independently, in parallel.
  *
  * At 100 TB: no single-partition stage anywhere; raise `buckets` to
  * a few × the cluster parallelism. Bucketing by id range assumes
  * roughly uniform id density (true for ingest-assigned ids); a
  * pathological id distribution only skews bucket sizes, never
  * correctness — the prefix sum is associative, so ANY split into
  * ordered buckets yields identical output.
  */
object Packing {

  /** Per-document packed layout: `(doc_id, n_tokens, seq_id,
    * seq_off, n_seqs)` — the sequence the doc starts in, its token
    * offset there, and how many budget-sized sequences it touches.
    */
  def packSequences(docs: DataFrame, budget: Int = 512, buckets: Int = 64): DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    // localCheckpoint materializes the tiny (doc_id, n_tokens)
    // projection ONCE: tokenization — the dominant CPU cost at scale
    // — would otherwise rerun for each of the three jobs below
    // (maxId, bucket totals, final layout).
    val toks = docs.select(
      col("doc_id"),
      size(CrossHash.tokens(col("text"))).cast("long").as("n_tokens"))
      .localCheckpoint()

    // Deterministic id-range bucketing over the observed span.
    val maxId = Option(toks.agg(max("doc_id")).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val width = math.max(1L, maxId / buckets + 1)
    // `div` (integer division), never `/`: Spark's `/` on longs is
    // DOUBLE division, which silently loses exactness past 2^53 —
    // fatal for an operator whose whole contract is an exact layout.
    val bucketed = toks.withColumn("bucket", expr(s"doc_id div ${width}L"))

    // O(buckets) rows: per-bucket totals -> exclusive prefix offsets.
    val totals = bucketed.groupBy("bucket").agg(sum("n_tokens").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0L, 0L)) { case ((_, acc), (b, tot)) => (b, acc + tot) }
    val offsetByBucket = (totals.map(_._1) zip offsets.map(_._2)).toMap
    val spark = docs.sparkSession
    import spark.implicits._
    val offsetDf = offsetByBucket.toSeq.toDF("bucket", "bucket_off")

    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val b = budget.toLong
    bucketed
      .join(broadcast(offsetDf), "bucket")
      .withColumn("cum0", col("bucket_off") + coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(
        col("doc_id"),
        col("n_tokens"),
        expr(s"cum0 div ${b}L").as("seq_id"),
        pmod(col("cum0"), lit(b)).as("seq_off"),
        when(col("n_tokens") > 0,
          expr(s"((cum0 + n_tokens - 1) div ${b}L) - (cum0 div ${b}L) + 1"))
          .otherwise(lit(1L)).cast("long").as("n_seqs"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[packSequences]] — the single-window form is
    * fine for an oracle (DuckDB is single-node anyway).
    */
  def sqlPackSequences(budget: Int = 512): String =
    s"""WITH tok AS (SELECT doc_id, len(${CrossHash.sqlTokens("text")})::BIGINT AS n_tokens FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum0
       |  FROM tok)
       |SELECT doc_id, n_tokens, cum0 // $budget AS seq_id, cum0 % $budget AS seq_off,
       |  (CASE WHEN n_tokens > 0 THEN (cum0 + n_tokens - 1) // $budget - cum0 // $budget + 1 ELSE 1 END)::BIGINT AS n_seqs
       |FROM c ORDER BY doc_id""".stripMargin

  /** Deterministic WEIGHTED INTERLEAVE of the corpus across its
    * sources — the data-ORDERING step of a training pipeline (domain
    * mixing decides proportions; this decides the sequence): stride
    * scheduling, where source `s` with integer weight `w_s` emits its
    * rank-`r` document at virtual time `r * (L / w_s)` (`L` = a
    * common multiple of the weights), so a weight-4 source appears
    * 4x as often as a weight-1 source in ANY prefix of the order —
    * not just in expectation, and identically on every run. Weights
    * here derive from the source name's numeric suffix (`1 + n % 4`),
    * standing in for the per-domain quality tier a real pipeline
    * would broadcast. Ties break by (source, doc_id), so the order
    * is total. Returns the first `limit` rows.
    *
    * Scale shape: the per-source rank is ONE source-partitioned
    * window (the partitioning domain-mixing already shuffles on);
    * the global order materializes only through ORDER BY + LIMIT —
    * TakeOrdered, never a full sort. Writing the WHOLE interleaved
    * corpus instead would make `vtime` the sort key of a range-
    * partitioned write (one shuffle), still never a single-node sort.
    */
  def interleaveByWeight(docs: DataFrame, limit: Int = 200): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    docs.select(col("doc_id"), col("source"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("wt", lit(1L) +
        pmod(coalesce(regexp_extract(col("source"), "(\\d+)", 1).cast("long"),
          lit(0L)), lit(4L)))
      .withColumn("vtime", col("rank") * expr("12L div wt"))
      .select("vtime", "source", "doc_id")
      .orderBy("vtime", "source", "doc_id")
      .limit(limit)
  }

  /** DuckDB oracle for [[interleaveByWeight]] — same integer stride
    * arithmetic, same total tie-break.
    */
  def sqlInterleaveByWeight(limit: Int = 200): String =
    s"""WITH r AS (SELECT doc_id, source,
       |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rank,
       |  1 + (COALESCE(TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT), 0) % 4) AS wt
       |  FROM documents)
       |SELECT rank * (12 // wt) AS vtime, source, doc_id
       |FROM r ORDER BY vtime, source, doc_id LIMIT $limit""".stripMargin
}
