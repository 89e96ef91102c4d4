package graft.operators

import graft.functions.{CrossHash, HashOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---------------------------------------------------- persisted index

  /** Term-bucket count of the persisted inverted index. 16 keeps the
    * fixture corpora multi-file; a 100 TB corpus raises it (buckets
    * are the partition-pruning unit — aim for bucket dirs of a few
    * GB, e.g. 4096 buckets for a 10 TB postings table).
    */
  val IndexBuckets = 16

  private val MetaName = "_graft_search_meta.json"
  private val StatsPrefix = "_graft_batch_stats_"

  /** Spark-side bucket of a term (charFold is non-negative by
    * construction, so `%` is a true mod).
    */
  def termBucket(term: Column, buckets: Int): Column =
    CrossHash.charFold(term) % buckets

  /** Driver-side replica of [[termBucket]] for probe planning. */
  def termBucketOf(term: String, buckets: Int): Long =
    HashOps.charFold(term) % buckets

  private def searchFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      org.apache.spark.sql.graft.Shim.classic(spark).sparkContext.hadoopConfiguration)

  /** `(term, doc_id, tf, dl, bucket)` postings of a document batch —
    * the inverted index rows. One tokenize pass, one shuffle keyed by
    * (doc_id, term).
    */
  private def postingsOf(docs: DataFrame, buckets: Int): DataFrame = {
    val tok = docs.select(col("doc_id"), CrossHash.tokens(col("text")).as("t"))
    tok.select(col("doc_id"), size(col("t")).as("dl"), explode(col("t")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        termBucket(col("term"), buckets).as("bucket"))
  }

  /** Write one `batch=<token>` postings dir plus its sidecar stats
    * file (`n_docs`, `sum_dl` of THIS batch — BM25's corpus constants
    * are the sum of the sidecars, so an append updates them in O(1)
    * without rescanning the base corpus). Same-token rewrite
    * overwrites both, keeping replay idempotent.
    */
  private def writeSearchBatch(docs: DataFrame, path: String, token: String,
      buckets: Int): Unit = {
    postingsOf(docs, buckets)
      // one file per bucket dir: a probe is a point read, and a
      // fragmented bucket defeats it
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings/batch=$token")
    // stats from the token lists, not the postings: a doc with no
    // tokens has no postings but still counts toward n_docs
    val st = docs.select(CrossHash.tokens(col("text")).as("t"))
      .agg(count(lit(1)).as("n"), coalesce(sum(size(col("t"))), lit(0L)).as("s")).head()
    val fs = searchFs(docs.sparkSession, path)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/$StatsPrefix$token.json"), true)
    try out.write(s"""{"n_docs": ${st.getLong(0)}, "sum_dl": ${st.getLong(1)}}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Build (or rebuild) the persisted inverted index: postings
    * partitioned by term bucket, per-batch corpus-stats sidecars, and
    * a meta marker. Same crash ordering as the ANN index
    * (`Similarity.writeAnnIndex`): meta deleted FIRST and written
    * LAST, so a half-rebuilt index reads as absent, never as a valid
    * meta over deleted postings.
    */
  def writeSearchIndex(docs: DataFrame, path: String,
      buckets: Int = IndexBuckets): Unit = {
    require(buckets >= 1 && buckets <= (1 << 20), s"buckets out of range: $buckets")
    val fs = searchFs(docs.sparkSession, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/$MetaName"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/postings"), true)
    val root = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(root))
      fs.listStatus(root).filter(_.getPath.getName.startsWith(StatsPrefix))
        .foreach(st => fs.delete(st.getPath, false))
    IndexBatches.clearManifest(fs, path)
    writeSearchBatch(docs, path, IndexBatches.Base, buckets)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/$MetaName"), true)
    try out.write(s"""{"buckets": $buckets, "layout": 1}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Extend the index with freshly ingested documents (assumed NEW
    * doc_ids — the ingest contract; replaying the SAME token is
    * idempotent, including across compactions, via the
    * [[IndexBatches]] manifest). Batches tier-compact like the ANN
    * index: the base corpus postings are never rewritten, each
    * compaction costs only what arrived since the last one. A crash
    * between the compact write and the batch-dir deletes can leave
    * duplicate postings (inflating tf/df until the next compaction's
    * dropDuplicates heals them) — at-least-once, never lost terms.
    */
  def appendSearchIndex(fresh: DataFrame, path: String,
      batchToken: String = java.util.UUID.randomUUID().toString,
      maxAppendBatches: Int = 8): Unit = {
    IndexBatches.requireValidToken(batchToken)
    val spark = fresh.sparkSession
    val buckets = readSearchMeta(spark, path)
    val fs = searchFs(spark, path)
    if (IndexBatches.compactedTokens(fs, path).contains(batchToken)) return
    writeSearchBatch(fresh, path, batchToken, buckets)
    val postingsDir = new org.apache.hadoop.fs.Path(s"$path/postings")
    IndexBatches.compactionPlan(fs, postingsDir, maxAppendBatches).foreach {
      case (dirs, token) =>
        spark.read.option("basePath", s"$path/postings")
          .parquet(dirs.map(_.toString): _*)
          .select("term", "doc_id", "tf", "dl", "bucket")
          .dropDuplicates("doc_id", "term")
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$path/postings/batch=$token")
        IndexBatches.recordCompacted(fs, path, dirs.map(_.getName.stripPrefix("batch=")))
        dirs.foreach(p => fs.delete(p, true))
    }
  }

  /** Build the index iff its meta marker is absent or unreadable. */
  def ensureSearchIndex(docs: DataFrame, path: String,
      buckets: Int = IndexBuckets): Unit = {
    val fs = searchFs(docs.sparkSession, path)
    val p = new org.apache.hadoop.fs.Path(s"$path/$MetaName")
    val usable = fs.exists(p) &&
      (try { readSearchMeta(docs.sparkSession, path); true }
       catch { case _: IllegalStateException => false })
    if (!usable) writeSearchIndex(docs, path, buckets)
  }

  private def readSearchMeta(spark: SparkSession, path: String): Int = {
    val fs = searchFs(spark, path)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$path/$MetaName"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val layout = """"layout":\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt).getOrElse(0)
    if (layout != 1) throw new IllegalStateException(
      s"search index at $path uses layout $layout; this library reads layout 1 — " +
        "rebuild with writeSearchIndex")
    """"buckets":\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"malformed search index meta at $path: $txt"))
  }

  /** Corpus stats = sum of the per-batch sidecars (driver-side, one
    * tiny JSON per batch — never a corpus scan).
    */
  private def readSearchStats(spark: SparkSession, path: String): (Long, Long) = {
    val fs = searchFs(spark, path)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith(StatsPrefix))
    val nR = """"n_docs":\s*(\d+)""".r
    val sR = """"sum_dl":\s*(\d+)""".r
    files.foldLeft((0L, 0L)) { case ((n, s), st) =>
      val in = fs.open(st.getPath)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      (n + nR.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L),
        s + sR.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L))
    }
  }

  /** BM25 top-k against the PERSISTED index — identical scores to
    * [[bm25TopK]] (same formula, same constants; df/N/avgdl over the
    * indexed corpus), but the per-query cost is a point read: the
    * probe computes each term's bucket driver-side and the scan reads
    * ONLY those `bucket=` partition dirs (static partition pruning
    * across every batch dir). N and avgdl come from the sidecar sum —
    * no query touches the corpus or even the full index. This is the
    * serving shape: s4 tokenizes the whole corpus per query; at
    * 100 TB that's a full scan per lookup vs. a few-MB bucket read
    * here.
    */
  def bm25Indexed(spark: SparkSession, path: String, terms: Seq[String], k: Int,
      k1: Double = K1, b: Double = B): DataFrame = {
    require(terms.nonEmpty, "bm25Indexed needs at least one term")
    val buckets = readSearchMeta(spark, path)
    val (nDocs, sumDl) = readSearchStats(spark, path)
    require(nDocs > 0, s"search index at $path is empty")
    // exactly avg(dl): Spark's Average over ints is sum(long)/count
    val avgdl = sumDl.toDouble / nDocs
    val termBuckets = terms.map(termBucketOf(_, buckets)).distinct
    val p = spark.read.option("basePath", s"$path/postings")
      .parquet(s"$path/postings")
      .filter(col("bucket").isin(termBuckets: _*) && col("term").isin(terms: _*))
    val df = p.groupBy("term").agg(count(lit(1)).as("df"))
    p.join(broadcast(df), "term")
      .withColumn("contrib",
        log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
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

  /** RECIPROCAL-RANK FUSION of the lexical (BM25) and vector (cosine)
    * rankings — the standard way hybrid retrieval combines systems
    * whose scores live on incomparable scales (Cormack, Clarke &
    * Buettcher, "Reciprocal Rank Fusion outperforms Condorcet and
    * individual Rank Learning Methods", SIGIR 2009):
    *
    *   rrf(d) = sum over systems s of 1 / (k0 + rank_s(d))
    *
    * over each system's top-`poolK` list (a doc absent from a list
    * contributes nothing for that system). The query doc itself
    * (`queryVecId`, whose embedding is the vector query) is excluded
    * from both lists.
    *
    * Distribution shape: each system produces its own bounded top-k
    * (BM25's TakeOrderedAndProject, brute cosine's per-partition
    * heaps); the rank windows then order <= poolK rows — constant-
    * size frames by construction, independent of corpus size — and
    * the fusion is a union + groupBy over <= 2*poolK rows. At 100 TB
    * the expensive part is the per-system retrieval, which reuses
    * those operators' scan-once plans unchanged.
    *
    * Cross-engine exactness: per-system scores are rounded to 6
    * decimals BEFORE ranking (both engines), ranks tie-break on id,
    * and the fused score is rounded to 6.
    */
  def rrfFusion(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      queryVecId: Long, k: Int, poolK: Int = 20, k0: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, terms, poolK)
      .filter(col("doc_id") =!= queryVecId)
      .withColumn("r", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), (lit(1.0) / (lit(k0) + col("r"))).as("c"))
    val vec = Similarity.bruteForceTopK(emb, queryVecId, poolK)
      .withColumn("r", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), (lit(1.0) / (lit(k0) + col("r"))).as("c"))
    lex.unionByName(vec)
      .groupBy("doc_id").agg(round(sum(col("c")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB oracle for [[rrfFusion]] — identical per-system lists,
    * ranks, and fusion arithmetic.
    */
  def sqlRrfFusion(terms: Seq[String], queryVecId: Long, k: Int,
      poolK: Int = 20, k0: Int = 60): String = {
    import graft.functions.VectorFunctions.{sqlDot, sqlNorm}
    val bm25 = sqlBm25TopK(terms, poolK)
    s"""WITH lex0 AS ($bm25),
       |lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
       |  FROM lex0 WHERE doc_id <> $queryVecId),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $queryVecId),
       |vec0 AS (
       |  SELECT e.vec_id,
       |    round(${sqlDot("e.embedding", "qe")} / (${sqlNorm("e.embedding")} * ${sqlNorm("qe")}), 6) AS cos
       |  FROM embeddings e, q WHERE e.vec_id <> $queryVecId
       |  ORDER BY cos DESC, vec_id LIMIT $poolK),
       |vec AS (
       |  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS r
       |  FROM vec0),
       |c AS (
       |  SELECT doc_id, 1.0 / ($k0 + r) AS c FROM lex
       |  UNION ALL
       |  SELECT doc_id, 1.0 / ($k0 + r) AS c FROM vec)
       |SELECT doc_id, round(sum(c), 6) AS rrf
       |FROM c GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT $k""".stripMargin
  }
}
