package graft.operators

import graft.functions.CrossHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the LBFS/FastCDC technique at
  * token granularity: chunk boundaries are placed where a rolling
  * window's hash satisfies a divisor test, so boundaries are a pure
  * function of LOCAL content. Insert one sentence into a document
  * and only the chunks touching the edit change identity — a
  * fixed-width splitter would shift every later chunk. That
  * shift-resistance is what makes chunk-level dedup work: shared
  * boilerplate (license headers, navbars, quoted replies) dedups
  * across documents that are globally distinct, at sub-document
  * granularity neither exact dedup (d1) nor near-dup pairing
  * (d3/d7) addresses.
  *
  * Scale shape: chunking is a pure per-row map (array expressions,
  * codegen'd — no UDF); the dedup report is one explode +
  * hash-keyed aggregate — exactly d1's shape at chunk granularity.
  * All hashes are [[CrossHash.charFold]], so the DuckDB oracle
  * replicates boundaries and chunk identities bit-for-bit.
  */
object Chunking {

  /** Window width (tokens) of the boundary test. */
  val Window = 3

  /** A boundary fires where `charFold(gram) % Divisor == 0` — mean
    * chunk length ≈ Divisor grams.
    */
  val Divisor = 16

  /** Per-document chunk hashes: `array<long>`, one element per
    * content-defined chunk, in order. Documents with no tokens yield
    * an empty array. Evaluates through the native one-pass kernel
    * ([[graft.functions.ChunkHashesExpr]]); the Column composition
    * below is the executable reference the spec proves it against.
    */
  def chunkHashes(text: Column, divisor: Int = Divisor): Column = {
    import org.apache.spark.sql.graft.Shim
    Shim.column(graft.functions.ChunkHashesExpr(
      Shim.expression(text), Window, divisor))
  }

  /** Reference implementation via Spark array expressions — value-
    * identical to [[chunkHashes]] (ChunkingSpec), quadratic-ish per
    * doc (every gram re-folds its characters through nested lambdas),
    * kept for cross-checking the native kernel.
    */
  def chunkHashesComposed(text: Column, divisor: Int = Divisor): Column = {
    val t = CrossHash.tokens(text)
    val n = size(t)
    // positional (NOT distinct) grams of `Window` tokens starting at p
    val gramAt: Column => Column = p =>
      concat_ws("_", (0 until Window).map(j => element_at(t, p + lit(j))): _*)
    // boundary positions: p in [2, n-Window+1] where the gram hash
    // divides; position 1 never splits (no empty leading chunk).
    // Guard n >= Window+1: Spark's sequence(2, 1) DESCENDS, and a
    // shorter doc has no admissible boundary anyway
    val bs = when(n >= Window + 1,
      filter(sequence(lit(2), n - (Window - 1)),
        p => CrossHash.charFold(gramAt(p)) % divisor === 0))
      .otherwise(array().cast("array<int>"))
    val starts = concat(array(lit(1)), bs)
    val ends = concat(transform(bs, p => p - 1), array(n))
    when(n === 0, array().cast("array<long>"))
      .otherwise(zip_with(starts, ends,
        (s, e) => CrossHash.charFold(concat_ws("_", slice(t, s, e - s + 1)))))
  }

  /** Corpus chunk-dedup report: total chunk occurrences, distinct
    * chunk identities, and the duplicated share — the "how much of
    * this corpus is repeated boilerplate" number a storage- or
    * training-dedup pass starts from.
    */
  def chunkDedupStats(docs: DataFrame, divisor: Int = Divisor): DataFrame =
    docs.select(explode(chunkHashes(col("text"), divisor)).as("ch"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("ch")).as("n_uniq"))
      .select(col("n_chunks"), col("n_uniq"),
        round(lit(1.0) - col("n_uniq").cast("double") / col("n_chunks"), 6).as("dup_ratio"))

  /** The most-shared chunks: identity, occurrence count, and how
    * many distinct documents carry each — the boilerplate catalog.
    */
  def topSharedChunks(docs: DataFrame, k: Int = 10, divisor: Int = Divisor): DataFrame =
    docs.select(col("doc_id"), explode(chunkHashes(col("text"), divisor)).as("ch"))
      .groupBy("ch")
      .agg(count(lit(1)).as("n_occ"), countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_occ").desc, col("ch"))
      .limit(k)

  // ------------------------------------------------------------ DuckDB side

  /** DuckDB oracle for [[chunkDedupStats]] — the same boundary rule
    * (`range(2, len-1)` = positions 2..len-Window+1 for Window=3)
    * and the same chunk identity fold, assembled as staged CTEs.
    */
  def sqlChunkDedupStats(divisor: Int = Divisor): String = {
    val gram = s"(t[p] || '_' || t[p + 1] || '_' || t[p + 2])"
    val chunkStr = "array_to_string(list_slice(t, starts[i], ends[i]), '_')"
    s"""WITH tok AS (SELECT doc_id, ${CrossHash.sqlTokens("text")} AS t FROM documents),
       |b AS (
       |  SELECT doc_id, t,
       |    CASE WHEN len(t) >= ${Window + 1} THEN
       |      list_filter(range(2, len(t) - ${Window - 2}),
       |        p -> ${CrossHash.sqlCharFold(gram)} % $divisor = 0)
       |    ELSE []::BIGINT[] END AS bs
       |  FROM tok WHERE len(t) > 0),
       |se AS (
       |  SELECT doc_id, t, list_prepend(1::BIGINT, bs) AS starts,
       |    list_append(list_transform(bs, x -> x - 1), len(t)::BIGINT) AS ends
       |  FROM b),
       |ch AS (
       |  SELECT unnest(list_transform(range(1, len(starts) + 1),
       |    i -> ${CrossHash.sqlCharFold(chunkStr)})) AS ch
       |  FROM se)
       |SELECT count(*) AS n_chunks, count(DISTINCT ch) AS n_uniq,
       |  round(1.0 - count(DISTINCT ch)::DOUBLE / count(*), 6) AS dup_ratio
       |FROM ch""".stripMargin
  }
}
