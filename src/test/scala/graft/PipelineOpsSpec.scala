package graft

import graft.operators.{Sampling, Search}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval + sampling operator semantics. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")

  test("bm25 matches a hand-computed score on a tiny corpus") {
    import spark.implicits._
    val tiny = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b b")).toDF("doc_id", "text")
    val (k1, b) = (Search.K1, Search.B)
    val n = 3.0
    val avgdl = (3 + 2 + 3) / 3.0
    def idf(df: Int) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Int, df: Int, dl: Int) =
      idf(df) * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))
    // query {a, b}: df(a)=2 (docs 1,2), df(b)=2 (docs 1,3)
    val expected = Map(
      1L -> BigDecimal(term(2, 2, 3) + term(1, 2, 3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      2L -> BigDecimal(term(1, 2, 2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      3L -> BigDecimal(term(3, 2, 3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val got = Search.bm25TopK(tiny, Seq("a", "b"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("bm25 top-k on the fixture corpus is ranked and bounded") {
    val rows = Search.bm25TopK(docs, Seq("spark", "vector", "merge"), 10).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(scores.forall(_ > 0))
  }

  test("bm25 oracle SQL escapes quote-bearing terms") {
    val sql = Search.sqlBm25TopK(Seq("it's", "o'brien"), 5)
    assert(sql.contains("'it''s'") && sql.contains("'o''brien'"))
    // still one well-formed statement: balanced single quotes
    assert(sql.count(_ == '\'') % 2 == 0)
  }

  test("hash sampling is invariant to repartitioning (content-addressed)") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.hashSample(df, col("text"), 20).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val base = ids(docs)
    assert(ids(docs.repartition(7)) == base)
    assert(base.nonEmpty && base.size < docs.count())
  }

  test("sample audit strata sum to the sampled row count") {
    val audit = Sampling.sampleAudit(docs, 20).collect()
    val kept = Sampling.hashSample(docs, col("text"), 20).count()
    assert(audit.map(_.getLong(1)).sum == kept)
  }

  test("mixture sampling keeps per-source rates, drops unrated sources, survives re-sharding") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.mixtureSample(df, rates, col("text")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val base = ids(docs)
    // content-addressed: partitioning must not change the mix
    assert(ids(docs.repartition(7)) == base)
    val bySource = Sampling.mixtureSample(docs, rates, col("text"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.filter(col("source") === "src0").count()
    assert(bySource("src0") == total, "rate 1.0 must keep every row")
    assert(!bySource.contains("src2"), "rate 0.0 must drop every row")
    assert(bySource.get("src1").exists(n => n > 0 && n < total),
      "rate 0.5 must keep a proper subset")
    // sources not in the mix (src3..) never appear
    assert(bySource.keySet.subsetOf(rates.keySet))
  }

  test("temperature sampling: alpha=1 is proportional, alpha=0 equalizes, thresholds clamp") {
    import spark.implicits._
    // three domains with 3:1:1 natural proportions
    val rows = (1 to 300).map(i => (i.toLong, s"big doc $i", "big")) ++
      (1 to 100).map(i => (i + 1000L, s"mid doc $i", "mid")) ++
      (1 to 100).map(i => (i + 2000L, s"small doc $i", "small"))
    val df = rows.toDF("doc_id", "text", "source")
    // alpha=1: w_i = n_i/N, keep prob = T/N for EVERY domain — one
    // uniform threshold (natural proportions preserved)
    val (thr1, _) = Sampling.temperatureSample(df, alpha = 1.0, targetDocs = 100L)
    assert(thr1.values.toSet.size == 1, s"alpha=1 must be uniform: $thr1")
    assert(thr1("big") == 200000L, s"T/N = 100/500 -> threshold 200000: $thr1")
    // alpha=0: w_i = 1/k, keep prob T/(k*n_i) — small domains keep a
    // LARGER fraction than big ones
    val (thr0, audit0) = Sampling.temperatureSample(df, alpha = 0.0, targetDocs = 150L)
    assert(thr0("small") > thr0("big"),
      s"alpha=0 must upweight the small domain: $thr0")
    val a0 = audit0.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(a0("big")._1 == 300L && a0("mid")._1 == 100L)
    assert(a0.values.forall { case (n, kept, _) => kept <= n })
    // a target above the corpus clamps at keep-everything
    val (thrAll, auditAll) = Sampling.temperatureSample(df, alpha = 0.5, targetDocs = 10000L)
    assert(thrAll.values.forall(_ == 1000000L), s"clamp at p=1: $thrAll")
    assert(auditAll.collect().forall(r => r.getLong(1) == r.getLong(2)),
      "p=1 must keep every row")
    // content-addressed: re-sharding never changes the kept set
    val (_, a7) = Sampling.temperatureSample(df.repartition(7), alpha = 0.0, targetDocs = 150L)
    assert(a7.collect().map(r => (r.getString(0), r.getLong(2))).toMap ==
      a0.map { case (s, (_, k, _)) => s -> k })
  }

  test("split assignment is exhaustive, content-addressed, and percent-shaped") {
    def splits(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.assignSplit(df, col("text")).select("doc_id", "split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = splits(docs)
    assert(base.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(base.size == docs.count(), "every row gets exactly one split")
    // re-sharding must not migrate any document between splits
    assert(splits(docs.repartition(7)) == base)
    // 90/5/5 by bucket: train dominates at fixture scale
    val bySplit = base.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(bySplit.getOrElse("train", 0) > bySplit.getOrElse("val", 0))
    assert(bySplit.getOrElse("train", 0) > bySplit.getOrElse("test", 0))
  }
}
