package graft

import graft.operators.{Packing, Pii, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing, PII scrub, and stratified sampling semantics. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")

  test("packSequences matches a hand-computed layout") {
    import spark.implicits._
    // token counts: 3, 4, 2, 5 with budget 4 ->
    // cum0: 0, 3, 7, 9
    val df = Seq(
      (0L, "a b c"), (1L, "d e f g"), (2L, "h i"), (3L, "j k l m n")
    ).toDF("doc_id", "text")
    val out = Packing.packSequences(df, budget = 4, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 3L, 0L, 0L, 1L),   // tokens 0-2 in seq 0
      (1L, 4L, 0L, 3L, 2L),   // starts seq 0 off 3, spills into seq 1
      (2L, 2L, 1L, 3L, 2L),   // starts seq 1 off 3, spills into seq 2
      (3L, 5L, 2L, 1L, 2L)))  // starts seq 2 off 1, ends in seq 3
  }

  test("packSequences is invariant to the bucket count") {
    val base = Packing.packSequences(docs, 512, buckets = 1).collect().toSeq
    for (b <- Seq(3, 17, 64)) {
      assert(Packing.packSequences(docs, 512, buckets = b).collect().toSeq == base,
        s"buckets=$b changed the packing layout")
    }
  }

  test("packSequences plans no single-partition window") {
    val plan = Packing.packSequences(docs, 512, 64)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Window [") ||
      plan.contains("windowspecdefinition(bucket"),
      "window must be partitioned by bucket")
  }

  test("piiStats counts and redacts the three PII classes") {
    import spark.implicits._
    val df = Seq(
      (0L, "mail me at a.b@x.org or c@y.io, host 10.0.0.1, tel 555-123-4567"),
      (1L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = Pii.piiStats(df).collect()
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getLong(3)) == ((2L, 1L, 1L)))
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getLong(3)) == ((0L, 0L, 0L)))
    // a clean doc's fingerprint equals the plain charFold of its text
    val plain = df.filter(col("doc_id") === 1)
      .select(graft.functions.CrossHash.charFold(col("text"))).head.getLong(0)
    assert(out(1).getLong(4) == plain)
    // a dirty doc's fingerprint differs from its raw hash (something was scrubbed)
    val dirty = df.filter(col("doc_id") === 0)
      .select(graft.functions.CrossHash.charFold(col("text"))).head.getLong(0)
    assert(out(0).getLong(4) != dirty)
  }

  test("stratifiedSample returns at most n rows per stratum, deterministically") {
    val s1 = Sampling.stratifiedSample(docs, "lang", 10).collect().toSeq
    val s2 = Sampling.stratifiedSample(docs, "lang", 10).collect().toSeq
    assert(s1 == s2)
    val perStratum = s1.groupBy(_.getString(0)).view.mapValues(_.size)
    assert(perStratum.values.forall(_ <= 10))
    assert(perStratum.nonEmpty)
  }

  test("interleaveByWeight emits sources in exact stride proportion in every prefix") {
    import spark.implicits._
    // src1 -> weight 2 (stride 6), src3 -> weight 4 (stride 3):
    // vtimes src3: 3,6,9,12,... src1: 6,12,18,...
    val df = (0L until 40L).map(i => (i, s"src${1 + 2 * (i % 2)}"))
      .toDF("doc_id", "source")
    val out = Packing.interleaveByWeight(df, limit = 12).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // reference: stride schedule in plain Scala with the same tie-break
    val ranked = (0L until 40L).map(i => (i, s"src${1 + 2 * (i % 2)}"))
      .groupBy(_._2).toSeq.flatMap { case (src, ds) =>
        val wt = 1 + (src.drop(3).toLong % 4)
        ds.map(_._1).sorted.zipWithIndex.map { case (d, r) =>
          ((r + 1) * (12 / wt), src, d)
        }
      }
    val want = ranked.sortBy { case (v, s, d) => (v, s, d) }.take(12)
    assert(out == want)
    // weight-4 source must appear twice as often in the prefix
    val bySrc = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc("src3") == 2 * bySrc("src1"))
  }
}
