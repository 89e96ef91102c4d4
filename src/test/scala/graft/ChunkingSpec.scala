package graft

import graft.operators.Chunking
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def chunksOf(text: String): Seq[Long] =
    Seq(text).toDF("text")
      .select(Chunking.chunkHashes(col("text")).as("ch"))
      .head().getSeq[Long](0).toSeq

  test("chunking is shift-resistant: a front edit leaves later chunks intact") {
    val words = (0 until 400).map(i => s"w${i * 7919 % 997}")
    val base = chunksOf(words.mkString(" "))
    val edited = chunksOf(("INSERTED" +: words).mkString(" "))
    assert(base.size > 5, s"fixture degenerate: ${base.size} chunks")
    // all chunks after the edited region keep their identity
    val shared = base.toSet.intersect(edited.toSet).size
    assert(shared >= base.size - 2,
      s"edit changed ${base.size - shared} of ${base.size} chunks; CDC should localize it")
    // a fixed-width splitter would shift EVERY chunk: sanity-check
    // the counterfactual so the assertion above means something
    def fixed(ws: Seq[String]) = ws.grouped(16).map(_.mkString("_")).toSeq
    val fBase = fixed(words)
    val fEdit = fixed("INSERTED" +: words)
    assert(fBase.toSet.intersect(fEdit.toSet).size <= 1)
  }

  test("short and empty documents chunk safely") {
    assert(chunksOf("") == Seq.empty)
    assert(chunksOf("one").size == 1)
    assert(chunksOf("one two three").size == 1) // too short for any boundary
  }

  test("identical documents yield identical chunk sequences") {
    val words = (0 until 100).map(i => s"t${i * 31 % 53}").mkString(" ")
    val a = chunksOf(words)
    assert(a.nonEmpty && a == chunksOf(words))
  }

  test("native kernel equals the Column-composed reference on the fixture corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val native = docs.select(col("doc_id"), Chunking.chunkHashes(col("text")).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val composed = docs.select(col("doc_id"), Chunking.chunkHashesComposed(col("text")).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(native == composed)
    // and on the edge shapes the kernel special-cases
    for (t <- Seq("", "one", "a b c", "a b c d")) {
      val n = Seq(t).toDF("text").select(Chunking.chunkHashes(col("text"))).head().getSeq[Long](0)
      val c = Seq(t).toDF("text").select(Chunking.chunkHashesComposed(col("text"))).head().getSeq[Long](0)
      assert(n == c, s"mismatch on '$t': $n vs $c")
    }
  }

  test("top shared chunks surface planted cross-document boilerplate") {
    val boiler = "this license header is identical across files and long enough to chunk"
    val docs = (0 until 6).map(i =>
      (i.toLong, s"$boiler unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e"))
      .toDF("doc_id", "text")
    val top = Chunking.topSharedChunks(docs, 5).collect()
    assert(top.nonEmpty, "planted boilerplate must produce a shared chunk")
    assert(top.head.getLong(2) == 6, s"boilerplate chunk should span all 6 docs: ${top.head}")
  }
}
