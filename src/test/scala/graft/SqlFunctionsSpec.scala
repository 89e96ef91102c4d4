package graft

import graft.functions.{CrossHash, SqlFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SqlFunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  SqlFunctions.register(spark)

  test("graft_* SQL functions equal their Column-API counterparts") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon"), (2L, "one two three"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_charfold(text) AS cf, graft_minhash(text) AS mh,
        |  graft_simhash(text) AS sh, graft_fingerprint(text) AS fp,
        |  graft_chunk_hashes(text) AS ch
        |FROM sqlfn_docs ORDER BY doc_id""".stripMargin).collect()
    val viaCol = docs.select(col("doc_id"),
        CrossHash.charFold(col("text")).as("cf"),
        CrossHash.minhashSigFast(col("text"), 3).as("mh"),
        CrossHash.simhashFast(col("text")).as("sh"),
        CrossHash.fingerprintFast(col("text"), 5).as("fp"),
        graft.operators.Chunking.chunkHashes(col("text")).as("ch"))
      .orderBy("doc_id").collect()
    assert(viaSql.map(_.toString).toSeq == viaCol.map(_.toString).toSeq)
  }

  test("graft_cosine and graft_zvalue evaluate from SQL") {
    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val z = spark.sql("SELECT graft_zvalue(3L, 1L) AS z").head().getLong(0)
    // x=0b11 at even positions, y=0b01 at odd -> 0b0111
    assert(z == 7L)
  }

  test("wrong arity fails analysis with the function's message") {
    // the standard SQL error surface: AnalysisException with Spark's
    // WRONG_NUM_ARGS error class, not a raw IllegalArgumentException
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_cosine(array(1.0f))").collect())
    assert(e.getMessage.contains("graft_cosine"))
    assert(e.getCondition != null && e.getCondition.startsWith("WRONG_NUM_ARGS"),
      s"condition: ${e.getCondition}")
  }

  test("graft_zvalue rejects un-normalized inputs loudly") {
    // in range: fine (both orders of magnitude below/above checked)
    assert(spark.sql("SELECT graft_zvalue(65535L, 0L) AS z").head().getLong(0) >= 0L)
    // raw values outside [0, 2^16) used to silently alias to garbage
    // Morton keys; now they raise
    val neg = intercept[Exception](spark.sql("SELECT graft_zvalue(-1L, 1L)").collect())
    assert(neg.getMessage.contains("pre-normalized"), neg.getMessage)
    val big = intercept[Exception](spark.sql("SELECT graft_zvalue(65536L, 1L)").collect())
    assert(big.getMessage.contains("pre-normalized"), big.getMessage)
    // nulls propagate instead of raising
    assert(spark.sql("SELECT graft_zvalue(CAST(NULL AS LONG), 1L) AS z").head().isNullAt(0))
  }

  test("the session extension registers every function (smoke — shared JVM)") {
    // getOrCreate() reuses the shared session, so full withExtensions
    // coverage needs a fresh JVM (same caveat as ResolutionRuleSpec);
    // assert the extension applies cleanly against a registrar
    val reg = new org.apache.spark.sql.SparkSessionExtensions
    new graft.resolve.GlueSparkExtension().apply(reg) // must not throw
    assert(SqlFunctions.all.map(_._1.funcName).distinct.size == SqlFunctions.all.size)
  }
}
