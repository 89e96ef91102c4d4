package graft

import graft.fixtures.TestFixtures
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ADVICE r12 (high): driver-side `canonPath` literals are compared
  * against column-side `canonPathCol` values in the Delta DV isin
  * filter, the changelog position legs, and the MOR-delete affected-
  * file mapping. The two rules MUST emit the same string for the same
  * URI — on object-store paths the old `host+path` driver rule
  * dropped the leading slash (`s3://b/k` → `b/k` vs the column's
  * `/b/k`), so the filters matched nothing and DV-deleted rows
  * silently reappeared. All local-FS tests pass either way (the rules
  * coincide for authority-less URIs), which is exactly why this spec
  * pins the scheme-qualified-with-authority cases.
  */
class PathCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val engine = TestFixtures.engineFor(spark, TestSpark.sfDir)

  private def columnForm(p: String): String = {
    val sp = org.apache.spark.sql.graft.Shim.classic(spark)
    import sp.implicits._
    Seq(p).toDF("p").select(engine.canonPathCol(col("p"))).head().getString(0)
  }

  test("canonPath agrees with canonPathCol across schemes and authorities") {
    val uris = Seq(
      "s3://bucket/table/part=1/f.parquet",       // object store, authority
      "s3a://bucket/table/f.parquet",              // s3a scheme
      "s3a://bucket/deletes_s3_tok/x.parquet",     // writer sidecar shape
      "hdfs://namenode:8020/warehouse/t/f.parquet",// authority WITH port
      "file:/tmp/graft/t/f.parquet",               // single-slash file URI
      "file:///tmp/graft/t/f.parquet",             // triple-slash file URI
      "/tmp/graft/t/f.parquet",                    // bare absolute path
      "s3://bucket/t/k=2026-01-01/f.parquet"       // partition segment kept
    )
    uris.foreach { u =>
      assert(engine.canonPath(u) == columnForm(u),
        s"canonPath and canonPathCol disagree for $u: " +
          s"'${engine.canonPath(u)}' vs '${columnForm(u)}'")
    }
  }

  test("object-store URIs keep the bucket and the leading slash") {
    assert(engine.canonPath("s3://bucket/t/f.parquet") == "/bucket/t/f.parquet")
    assert(engine.canonPath("hdfs://nn:8020/a/b") == "/nn:8020/a/b")
    assert(engine.canonPath("file:/tmp/x") == "/tmp/x")
  }

  test("scheme variants of the same object collapse to one canonical form") {
    val forms = Seq("s3://bucket/t/f.parquet", "s3a://bucket/t/f.parquet",
      "s3n://bucket/t/f.parquet")
    assert(forms.map(engine.canonPath).distinct.size == 1)
  }
}
