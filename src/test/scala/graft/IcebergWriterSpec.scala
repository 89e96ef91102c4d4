package graft

import graft.catalog.FixtureCatalog
import graft.engine.GlueTableEngine
import graft.model.CacheConfig
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg v2 write path (graft.listing.IcebergWriter): append-only
  * snapshots with footer-derived manifest bounds, round-tripped
  * through the engine's own resolver.
  */
class IcebergWriterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.graft.Shim

  test("write + append round-trip with time travel and incremental reads") {
    val sp = Shim.classic(spark)
    import sp.implicits._
    val loc = s"/root/repo/target/ice_write_${System.nanoTime()}"
    val cat = new FixtureCatalog()
    val eng = new GlueTableEngine(spark, cat)
    eng.writeIcebergTable((0L until 100L).map(i => (i, s"r$i")).toDF("k", "v").coalesce(1),
      "d", "iw", loc)
    assert(eng.tableDF("d", "iw").count() == 100)
    val v = eng.appendIcebergTable(
      (1000L until 1100L).map(i => (i, s"r$i")).toDF("k", "v").coalesce(1), "d", "iw")
    assert(v == 2L)
    // latest = both snapshots' data; time travel = the first alone
    assert(eng.tableDF("d", "iw").count() == 200)
    assert(eng.tableDF("d", "iw", 1).count() == 100)
    assert(eng.tableDF("d", "iw", 1).agg(max("k")).head().getLong(0) == 99L)
    // incremental read = exactly the appended batch
    assert(eng.tableDFIncremental("d", "iw", 1, 0).agg(min("k"), max("k")).head()
      .toSeq == Seq(1000L, 1099L))
    // metadata count over live files
    assert(eng.countRows("d", "iw") == 200L)
  }

  test("self-written manifest bounds skip files with footers disabled") {
    val sp = Shim.classic(spark)
    import sp.implicits._
    val loc = s"/root/repo/target/ice_write_skip_${System.nanoTime()}"
    val cat = new FixtureCatalog()
    val eng = new GlueTableEngine(spark, cat, CacheConfig(footerStatsMaxFiles = 0))
    eng.writeIcebergTable((0L until 100L).map(i => (i, s"r$i")).toDF("k", "v").coalesce(1),
      "d", "iws", loc)
    eng.appendIcebergTable(
      (1000L until 1100L).map(i => (i, s"r$i")).toDF("k", "v").coalesce(1), "d", "iws")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = eng.query("SELECT k FROM glue.d.iws WHERE k >= 1000")
      assert(df.collect().length == 100)
      val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
      assert(scans.head.metrics("numFiles").value == 1,
        s"manifest bounds must prune to 1 of 2 files, got ${scans.head.metrics("numFiles").value}")
      // string bounds work too
      val dfs = eng.query("SELECT v FROM glue.d.iws WHERE v = 'r5'")
      assert(dfs.collect().length == 1)
      val s2 = dfs.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
      assert(s2.head.metrics("numFiles").value == 1,
        s"string bounds must prune, got ${s2.head.metrics("numFiles").value}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
