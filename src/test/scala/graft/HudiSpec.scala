package graft

import graft.fixtures.TestFixtures
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hudi COW timeline resolution (graft.listing.HudiTimelineResolver):
  * latest-file-slice semantics, upsert versioning, replacecommit
  * retirement, time travel. Beyond-reference like DELTA — the
  * reference's classifier declares HUDI but can never return it.
  */
class HudiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val engine = TestFixtures.engineFor(spark, TestSpark.sfDir)

  private lazy val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")

  test("latest state reads exactly one slice per file group — no stale-version double counting") {
    // fixture dir holds FOUR parquet files (fg1 v1+v2, fg2 v1, fg3)
    // but the live set is {fg1 v2, fg3} = full lineitem exactly once
    assert(engine.tableDF("default", "hudi_lineitem").count() == li.count())
    val paths = engine.files("default", "hudi_lineitem").map(_.path)
    assert(paths.size == 2, s"live slice count: $paths")
    assert(paths.exists(_.contains("fg1_0-0-0_002")), "upsert must pick the v2 slice")
    assert(!paths.exists(_.contains("fg1_0-0-0_001")), "stale v1 slice must never be read")
    assert(paths.exists(_.contains("fg3")) && !paths.exists(_.contains("fg2")),
      "replacecommit must retire fg2 in favor of fg3")
  }

  test("time travel walks the timeline backwards") {
    // offset 1 -> before the replacecommit: {fg1 v2, fg2 v1}
    val v1 = engine.files("default", "hudi_lineitem", 1).map(_.path)
    assert(v1.exists(_.contains("fg2")) && !v1.exists(_.contains("fg3")))
    assert(v1.exists(_.contains("fg1_0-0-0_002")))
    // offset 2 -> before the upsert: {fg1 v1, fg2 v1}
    val v2 = engine.files("default", "hudi_lineitem", 2).map(_.path)
    assert(v2.exists(_.contains("fg1_0-0-0_001")) && !v2.exists(_.contains("fg1_0-0-0_002")))
    // every version's CONTENT is the full table (the fixture rewrites
    // identical rows), so counts hold at each point in time
    assert(engine.tableDF("default", "hudi_lineitem", 1).count() == li.count())
    assert(engine.tableDF("default", "hudi_lineitem", 2).count() == li.count())
    // beyond history -> empty
    assert(engine.files("default", "hudi_lineitem", 5).isEmpty)
  }

  test("hive-style partitioned Hudi layout prunes via the path extractors") {
    import org.apache.spark.sql.graft.Shim
    val sp = Shim.classic(spark)
    import sp.implicits._
    val loc = s"/root/repo/target/hudi_part_${System.nanoTime()}"
    // two partitions, one file group each, Hive-style partition dirs
    def writeSlice(part: String, name: String, rows: Seq[(Long, String)]): java.io.File = {
      val tmp = s"$loc/_tmp"
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      val dir = new java.io.File(s"$loc/p=$part"); dir.mkdirs()
      val dst = new java.io.File(dir, s"$name.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      dst
    }
    val fa = writeSlice("a", "fga_0-0-0_001", Seq((1L, "x"), (2L, "y")))
    val fb = writeSlice("b", "fgb_0-0-0_001", Seq((3L, "z")))
    new java.io.File(s"$loc/.hoodie").mkdirs()
    def stat(fileId: String, f: java.io.File, part: String): String = {
      val rel = s"p=$part/${f.getName}"
      s"""{"fileId": "$fileId", "path": "$rel", "fileSizeInBytes": ${f.length()}}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$loc/.hoodie/001.commit"),
      s"""{"partitionToWriteStats": {"p=a": [${stat("fga", fa, "a")}], "p=b": [${stat("fgb", fb, "b")}]}}"""
        .getBytes("UTF-8"))
    val cat = new graft.catalog.FixtureCatalog().register(graft.model.GlueTable(
      "d", "hp", Some(loc), partitionKeys = Seq(graft.model.ColumnDef("p")),
      parameters = Map("table_type" -> "HUDI")))
    val eng = new graft.engine.GlueTableEngine(spark, cat)
    // partition values extract from the key=value path segments
    assert(eng.tableDF("d", "hp").count() == 3)
    val pruned = eng.prunedFiles("d", "hp", Seq(col("p") === "a"))
    assert(pruned.size == 1 && pruned.head.contains("p=a"), s"got $pruned")
    assert(eng.tableDF("d", "hp").filter(col("p") === "b").count() == 1)
  }

  test("incremental read between timeline instants") {
    // 002 -> 003 (replacecommit): fg3 is the only new file; its rows
    // are the odd half
    val inc = engine.tableDFIncremental("default", "hudi_lineitem", 1, 0)
    assert(inc.count() == li.filter(col("l_orderkey") % 2 === 1).count())
    assert(inc.filter(col("l_orderkey") % 2 === 0).count() == 0)
  }
}
