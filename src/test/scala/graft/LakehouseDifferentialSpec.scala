package graft

import graft.catalog.FixtureCatalog
import graft.engine.GlueTableEngine
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shim
import org.scalatest.funsuite.AnyFunSuite

/** DIFFERENTIAL check across the three lakehouse write paths: the
  * same logical mutations applied through the Delta, Iceberg, and
  * Hudi writers must leave all engine read paths agreeing
  * row-for-row at every stage — initial write, append, row-level
  * upsert, and (where the format supports a delete) row-level
  * delete. Each writer is spec-proven in isolation elsewhere; this
  * is the cross-format property those specs can't see: a bug that
  * bends one format's semantics (a lost append, an upsert that
  * duplicates instead of replacing, a delete that leaks back) breaks
  * the three-way equality even if that format's own spec still
  * passes.
  */
class LakehouseDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def expect(keys: Seq[Long], upserted: Set[Long],
      deleted: Set[Long]): Set[(Long, String)] =
    keys.filterNot(deleted)
      .map(k => k -> (if (upserted(k)) s"u$k" else s"r$k")).toSet

  test("same mutations through Delta, Iceberg, and Hudi read back identically") {
    val sp = Shim.classic(spark)
    import sp.implicits._
    val stamp = System.nanoTime()
    val cat = new FixtureCatalog()
    val eng = new GlueTableEngine(spark, cat)

    def base = (0L until 100L).map(k => (k, s"r$k")).toDF("k", "v").coalesce(2)
    def appendBatch = (100L until 150L).map(k => (k, s"r$k")).toDF("k", "v").coalesce(1)
    def upsertBatch = (0L until 10L).map(k => (k, s"u$k")).toDF("k", "v").coalesce(1)

    // stage 0: initial write
    eng.writeDeltaTable(base, "d", "diff_d", s"/root/repo/target/lhdiff_d_$stamp")
    eng.writeIcebergTable(base, "d", "diff_i", s"/root/repo/target/lhdiff_i_$stamp")
    eng.writeHudiTable(base, "d", "diff_h", s"/root/repo/target/lhdiff_h_$stamp")
    def all = Seq("diff_d", "diff_i", "diff_h").map(t => t -> rows(eng.tableDF("d", t)))
    val want0 = expect(0L until 100L, Set.empty, Set.empty)
    all.foreach { case (t, got) => assert(got == want0, s"$t diverges after write") }

    // stage 1: append
    eng.appendDeltaTable(appendBatch, "d", "diff_d")
    eng.appendIcebergTable(appendBatch, "d", "diff_i")
    eng.appendHudiTable(appendBatch, "d", "diff_h")
    val want1 = expect(0L until 150L, Set.empty, Set.empty)
    all.foreach { case (t, got) => assert(got == want1, s"$t diverges after append") }

    // stage 2: row-level upsert of keys 0..9 — Delta via MERGE, Hudi
    // via its native upsert, Iceberg via the ONE-SNAPSHOT MOR merge
    // (data files + equality delete at the same sequence number)
    eng.mergeDelta("d", "diff_d", upsertBatch, "k")
    eng.upsertHudi("d", "diff_h", upsertBatch, "k")
    eng.mergeIceberg("d", "diff_i", upsertBatch, "k")
    val want2 = expect(0L until 150L, (0L until 10L).toSet, Set.empty)
    all.foreach { case (t, got) => assert(got == want2, s"$t diverges after upsert") }

    // stage 3: row-level delete of k >= 140 — Delta rewrites only
    // stats-intersecting files, Iceberg takes the MOR position-delete
    // path, Hudi the CoW replacecommit — full three-way equality
    eng.deleteDeltaWhere("d", "diff_d", col("k") >= 140L)
    eng.deleteIcebergWhere("d", "diff_i", col("k") >= 140L)
    eng.deleteHudiWhere("d", "diff_h", col("k") >= 140L)
    val want3 = expect(0L until 150L, (0L until 10L).toSet, (140L until 150L).toSet)
    all.foreach { case (t, got) => assert(got == want3, s"$t diverges after delete") }

    // metadata COUNT(*) agrees with the scan on every format/stage
    assert(eng.countRows("d", "diff_d") == want3.size.toLong)
    assert(eng.countRows("d", "diff_i") == want3.size.toLong)
    assert(eng.countRows("d", "diff_h") == want3.size.toLong)
  }

  test("merge-on-read deletes agree across Delta DVs and Iceberg position deletes") {
    // the MOR twin of the CoW delete stage above: the same row-level
    // delete through Delta's deletion vectors and Iceberg's position
    // deletes — neither may rewrite a data file, and both reads (and
    // their exact metadata counts) must agree row-for-row
    val sp = Shim.classic(spark)
    import sp.implicits._
    val stamp = System.nanoTime()
    val cat = new FixtureCatalog()
    val eng = new GlueTableEngine(spark, cat)
    def base = (0L until 100L).map(k => (k, s"r$k")).toDF("k", "v").coalesce(2)
    eng.writeDeltaTable(base, "d", "mor_d", s"/root/repo/target/lhmor_d_$stamp")
    eng.writeIcebergTable(base, "d", "mor_i", s"/root/repo/target/lhmor_i_$stamp")
    val filesD = eng.files("d", "mor_d").map(_.path).toSet
    val filesI = eng.files("d", "mor_i").map(_.path).toSet
    eng.deleteDeltaWhereMor("d", "mor_d", col("k") % 7L === 3L)
    eng.deleteIcebergWhere("d", "mor_i", col("k") % 7L === 3L)
    assert(eng.files("d", "mor_d").map(_.path).toSet == filesD,
      "Delta DV delete must not rewrite data files")
    assert(eng.files("d", "mor_i").map(_.path).toSet == filesI,
      "Iceberg position delete must not rewrite data files")
    val want = expect(0L until 100L, Set.empty, (0L until 100L).filter(_ % 7L == 3L).toSet)
    assert(rows(eng.tableDF("d", "mor_d")) == want, "Delta MOR read diverges")
    assert(rows(eng.tableDF("d", "mor_i")) == want, "Iceberg MOR read diverges")
    assert(eng.countRows("d", "mor_d") == want.size.toLong)
    assert(eng.countRows("d", "mor_i") == want.size.toLong)
    // both roll back with one logical restore
    eng.restoreDeltaTable("d", "mor_d", 1)
    eng.rollbackIcebergTable("d", "mor_i", 1)
    assert(rows(eng.tableDF("d", "mor_d")) == rows(eng.tableDF("d", "mor_i")))
    assert(eng.tableDF("d", "mor_d").count() == 100)
  }

  test("rolling back the same mutation returns all three formats to the identical state") {
    // The cross-format leg the per-format rollback specs (g37/g38/g39
    // in isolation) can't see: same rows, same logical mutation, one
    // logical rollback each — the three readers must agree
    // row-for-row again, and Delta's re-added files must keep their
    // stats so file skipping survives the restore
    // (DeltaLog.restore's skipping-survives claim, asserted
    // behaviorally below via the scan's numFiles metric).
    val sp = Shim.classic(spark)
    import sp.implicits._
    val stamp = System.nanoTime()
    val cat = new FixtureCatalog()
    val eng = new GlueTableEngine(spark, cat)

    def base = (0L until 100L).map(k => (k, s"r$k")).toDF("k", "v").coalesce(2)
    def appendBatch = (100L until 150L).map(k => (k, s"r$k")).toDF("k", "v").coalesce(1)
    def upsertBatch = (0L until 10L).map(k => (k, s"u$k")).toDF("k", "v").coalesce(1)
    val deltaLoc = s"/root/repo/target/lhroll_d_$stamp"

    eng.writeDeltaTable(base, "d", "roll_d", deltaLoc)
    eng.writeIcebergTable(base, "d", "roll_i", s"/root/repo/target/lhroll_i_$stamp")
    eng.writeHudiTable(base, "d", "roll_h", s"/root/repo/target/lhroll_h_$stamp")
    eng.appendDeltaTable(appendBatch, "d", "roll_d")
    eng.appendIcebergTable(appendBatch, "d", "roll_i")
    eng.appendHudiTable(appendBatch, "d", "roll_h")
    val preMutation = expect(0L until 150L, Set.empty, Set.empty)

    // the mutation being rolled back: row-level upsert of keys 0..9,
    // expressed in each format's native shape (Delta MERGE rewrites
    // the stats-intersecting files; Hudi native upsert; Iceberg the
    // one-snapshot MOR merge)
    eng.mergeDelta("d", "roll_d", upsertBatch, "k")
    eng.upsertHudi("d", "roll_h", upsertBatch, "k")
    eng.mergeIceberg("d", "roll_i", upsertBatch, "k")
    val mutated = expect(0L until 150L, (0L until 10L).toSet, Set.empty)
    Seq("roll_d", "roll_i", "roll_h").foreach { t =>
      assert(rows(eng.tableDF("d", t)) == mutated, s"$t diverges after upsert") }

    // one LOGICAL rollback each — and since every format's upsert is
    // now one commit, one PHYSICAL version each too
    eng.restoreDeltaTable("d", "roll_d", 1)
    eng.rollbackIcebergTable("d", "roll_i", 1)
    eng.rollbackHudiTable("d", "roll_h", 1)
    Seq("roll_d", "roll_i", "roll_h").foreach { t =>
      assert(rows(eng.tableDF("d", t)) == preMutation, s"$t diverges after rollback") }
    Seq("roll_d", "roll_i", "roll_h").foreach { t =>
      assert(eng.countRows("d", t) == preMutation.size.toLong, s"$t countRows after rollback") }

    // Delta's restore re-added the MERGE-removed files: the restore
    // commit itself (latest log JSON) must carry stats on every add
    // action it publishes
    val logDir = new java.io.File(s"$deltaLoc/_delta_log")
    val lastCommit = logDir.listFiles().filter(_.getName.matches("\\d{20}\\.json"))
      .maxBy(_.getName)
    val addLines = scala.io.Source.fromFile(lastCommit).getLines()
      .filter(_.contains("\"add\"")).toSeq
    assert(addLines.nonEmpty, "restore commit re-added no files")
    assert(addLines.forall(_.contains("\"stats\"")),
      "restore dropped stats from re-added files")
    // ...and skipping still prunes: k >= 100 lives in exactly the one
    // appended file (of 3 live files)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = eng.query("SELECT k, v FROM glue.d.roll_d WHERE k >= 100")
      assert(df.collect().length == 50)
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      assert(scans.head.metrics("numFiles").value == 1,
        s"stats skipping broke after restore: scanned ${scans.head.metrics("numFiles").value} files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
