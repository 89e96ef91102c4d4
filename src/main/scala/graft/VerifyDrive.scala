package graft

import graft.catalog.FixtureCatalog
import graft.engine.GlueTableEngine
import graft.model.{ColumnDef, GlueTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only end-to-end drive of the engine library (not part of the API). */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fixture: hive-partitioned copy of lineitem + plain orders dir
    val root = "/root/repo/target/verifydrive"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(s"$root/lineitem_part")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .repartition(2).write.mode("overwrite").parquet(s"$root/orders_flat")

    val cat = new FixtureCatalog()
      .register(GlueTable("default", "lineitem_part", Some(s"$root/lineitem_part"),
        partitionKeys = Seq(ColumnDef("l_returnflag"))))
      .register(GlueTable("default", "orders", Some(s"$root/orders_flat")))
      .register(GlueTable("default", "empty_tbl", Some(s"$root/empty_dir")))
    new java.io.File(s"$root/empty_dir").mkdirs()

    val engine = new GlueTableEngine(spark, cat)

    println("== [1] pruned scan via SQL ==")
    val q1 = engine.query(
      "SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS q FROM glue.default.lineitem_part " +
      "WHERE l_returnflag = 'A' GROUP BY l_returnflag")
    q1.show()
    println("expected count: " + li.filter(col("l_returnflag") === "A").count())

    println("== [2] pruned file list (reference files-variable analog) ==")
    val pf = engine.prunedFiles("default", "lineitem_part", Seq(col("l_returnflag") === "A"))
    println(s"pruned files: ${pf.size} of ${engine.files("default", "lineitem_part").size} total")
    pf.foreach(p => println("  " + p))

    println("== [3] glue x glue join ==")
    engine.query(
      """SELECT o.o_orderpriority, count(*) AS n
        |FROM glue.default.lineitem_part l JOIN glue.default.orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_returnflag = 'R' GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin).show()

    println("== [4] physical plan of pruned query (scan should list only A files) ==")
    println(q1.queryExecution.executedPlan.toString.take(1500))

    println("== [5] setupFor registers GLUE__ views ==")
    println(engine.setupFor("SELECT * FROM glue.default.orders"))
    println("via view: " + spark.sql("SELECT count(*) AS n FROM GLUE__default_orders").collect().head)

    println("== [6] empty table ==")
    engine.query("SELECT count(*) AS n FROM glue.default.empty_tbl").show()

    println("== [7] error surfaces ==")
    def expectErr(label: String)(f: => Any): Unit =
      try { f; println(s"$label: NO ERROR (unexpected)") }
      catch { case e: Throwable => println(s"$label: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
    expectErr("missing table")(engine.query("SELECT * FROM glue.default.nope").collect())
    expectErr("4-part ref")(engine.query("SELECT * FROM glue.a.b.c").collect())

    println("== [8] cache single-fetch + invalidation ==")
    println("fetches so far: " + cat.fetchCount.get())
    engine.tableMetadata("default", "orders"); engine.tableMetadata("default", "orders")
    println("after 2 more metadata calls (should be unchanged): " + cat.fetchCount.get())
    engine.invalidateTable("default", "orders")
    engine.tableMetadata("default", "orders")
    println("after invalidate + call (should be +1): " + cat.fetchCount.get())

    spark.stop()
  }
}
