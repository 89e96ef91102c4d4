package graft.tools

import graft.catalog.FixtureCatalog
import graft.engine.GlueTableEngine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off debug probe for the g68 partitioned-Delta DV changelog:
  * prints the per-version file/DV key forms for the space-holding
  * partition to localize an encoding mismatch.
  */
object G68Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val eng = new GlueTableEngine(spark, new FixtureCatalog())
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val loc = s"/root/repo/target/g68probe_${System.nanoTime()}"
    eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0),
      "default", "g68p", loc, partitionBy = Seq("o_orderpriority"))
    eng.appendDeltaTable(o.filter(col("o_orderkey") % 2 === 1), "default", "g68p")
    eng.deleteDeltaWhereMor("default", "g68p", col("o_orderkey") % 10 === 0)
    val fromFiles = eng.files("default", "g68p", 2).map(_.path)
    val toFiles = eng.files("default", "g68p", 0).map(_.path)
    println("FROM files with NOT:")
    fromFiles.filter(_.contains("NOT")).foreach(p => println(s"  $p"))
    println("TO files with NOT:")
    toFiles.filter(_.contains("NOT")).foreach(p => println(s"  $p"))
    val resolver = new graft.listing.DeltaLogResolver(spark)
    val dvFrom = resolver.deletionVectors(loc, 2)
    val dvTo = resolver.deletionVectors(loc, 0)
    println(s"dvFrom size=${dvFrom.size}")
    dvFrom.keys.toSeq.sorted.foreach(k => println(s"  F $k"))
    println(s"dvTo size=${dvTo.size}")
    dvTo.keys.toSeq.sorted.foreach(k => println(s"  T $k"))
    val ch = eng.deltaChanges("default", "g68p", 2, 0)
    ch.groupBy("_change_type", "o_orderpriority").count()
      .orderBy("_change_type", "o_orderpriority").show(30, false)
    spark.stop()
  }
}
