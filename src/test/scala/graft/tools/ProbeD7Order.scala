package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Dev-only: time the two AllPairs prefix orders at a scale factor —
  * the evidence behind making the df-ascending order the default
  * (measured at sf1 on the flat fixture: hash 475.5s, df 302.1s;
  * at sf0.1: hash 6.4s, df 5.5s).
  */
object ProbeD7Order {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 2
    val threshold = if (args.length > 2) args(2).toDouble else 0.5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[d7order] docs=${docs.count()} n=$n t=$threshold")
    def time(label: String)(f: => Long): Unit = {
      val t = System.nanoTime()
      val c = f
      println(f"[d7order] $label: ${(System.nanoTime() - t) / 1e9}%.2f s (pairs=$c)")
    }
    time("hash-order ")(Dedup.prefixJaccardPairs(docs, n, threshold).count())
    System.gc()
    time("df-ordered ")(Dedup.ngramJaccardPairsDfOrdered(docs, n, threshold).count())
    spark.stop()
  }
}
