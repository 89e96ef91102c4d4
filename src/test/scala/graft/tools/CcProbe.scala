package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing probe for connected components: how much of
  * d8/d9's wall time is the pair generation vs the CC loop, and how
  * the loop's per-round job structure costs at a given SF.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    (1 to 3).foreach { rep =>
      val pairs = time(s"pairs rep$rep") {
        val p = Dedup.minhashPairs(docs, 0.8).localCheckpoint(); p.count(); p
      }
      time(s"cc rep$rep") { Dedup.connectedComponents(pairs).count() }
    }
    spark.stop()
  }
}
