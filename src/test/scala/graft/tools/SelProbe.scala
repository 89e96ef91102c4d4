package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.CrossHash._

/** Dev-only: print the adaptive-Jaccard selector inputs for a corpus. */
object SelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val t = if (args.length > 2) args(2).toDouble else 0.8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val st = docs.select(explode(sortedShingleHashes64Fast(col("text"), n)).as("h"))
      .agg(count(lit(1)).as("e"), approx_count_distinct("h").as("v")).collect()(0)
    val e = st.getLong(0); val v = st.getLong(1)
    val prefixRows = (1.0 - t) * e + nDocs
    println(f"[sel] n=$n t=$t nDocs=$nDocs V=$v E=$e prefixRows=$prefixRows%.0f " +
      f"estOcc=${prefixRows * prefixRows / v}%.3e quarterN2=${nDocs.toDouble * nDocs / 4}%.3e " +
      f"dense=${prefixRows * prefixRows / v > nDocs.toDouble * nDocs / 4}")
    spark.stop()
  }
}
