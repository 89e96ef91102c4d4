package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time the dense direct-verification Jaccard plan and dump
  * its executed plan (join-condition order matters — see
  * Dedup.denseJaccardPairs).
  */
object DenseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Dedup.denseJaccardPairs(docs, 2, 0.5)
    df.count() // warm
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[dense] ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    println(df.queryExecution.executedPlan.toString.take(3500))
    spark.stop()
  }
}
