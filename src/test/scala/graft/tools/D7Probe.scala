package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-only: d7 pair density + timing on a corpus sample. */
object D7Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val sample = if (args.length > 1) args(1).toInt else 2000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod(hash(col("doc_id")), lit(1000)) < lit(sample * 1000L / 50000))
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, 2, 0.5).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[d7probe] sfDir=$sfDir nDocs=$nDocs pairs=$pairs time=$dt%.1f s " +
      f"density=${pairs.toDouble / (nDocs.toDouble * nDocs / 2)}%.3e")
    spark.stop()
  }
}
