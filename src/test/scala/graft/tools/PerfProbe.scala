package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession

/** Dev-only performance probe for the dedup/similarity operators. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    time("d2_minhash_sig")(Dedup.minhashSignatures(docs).count())
    time("d3_dedup_minhash")(Dedup.minhashPairs(docs, 0.8).count())
    time("d4_simhash_sig")(Dedup.simhashSignatures(docs).count())
    time("d5_dedup_simhash")(Dedup.simhashPairs(docs, 3).count())
    time("d6_dedup_embedding")(Dedup.embeddingPairs(emb, 0.4).count())
    time("d7_ngram_jaccard")(Dedup.ngramJaccardPairs(docs, 2, 0.5).count())
    time("s1_ann_brute")(Similarity.bruteForceTopK(emb, 0L, 10).count())
    time("s2_ann_lsh")(Similarity.lshTopK(emb, 0L, 5).count())
    spark.stop()
  }
}
