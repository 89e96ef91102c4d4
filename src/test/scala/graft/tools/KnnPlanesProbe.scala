package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off scale probe: kNN-graph blocking resolution vs corpus size
  * (the s22 knob). Usage: Test/runMain graft.tools.KnnPlanesProbe [planes...]
  */
object KnnPlanesProbe {
  def main(args: Array[String]): Unit = {
    val planes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(6, 8, 10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf3")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    planes.foreach { p =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val cnt = graft.operators.Similarity.knnGraph(emb, 3, p).count()
        println(f"KNNPROBE n=$n planes=$p rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt edges)")
      }
    }
    spark.stop()
  }
}
