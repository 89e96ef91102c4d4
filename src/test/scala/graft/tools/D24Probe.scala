package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage split for d24 containmentPairs: signature checkpoint vs
  * df-ordered prefix vs candidate join+agg vs verification.
  */
object D24Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d24] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      time("full") { graft.operators.Dedup.containmentPairs(docs, 5, 0.8).count() }
      // stage replication (kept in sync with containmentPairs)
      import org.apache.spark.sql.expressions.Window
      import graft.functions.CrossHash.sortedShingleHashes64Fast
      val base = time("base-ckpt") {
        val b = docs.repartition(32, col("doc_id")).select(
          col("doc_id"),
          sortedShingleHashes64Fast(col("text"), 5).as("hs"))
          .withColumn("nh", size(col("hs")))
          .filter(col("nh") > 0)
          .localCheckpoint()
        b.count(); b
      }
      val plen = (col("nh") - ceil(col("nh") * lit(0.8) - lit(1e-9)) + lit(1)).cast("int")
      val exploded = base.select(col("doc_id"), col("nh"), explode(col("hs")).as("h"))
      val dfCounts = exploded.groupBy("h").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy(col("df"), col("h"))
      val pref = exploded.join(dfCounts, "h")
        .withColumn("p", row_number().over(w) - lit(1))
        .filter(col("p") < plen)
        .select(col("doc_id").as("a"), col("nh").as("na"), col("p").as("pa"), col("h"))
        .repartition(32, col("h"))
      time("prefix") { pref.count() }
      val posting = base.select(col("doc_id").as("b"), explode(col("hs")).as("h"))
        .repartition(32, col("h"))
      val cand = pref.join(posting.hint("SHUFFLE_MERGE"), Seq("h"))
        .filter(col("a") =!= col("b"))
        .select("a", "b", "na", "pa")
        .repartition(32, col("a"), col("b"))
        .groupBy("a", "b", "na")
        .agg(count(lit(1)).as("c"), max(col("pa")).as("pam"))
        .filter(col("c") + (col("na") - col("pam") - lit(1)) >=
          ceil(col("na") * lit(0.8) - lit(1e-9)))
        .select("a", "b", "na")
      time("cand") { cand.count() }
    }
    spark.stop()
  }
}
