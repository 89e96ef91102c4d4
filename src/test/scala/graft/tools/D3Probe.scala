package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.CrossHash._

/** Dev-only: stage split for d3_dedup_minhash (= ngramJaccardPairs at
  * n=3, t=0.8) — times each pipeline tier cumulatively so the
  * difference isolates the tier (r16 verdict next #2: find where the
  * 35 s at sf1 actually goes before restructuring anything).
  * Lives in graft.operators to reach the private pieces.
  */
object D3Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val t = if (args.length > 2) args(2).toDouble else 0.8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    val sc = spark.sparkContext
    def sweep(): Unit = {
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val c = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[d3probe] $label%-28s $dt%7.2f s (rows=$c)")
      dt
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (rep <- 1 to 2) {
      println(s"[d3probe] === rep $rep sf=$sfDir n=$n t=$t ===")
      sweep()
      time("count")(docs.count())
      time("dfStats pass (disp)")(
        docs.select(col("doc_id"), col("text")).repartition(32, col("doc_id"))
          .select(explode(sortedShingleHashes64Fast(col("text"), n)).as("h"))
          .agg(count(lit(1)).as("e"), approx_count_distinct("h").as("v")).count())
      val base = docs.select(col("doc_id"), col("text")).repartition(32, col("doc_id"))
        .select(col("doc_id"), sortedShingleHashes64Fast(col("text"), n).as("hs"))
        .withColumn("nh", size(col("hs"))).persist()
      time("base materialize")(base.count())
      val plen = (col("nh") - ceil(col("nh") * lit(t) - lit(1e-9)) + lit(1)).cast("int")
      val exploded = base.select(col("doc_id"), col("nh"), explode(col("hs")).as("h"))
      val dfCounts = exploded.groupBy("h").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy(col("df"), col("h"))
      val pref = exploded.join(dfCounts.hint("shuffle_hash"), "h")
        .withColumn("p", row_number().over(w) - lit(1))
        .filter(col("p") < plen)
        .select("doc_id", "nh", "p", "h")
        .repartition(32, col("h"))
        .persist()
      time("prefix frame (df+win)")(pref.count())
      val matches = pref
        .select(col("h"), col("p").as("pa"), col("doc_id").as("a"), col("nh").as("na"))
        .join(pref.select(col("h"), col("p").as("pb"), col("doc_id").as("b"), col("nh").as("nb"))
          .hint("SHUFFLE_MERGE"), Seq("h"))
        .filter(col("a") < col("b") &&
          greatest(col("na"), col("nb")) * lit(t) <= least(col("na"), col("nb")) + lit(1e-9))
      time("match rows (no agg)")(matches.count())
      val mult = 16
      val cand = matches.select("a", "b", "na", "nb", "pa", "pb")
        .repartition(32 * mult, col("a"), col("b"))
        .groupBy("a", "b", "na", "nb")
        .agg(count(lit(1)).as("c"), max(col("pa")).as("pa"), max(col("pb")).as("pb"))
        .filter(col("c") + least(col("na") - col("pa") - lit(1), col("nb") - col("pb") - lit(1)) >=
          ceil((col("na") + col("nb")) * lit(t / (1 + t)) - lit(1e-9)))
        .select("a", "b", "na", "nb")
        .persist()
      time("cand agg+posfilter")(cand.count())
      val sh = base.select(col("doc_id"), col("hs"))
      val withA = cand.repartition(32 * mult, col("a"))
        .join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("hs", "ha")
          .repartition(32 * mult, col("a")).hint("shuffle_hash"), "a")
      val verified = withA.repartition(32 * mult, col("b"))
        .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("hs", "hb")
          .repartition(32 * mult, col("b")).hint("shuffle_hash"), "b")
        .withColumn("ov", sortedOverlapFast(col("ha"), col("hb")).cast("double"))
        .withColumn("jac", col("ov") / (col("na") + col("nb") - col("ov")))
        .filter(col("jac") >= t)
      time("verify joins")(verified.count())
      time("full operator e2e")(Dedup.minhashPairs(docs, t).count())
    }
    spark.stop()
  }
}
