package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc scaling probe for d26 (exact edit-distance pairs, r12 ask
  * #4): per-tier candidate counts + end-to-end time at a given scale
  * factor, so the sf1→sf3 curve is explained by measured admissions
  * rather than guessed. Not part of the gate; results land in
  * bench_history/NOTES.md.
  */
object D26Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"SF_DIR=$sfDir N_DOCS=${docs.count()}")
    val (c1, c2, c3, base, mult) = graft.operators.Dedup.editDistanceTiers(docs, 4)
    // tier-3 population: docs short on both gram scales
    import org.apache.spark.sql.functions._
    val tiny = base.filter(col("n5") < lit(4 * 6 + 1) && col("n3") < lit(4 * 4 + 1))
    println(s"TINY_DOCS=${tiny.count()} TINY_DISTINCT_TEXTS=${tiny.select("text").distinct().count()}")
    // NOTE: since the r12 inline-verify change, c3 counts tier 3's
    // VERIFIED pairs (its candidates never materialize as rows)
    val n1 = c1.count(); val n2 = c2.count(); val n3 = c3.count()
    val cand = c1.union(c2).distinct()
    val nc = cand.count()
    val pairs = graft.operators.Dedup.editDistanceVerify(cand, base, mult, 4)
      .union(c3).distinct().count()
    println(s"TIER1=$n1 TIER2=$n2 TIER3_VERIFIED=$n3 DISTINCT12=$nc PAIRS=$pairs MULT=$mult")
    base.unpersist()
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.editDistancePairs(docs, 4).count()
      println(f"REP$r=${(System.nanoTime() - t0) / 1e9}%.2f s ($n pairs)")
    }
    spark.stop()
  }
}
