package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan audit: prints the physical-plan facts that matter at
  * scale (pushed filters, read schemas, join strategies, partition
  * filters) for representative queries.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing_summary",  // filter pushdown + column pruning
      "q2_filter_in",        // compound predicate pushdown
      "q3_segment_revenue",  // join strategy for fact x dims
      "q4_region_balance",   // broadcast hints
      "g1_glue_prune",       // partition pruning via engine
      "d7_ngram_jaccard",    // inverted-index join shape
      "s1_ann_brute",        // broadcast of query vector
      "s4_bm25",             // broadcast df/stats, single posting shuffle
      "d10_sample_hash",     // filter pushes to the scan
      "d11_dedup_incremental") // probe-vs-index prefix join

    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      println(s"\n===== $name =====")
      plan.linesIterator
        .filter(l => l.contains("FileScan") || l.contains("Join") ||
          l.contains("Exchange") || l.contains("HashAggregate") && false)
        .map(_.trim.take(360))
        .foreach(l => println("  " + l))
    }
    spark.stop()
  }
}
