package graft.tools

import org.apache.spark.sql.SparkSession

/** Split a g-query's wall time into PLAN (engine.query: metadata
  * resolution, listing, rewrite, DataFrame construction) vs EXECUTE
  * (the action) — where does the g-family's per-query cost live?
  */
object GPhaseProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val cnt = df.count()
        val t2 = System.nanoTime()
        println(f"PHASE $n rep$r plan=${(t1 - t0) / 1e9}%.2f s exec=${(t2 - t1) / 1e9}%.2f s ($cnt rows)")
      }
    }
    spark.stop()
  }
}
