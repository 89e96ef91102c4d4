package graft

import org.apache.spark.sql.SparkSession

/** Prints the physical plan of each named query (default: all) at
  * sf0.001 — the iterate-on-the-plan loop: run after adding an
  * operator and read for unintended shuffles, missed broadcasts,
  * single-partition windows, and codegen breaks.
  *
  * Usage: runMain graft.PlanAudit [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      println(s"===== $q =====")
      try println(SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan.toString.take(4000))
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
