package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    graft.fixtures.TestFixtures.engineFor(spark, sf)
    args.foreach { q =>
      println(s"[plan] ===== $q =====")
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      plan.split('\n').take(45).foreach(l => println("[plan] " + l))
    }
    spark.stop()
  }
}
