package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: run a single SparkEntry query in isolation (fresh JVM,
  * same session conf as Bench) to separate a query's intrinsic cost
  * from suite-level effects (GC pressure, page-cache state).
  *
  * Usage: runMain graft.RunOne <query> [sfDir] [reps]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("GRAFT_PAIR_MULT").foreach(m => spark.conf.set("graft.pair.partitions.mult", m))
    graft.fixtures.TestFixtures.engineFor(spark, sfDir)
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[runone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
