package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: pinpoint where EventAnalytics.hits spends time. */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = org.apache.spark.sql.graft.Shim.classic(spark)
    import sp.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val ev = Seq(
      (1L, "view", ts(1), """{"k": 7}"""), (2L, "view", ts(1), """{"k": 7}"""),
      (3L, "view", ts(1), """{"k": 7}"""), (4L, "view", ts(1), """{"k": 7}"""),
      (1L, "view", ts(2), """{"k": 2}"""),
      (9L, "purchase", ts(1), """{"k": 7}""")
    ).toDF("user_id", "event_type", "ts", "props")
    Seq(1, 2, 5, 5).foreach { it =>
      val t0 = System.nanoTime()
      val n = graft.operators.EventAnalytics.hits(ev, iters = it).count()
      println(f"[probe] hits(iters=$it) in ${(System.nanoTime() - t0) / 1e9}%.1f s (rows=$n)")
    }
    val out = graft.operators.EventAnalytics.hits(ev, iters = 5)
    out.show(20, truncate = false)
    spark.stop()
  }
}
