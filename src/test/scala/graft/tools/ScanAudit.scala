package graft.tools

import org.apache.spark.sql.SparkSession

/** Count FileScan leaves + ReusedExchange in every registered query's
  * physical plan — flags plans that re-derive an expensive subtree
  * per consumer (the q50/t5 anti-pattern found in r16). Plan-only for
  * most queries; iterative operators execute while building (their
  * returned frame is the collected result, reported as 0/low scans).
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = args.headOption.map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.fixtures.TestFixtures.engineFor(spark, sfDir)
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .flatMap { case (n, fn) =>
        try {
          val df = fn(spark, sfDir)
          val p = df.queryExecution.executedPlan.toString
          val scans = "Scan parquet|Scan csv|Scan json|Scan orc|Scan avro|Scan xml"
            .r.findAllIn(p).size
          val reuse = "ReusedExchange".r.findAllIn(p).size
          val window = "Window".r.findAllIn(p).size
          Some((n, scans, reuse, window))
        } catch { case e: Throwable =>
          System.err.println(s"[scanaudit] $n FAILED: ${e.getClass.getSimpleName}"); None
        }
      }
    rows.sortBy(-_._2).foreach { case (n, s, r, w) =>
      println(f"[scanaudit] $n%-28s scans=$s%3d reused=$r%2d window=$w%2d")
    }
    spark.stop()
  }
}
