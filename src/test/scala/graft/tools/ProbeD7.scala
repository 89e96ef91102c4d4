package graft

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: dump d7's final adaptive plan + per-stage task counts. */
object ProbeD7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks, ms.getOrElse(-1L)))
      }
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm
    Dedup.ngramJaccardPairs(docs, 2, 0.5).count()
    stages.clear()
    val df = Dedup.ngramJaccardPairs(docs, 2, 0.5)
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[d7] warm run: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    Thread.sleep(500)
    stages.sortBy(_._1).foreach { case (id, name, tasks, ms) =>
      println(f"[stage] $id%3d tasks=$tasks%3d ${ms}%6d ms  $name")
    }
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate")
        || l.contains("AQEShuffleRead") || l.contains("Sort") || l.contains("Scan"))
      .mkString("\n"))
    spark.stop()
  }
}
