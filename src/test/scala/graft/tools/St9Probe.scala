package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Split st9's cost: streaming CMS grid vs batch estimate audit. */
object St9Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.EventStreams
    graft.fixtures.TestFixtures.engineFor(spark, sfDir)
    for (r <- 1 to 3) {
      var t0 = System.nanoTime()
      val cells = EventStreams.withStatePartitions(spark, 8)(
        EventStreams.runToCompletion(
          EventStreams.cmsCells(EventStreams.eventsFileStream(spark, sfDir)),
          s"st9p_$r", org.apache.spark.sql.streaming.OutputMode.Complete()))
      cells.count()
      val dtS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val exact = spark.read.parquet(s"$sfDir/events.parquet")
        .groupBy(col("user_id").cast("string").as("k")).agg(count(lit(1)).as("n"))
      val probes = exact.select(col("k"), col("n"), explode(sequence(lit(0), lit(3))).as("i"))
        .withColumn("j", pmod(graft.functions.CrossHash.charFold(
          concat(col("k"), lit("#"), col("i").cast("string"))), lit(64L)))
      val n = probes.join(broadcast(cells), Seq("i", "j"))
        .groupBy("k", "n").agg(min(col("c")).as("est"))
        .orderBy(desc("est"), col("k")).limit(25).count()
      println(f"[st9probe] rep $r stream=$dtS%.2f s batch=${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
/** Batch-only grid cost over the same events. */
object St9Batch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.streaming.EventStreams.cmsCells(ev).count()
      println(f"[st9batch] rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
