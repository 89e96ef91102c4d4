package graft

import graft.fixtures.TestFixtures
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming extensions: a bounded file-source stream must reproduce
  * the batch query's results exactly (same events, same semantics).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A parquet dir of the events table with converted timestamps that
    * a file-source stream can read.
    */
  private lazy val streamDir: String = {
    val dir = s"${TestFixtures.root(TestSpark.sfDir)}/events_stream"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      TestFixtures.events(spark, TestSpark.sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  test("streaming near-dup ingest drops corpus dups and in-batch dups") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = s"/root/repo/target/stream_ndi_idx_${System.nanoTime()}"
    val out = s"/root/repo/target/stream_ndi_out_${System.nanoTime()}"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    graft.operators.Dedup.writeCorpusIndex(corpus, idx, n = 3, threshold = 0.8, buckets = 16)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = EventStreams.nearDupIngest(mem.toDF().toDF("doc_id", "text"), idx, out)
    try {
      // batch 1: an exact dup of corpus doc 1, and a novel doc
      mem.addData((10L, "alpha beta gamma delta epsilon zeta"),
        (11L, "seven eight nine ten eleven twelve"))
      q.processAllAvailable()
      // batch 2: a dup of batch 1's novel survivor, an in-batch dup
      // pair, and a novel doc
      mem.addData((20L, "seven eight nine ten eleven twelve"),
        (21L, "red green blue cyan magenta yellow"),
        (22L, "red green blue cyan magenta yellow"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 21L), s"got $kept")
  }

  test("streaming hourly counts equal the batch aggregation") {
    val batchDf = spark.read.parquet(streamDir)
    val stream = spark.readStream.schema(batchDf.schema).parquet(streamDir)
    val got = EventStreams.runToCompletion(
      EventStreams.hourlyCounts(stream), "hourly_out", OutputMode.Complete())
      .orderBy("h", "event_type").collect()

    val want = batchDf
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("sv"))
      .orderBy("h", "event_type").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("stateful streaming sessionization equals the batch q14 session counts") {
    import spark.implicits._
    val batchDf = spark.read.parquet(streamDir)
    val stream = spark.readStream.schema(batchDf.schema).parquet(streamDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    val got = EventStreams.runToCompletion(
      EventStreams.sessionCounts(stream).toDF(), "sess_out", OutputMode.Update())
      // Update mode emits one row per key per batch; keep the last state
      .groupBy("user_id").agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
      .orderBy("user_id").collect()

    val want = SparkEntry.queries("q14_sessionize")(spark, TestSpark.sfDir)
      .select("user_id", "n_sessions", "n_events").orderBy("user_id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("streaming dedup keeps one row per key within the watermark horizon") {
    val batchDf = spark.read.parquet(streamDir)
    // duplicate the whole stream (same event_ids arrive twice in one
    // batch) — dedup must restore the original cardinality per key
    val dupDir = s"${TestFixtures.root(TestSpark.sfDir)}/events_stream_dup"
    if (!new java.io.File(s"$dupDir/_SUCCESS").exists()) {
      batchDf.union(batchDf).write.mode("overwrite").parquet(dupDir)
    }
    val stream = spark.readStream.schema(batchDf.schema).parquet(dupDir)
    val got = EventStreams.runToCompletion(
      EventStreams.dedupStream(stream, "event_id"), "dedup_out", OutputMode.Append())
    assert(got.count() == batchDf.select("event_id").distinct().count())
    // emitted rows are a superset-free selection: distinct event_ids only
    assert(got.select("event_id").distinct().count() == got.count())
  }
}
