package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for engine/runtime behaviors (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 1. nanosecond timestamps via legacy nanosAsLong?
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      val tsUs =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts div 1000"))
        else col("ts").cast("timestamp")
      ev.select(col("event_id"), col("ts"), tsUs.as("ts_us"))
        .orderBy("event_id").show(3, false)
    } catch { case e: Throwable => println("EVENTS READ FAILED: " + e.toString.take(500)) }
    // 2. split semantics
    spark.sql(
      """SELECT split('ab c', '') AS chars, split('a b ', ' ') AS toks,
        |  ascii(' ') AS sp,
        |  aggregate(transform(split('abc',''), c -> cast(ascii(c) AS BIGINT)),
        |            0L, (a, c) -> (a * 31 + c) % 1000000007) AS foldhash
        |""".stripMargin).show(false)
    spark.stop()
  }
}
