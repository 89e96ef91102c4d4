package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B harness for the streaming family: every (config,
  * query) cell runs inside ONE JVM with configs ALTERNATING per rep,
  * so host box-speed drift (measured r14: a load spike turned the
  * same code 36 s -> 8 s between separate sbt runs) lands on every
  * config equally instead of poisoning one column.
  *
  *   Test/runMain graft.tools.StreamAB st11_stream_outer_join,... [reps]
  *
  * Configs: trigger granularity (1 vs 2 files per micro-batch) x
  * state store (rocksdb+changelog vs in-memory provider), switched
  * via the system properties the queries/wrappers read.
  */
object StreamAB {
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
    val configs = Seq(
      ("t1_rocks", "1", "rocksdb"),
      ("t2_rocks", "2", "rocksdb"),
      ("t1_mem", "1", "memory"),
      ("t2_mem", "2", "memory"))
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    // one untimed warm pass (codegen, fixture staging)
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count())
    (1 to reps).foreach { rep =>
      configs.foreach { case (tag, fpt, store) =>
        sys.props("graft.stream.filesPerTrigger") = fpt
        sys.props("graft.stream.stateStore") = store
        names.foreach { n =>
          val t0 = System.nanoTime()
          val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          acc((n, tag)) = dt :: acc.getOrElse((n, tag), Nil)
          println(f"AB $n%-28s $tag%-9s rep$rep $dt%6.2f s ($cnt rows)")
        }
      }
    }
    println("== medians ==")
    names.foreach { n =>
      val row = configs.map { case (tag, _, _) =>
        val v = acc((n, tag)).sorted
        f"$tag=${v(v.size / 2)}%5.2f"
      }.mkString("  ")
      println(f"AB-MEDIAN $n%-28s $row")
    }
    sys.props.remove("graft.stream.filesPerTrigger")
    sys.props.remove("graft.stream.stateStore")
    spark.stop()
  }
}
