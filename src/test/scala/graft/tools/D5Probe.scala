package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.CrossHash._

/** Dev-only: stage split for d5_dedup_simhash (band-LSH pigeonhole at
  * 4x12-bit bands) — signature pass vs band join vs dist filter vs
  * final global sort (r16 verdict next #3).
  */
object D5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxDist = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    def sweep(): Unit = {
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val c = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[d5probe] $label%-28s $dt%7.2f s (rows=$c)")
      dt
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (rep <- 1 to 2) {
      println(s"[d5probe] === rep $rep sf=$sfDir maxDist=$maxDist ===")
      sweep()
      time("signatures")(
        docs.select(col("doc_id"), col("text")).repartition(32, col("doc_id"))
          .select(col("doc_id"), simhashFast(col("text")).as("sim")).count())
      val sigs = docs.select(col("doc_id"), col("text")).repartition(32, col("doc_id"))
        .select(col("doc_id"), simhashFast(col("text")).as("sim"))
      val banded = sigs.select(col("doc_id"), col("sim"),
        posexplode(array((0 until SimhashBands).map { i =>
          shiftright(col("sim"), i * SimhashBandBits).bitwiseAND(lit((1 << SimhashBandBits) - 1))
        }: _*)).as(Seq("band", "v")))
        .repartition(32, col("band"), col("v"))
        .persist()
      time("banded materialize")(banded.count())
      val a = banded.select(col("band"), col("v"), col("doc_id").as("a"), col("sim").as("sa"))
      val b = banded.select(col("band"), col("v"), col("doc_id").as("b"), col("sim").as("sb"))
      val raw = a.join(b, Seq("band", "v")).filter(col("a") < col("b"))
      time("band join (a<b rows)")(raw.count())
      def bandVal(c: org.apache.spark.sql.Column, i: Int) =
        shiftright(c, i * SimhashBandBits).bitwiseAND(lit((1 << SimhashBandBits) - 1))
      val firstMatch = (0 until SimhashBands).foldRight(lit(-1): org.apache.spark.sql.Column) {
        (i, acc) => when(bandVal(col("sa"), i) === bandVal(col("sb"), i), lit(i)).otherwise(acc)
      }
      val pairs = raw.filter(col("band") === firstMatch)
        .withColumn("dist", bit_count(col("sa").bitwiseXOR(col("sb"))))
        .filter(col("dist") <= maxDist)
        .select("a", "b", "dist")
      time("dedup+dist filter")(pairs.count())
      time("with final orderBy")(pairs.orderBy("a", "b").count())
      time("full operator e2e")(Dedup.simhashPairs(docs, maxDist).count())
    }
    spark.stop()
  }
}
