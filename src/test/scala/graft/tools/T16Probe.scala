package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc measurement harness for the t16 BPE trainer (r12 ask #1):
  * sampled-vs-full training time and merge-table agreement at a given
  * scale factor. Not part of the gate; results land in
  * bench_history/NOTES.md.
  */
object T16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.operators.TextAnalysis.bpeTrainSampled(docs, 20, 1000) // warm
    var t0 = System.nanoTime()
    val sampled = graft.operators.TextAnalysis.bpeTrainSampled(docs, 20, 1000)
    val dtS = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    graft.operators.TextAnalysis.bpeApplyStats(docs, sampled.map(_._1)).count()
    val dtA = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val full = graft.operators.TextAnalysis.bpeTrain(docs.select("text"), 20)
    val dtF = (System.nanoTime() - t0) / 1e9
    println(f"TRAIN_SAMPLED=$dtS%.2f s  APPLY=$dtA%.2f s  TRAIN_FULL=$dtF%.2f s")
    println("SAMPLED_RULES=" + sampled.map { case ((a, b), n) => s"$a+$b:$n" }.mkString(","))
    println("FULL_RULES=" + full.map { case ((a, b), n) => s"$a+$b:$n" }.mkString(","))
    val s1 = sampled.map(_._1).toSet
    val f1 = full.map(_._1).toSet
    val prefix = sampled.map(_._1).zip(full.map(_._1)).takeWhile { case (a, b) => a == b }.size
    println(s"OVERLAP=${(s1 & f1).size}/20  PREFIX_AGREE=$prefix")
    spark.stop()
  }
}
