package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan evidence for the ITERATIVE graph operators (q47/q48/q51/q53/
  * q54/q55): their registered queries return collected results (a
  * LocalRelation plan), so this probe materializes the SAME per-round
  * frames the operator loop builds and dumps the round's
  * `.explain("formatted")`. Each frame below is constructed exactly
  * like the operator's round body at the current commit — when the
  * operator changes, this probe is updated in the same commit, so the
  * before/after pair in plans/r16 tracks the code.
  *
  * Usage: Test/runMain graft.tools.GraphPlanProbe <tag> [outDir]
  */
object GraphPlanProbe {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = if (args.length > 1) args(1) else "plans/r16"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: DataFrame, note: String): Unit = {
      // run the frame first so AQE finalizes, then capture the
      // executed plan (exchange/join shapes as actually run)
      df.write.format("noop").mode("overwrite").save()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val executed = df.queryExecution.executedPlan.toString
      val body = s"# $name — $note (tag=$tag, sf=$sfDir)\n" +
        "## explain(formatted), post-AQE-initial\n" + formatted +
        "\n## executedPlan (AQE final)\n" + executed + "\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        body.getBytes("UTF-8"))
      println(s"[graphplan] wrote $outDir/${name}_$tag.txt")
    }

    val events = graft.fixtures.TestFixtures.events(spark, sfDir)
    graft.operators.EventAnalytics.dumpRoundPlans(events, (n, df, note) => dump(n, df, note))
    spark.stop()
  }
}
