package graft

import graft.fixtures.TestFixtures
import graft.resolve.{GlueResolutionRule, GlueSparkExtension}
import org.apache.spark.sql.graft.Shim
import org.scalatest.funsuite.AnyFunSuite

/** The injected-resolution-rule path (SURVEY.md §7.6): the rule must
  * resolve glue relations inside arbitrary plans, matching the engine
  * facade's results.
  */
class ResolutionRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRule[T](f: GlueResolutionRule => T): T = {
    GlueResolutionRule.engineFactory = s => TestFixtures.engineFor(s, TestSpark.sfDir)
    try f(new GlueResolutionRule(spark))
    finally GlueResolutionRule.engineFactory = null
  }

  test("rule resolves glue relations in a parsed plan") {
    withRule { rule =>
      val plan = Shim.parsePlan(spark,
        "SELECT l_returnflag, count(*) AS n FROM glue.default.lineitem_part GROUP BY l_returnflag")
      val resolved = rule.apply(plan)
      val n = Shim.ofRows(spark, resolved).count()
      assert(n == 3) // A, N, R
    }
  }

  test("rule handles joins of glue and non-glue relations") {
    withRule { rule =>
      spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet").createOrReplaceTempView("orders_local")
      val plan = Shim.parsePlan(spark,
        """SELECT count(*) AS n FROM glue.default.lineitem_part l
          |JOIN orders_local o ON l.l_orderkey = o.o_orderkey""".stripMargin)
      val n = Shim.ofRows(spark, rule.apply(plan)).collect().head.getLong(0)
      val want = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet").count()
      assert(n == want) // every lineitem row joins exactly one order
    }
  }

  test("rule prunes projected (non key=value) layouts like the engine path") {
    withRule { rule =>
      val sql = "SELECT count(*) AS n FROM glue.default.docs_by_lang WHERE lang = 'fr'"
      val viaRule = Shim.ofRows(spark, rule.apply(Shim.parsePlan(spark, sql)))
      val viaEngine = TestFixtures.engineFor(spark, TestSpark.sfDir).query(sql)
      // identical result AND identical scanned-file set: the rule path
      // must file-prune projection layouts, not just compute correctly
      assert(viaRule.collect().head.getLong(0) == viaEngine.collect().head.getLong(0))
      assert(viaRule.inputFiles.nonEmpty && viaRule.inputFiles.forall(_.contains("/fr/")))
      assert(viaRule.inputFiles.sorted.toSeq == viaEngine.inputFiles.sorted.toSeq)
    }
  }

  test("rule is inert without an engine factory") {
    GlueResolutionRule.engineFactory = null
    val rule = new GlueResolutionRule(spark)
    val plan = Shim.parsePlan(spark, "SELECT * FROM glue.default.lineitem_part")
    assert(rule.apply(plan) eq plan)
  }

  test("extension class wires the rule (smoke)") {
    // getOrCreate() reuses the shared session, so full withExtensions
    // coverage needs a fresh JVM; assert the extension instantiates
    // and is callable against an extensions registrar.
    val ext = new GlueSparkExtension
    val reg = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(reg) // must not throw
  }
}
