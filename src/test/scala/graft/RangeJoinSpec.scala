package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed range join equals the naive theta join, one row per containment") {
    val intervals = Seq(
      (1L, 100L, 250L),  // spans 3 cells at w=100
      (2L, 240L, 260L),  // straddles a cell edge
      (3L, 500L, 500L)   // degenerate point-interval
    ).toDF("interval_id", "lo", "hi")
    val points = (0L to 600L by 10).map(t => (t, t)).toDF("event_id", "t")
    val got = RangeJoin.pointInInterval(intervals, points, bucketWidth = 100)
      .select("interval_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = intervals.as("i").join(points.as("p"),
        col("p.t") >= col("i.lo") && col("p.t") <= col("i.hi"))
      .select("interval_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == want.sorted)
    // multi-cell intervals must not duplicate containments
    assert(got.size == got.distinct.size)
    assert(got.count(_._1 == 3L) == 1) // the degenerate interval matches its point once
  }

  test("the plan is an equi-join on the grid cell, not a nested loop") {
    val intervals = Seq((1L, 100L, 250L)).toDF("interval_id", "lo", "hi")
    val points = (0L to 600L by 10).map(t => (t, t)).toDF("event_id", "t")
    val plan = RangeJoin.pointInInterval(intervals, points, bucketWidth = 100)
      .queryExecution.executedPlan
    val nested = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(nested.isEmpty, plan.toString.take(2000))
  }
}
