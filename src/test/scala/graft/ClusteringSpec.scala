package graft

import graft.operators.Clustering
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")

  test("assignment picks the nearest centroid; exact ties take the lowest cluster") {
    val pts = Seq(
      (1L, Seq(0.0f, 0.0f)), // on centroid 0
      (2L, Seq(4.0f, 0.0f)), // on centroid 1
      (3L, Seq(2.0f, 0.0f))  // equidistant -> cluster 0
    ).toDF("vec_id", "embedding")
    val cents = Seq(Seq(0.0f, 0.0f), Seq(4.0f, 0.0f))
    val got = Clustering.assign(pts, cents).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getDouble(3))).toMap
    assert(got(1L) == (0, 0.0))
    assert(got(2L) == (1, 0.0))
    assert(got(3L) == (0, 4.0))
  }

  test("assign is a pure map: no shuffle in the plan") {
    val cents = Clustering.seedCentroids(emb, 4)
    val plan = Clustering.assign(emb, cents).queryExecution.executedPlan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, plan.toString.take(2000))
  }

  test("Lloyd iterations never increase the objective") {
    def objective(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum("dist")).head().getDouble(0)
    var cents = Clustering.seedCentroids(emb, 4)
    var prev = objective(Clustering.assign(emb, cents))
    for (_ <- 1 to 3) {
      cents = Clustering.update(Clustering.assign(emb, cents), cents)
      val cur = objective(Clustering.assign(emb, cents))
      assert(cur <= prev * (1 + 1e-9), s"objective rose: $prev -> $cur")
      prev = cur
    }
  }

  test("empty clusters keep their previous centroid") {
    val pts = Seq((1L, Seq(0.0f)), (2L, Seq(0.1f))).toDF("vec_id", "embedding")
    val far = Seq(Seq(0.0f), Seq(100.0f)) // nothing lands on cluster 1
    val next = Clustering.update(Clustering.assign(pts, far), far)
    assert(next(1) == Seq(100.0f))
    assert(math.abs(next(0).head - 0.05f) < 1e-6)
  }

  test("kmeans returns a full assignment with k or fewer live clusters") {
    val (cents, assigned) = Clustering.kmeans(emb, 4, iters = 2)
    assert(cents.size == 4)
    assert(assigned.count() == emb.count())
    val used = assigned.select("cluster").distinct().collect().map(_.getInt(0)).toSet
    assert(used.subsetOf((0 until 4).toSet))
  }
}
