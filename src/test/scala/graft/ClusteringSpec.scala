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

  test("PCA: Jacobi eigen on a known 2x2; fit recovers a planted dominant axis") {
    import graft.operators.Pca
    // [[2,1],[1,2]] has eigenpairs 3 -> (1,1)/sqrt2, 1 -> (1,-1)/sqrt2
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val hi = if (vals(0) > vals(1)) 0 else 1
    assert(math.abs(vals(hi) - 3.0) < 1e-9 && math.abs(vals(1 - hi) - 1.0) < 1e-9)
    val v = Array(vecs(0)(hi), vecs(1)(hi))
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(v(0) - v(1)) < 1e-9, "dominant eigenvector is the (1,1) axis")

    // planted data: variance 100x larger along (1,1,0..) than elsewhere
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { _ =>
      val t = rnd.nextGaussian() * 10.0
      val noise = Array.fill(4)(rnd.nextGaussian() * 0.1)
      Seq(t + noise(0), t + noise(1), noise(2), noise(3))
    }
    val df = rows.map(Tuple1(_)).toDF("e")
    val model = Pca.fit(df, "e", k = 2)
    // top component aligns with (1,1,0,0)/sqrt2 (sign-free)
    val c0 = model.components(0)
    assert(math.abs(math.abs(c0(0)) - math.sqrt(0.5)) < 0.02, c0.toSeq.toString)
    assert(math.abs(c0(0) - c0(1)) < 0.02)
    assert(math.abs(c0(2)) < 0.05 && math.abs(c0(3)) < 0.05)
    assert(model.eigenvalues(0) > 50 * model.eigenvalues(1),
      s"planted axis must dominate: ${model.eigenvalues.toSeq}")

    // transform: k dot products per row, mean folded into the offset --
    // projections are centered (column means ~ 0)
    val proj = Pca.transform(df, "e", model)
      .select(element_at(col("pca"), 1).as("p0"), element_at(col("pca"), 2).as("p1"))
    val means = proj.agg(avg("p0"), avg("p1")).head()
    assert(math.abs(means.getDouble(0)) < 1e-6 && math.abs(means.getDouble(1)) < 1e-6)
    // and the projection preserves the planted variance ordering
    val vars = proj.agg(var_pop("p0"), var_pop("p1")).head()
    assert(vars.getDouble(0) > 50 * vars.getDouble(1))
  }

  test("PCA on the fixture embeddings: components are orthonormal") {
    import graft.operators.Pca
    val model = Pca.fit(emb, "embedding", k = 4)
    for (i <- 0 until 4; j <- i until 4) {
      val dot = model.components(i).zip(model.components(j)).map { case (a, b) => a * b }.sum
      if (i == j) assert(math.abs(dot - 1.0) < 1e-6)
      else assert(math.abs(dot) < 1e-6, s"components $i,$j not orthogonal: $dot")
    }
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
  }

  test("PCA-reduced ANN keeps most full-dimension neighbors (the OPQ-lite path)") {
    import graft.operators.{Pca, Similarity}
    import graft.functions.VectorFunctions
    val model = Pca.fit(emb, "embedding", k = 32)
    val reduced = Pca.transform(emb, "embedding", model)
      .select(col("vec_id"), col("pca").cast("array<float>").as("embedding"))
    def topk(df: org.apache.spark.sql.DataFrame, q: Long, k: Int): Set[Long] = {
      val qe = df.filter(col("vec_id") === q).select(col("embedding").as("qe"))
      df.filter(col("vec_id") =!= q).crossJoin(broadcast(qe))
        .select(col("vec_id"),
          VectorFunctions.cosineFast(col("embedding"), col("qe")).as("cos"))
        .orderBy(desc("cos"), col("vec_id")).limit(k)
        .collect().map(_.getLong(0)).toSet
    }
    val recalls = Seq(3L, 17L, 101L).map { q =>
      val full = topk(emb.select(col("vec_id"), col("embedding")), q, 10)
      val red = topk(reduced, q, 10)
      full.intersect(red).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"32-of-64-dim PCA recall@10 too low: $recalls")
  }
}
