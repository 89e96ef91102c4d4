package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the standard
  * pre-rotation for product quantization (OPQ-lite) and the
  * dimensionality-reduction step a 100 TB embedding pipeline runs
  * before indexing.
  *
  * Scale shape: ONE pass over the data accumulates the d-vector sum
  * and the d×d second-moment matrix per partition (d=64 → 4 KB + 32
  * KB of local state), reduced to the driver; the eigendecomposition
  * runs on the driver over the d×d covariance (cyclic Jacobi — d is
  * model-dimension-scale, never data-scale). Projection is a narrow
  * map: `proj_j = dot(x, comp_j) − offset_j` with the mean folded
  * into a per-component scalar offset, so transforming 100 TB is
  * map-only with k codegen'd dot products per row.
  */
object Pca {

  /** mean vector, row-major principal components (descending
    * eigenvalue), and the eigenvalues themselves.
    */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** Fit a k-component model on `embCol` (array&lt;float&gt; or
    * array&lt;double&gt;).
    */
  def fit(emb: DataFrame, embCol: String, k: Int): PcaModel = {
    val sp = org.apache.spark.sql.graft.Shim.classic(emb.sparkSession)
    val vecs = emb.select(col(embCol).cast("array<double>"))
    import sp.implicits._
    val rdd = vecs.as[Seq[Double]].rdd
    // one pass: (n, Σx, ΣxxT) — local mutable accumulation per
    // partition, tree-reduced; at 1000 executors this moves
    // O(partitions × d²) doubles, never rows
    val d0 = rdd.take(1).headOption.map(_.length).getOrElse(
      throw new IllegalArgumentException("cannot fit PCA on an empty input"))
    require(k >= 1 && k <= d0, s"k=$k out of range for dimension $d0")
    val (n, sum, gram) = rdd.treeAggregate(
      (0L, new Array[Double](d0), Array.ofDim[Double](d0, d0)))(
      seqOp = { case ((cnt, s, g), x) =>
        require(x.length == d0, s"ragged embedding: ${x.length} != $d0")
        var i = 0
        while (i < d0) {
          val xi = x(i)
          s(i) += xi
          var j = 0
          val gi = g(i)
          while (j < d0) { gi(j) += xi * x(j); j += 1 }
          i += 1
        }
        (cnt + 1L, s, g)
      },
      combOp = { case ((c1, s1, g1), (c2, s2, g2)) =>
        var i = 0
        while (i < d0) {
          s1(i) += s2(i)
          var j = 0
          while (j < d0) { g1(i)(j) += g2(i)(j); j += 1 }
          i += 1
        }
        (c1 + c2, s1, g1)
      })
    val mean = sum.map(_ / n)
    val cov = Array.tabulate(d0, d0)((i, j) => gram(i)(j) / n - mean(i) * mean(j))
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    PcaModel(mean,
      order.map(i => vectors.map(_(i))).toArray,
      order.map(values).toArray)
  }

  /** Project `embCol` onto the model's components: k codegen'd dot
    * products per row, mean handled as a precomputed scalar offset —
    * no per-element mean subtraction in the hot path.
    */
  def transform(emb: DataFrame, embCol: String, model: PcaModel): DataFrame = {
    import graft.functions.VectorFunctions
    val x = col(embCol).cast("array<double>")
    val projCols = model.components.zipWithIndex.map { case (comp, j) =>
      val offset = comp.zip(model.mean).map { case (c, m) => c * m }.sum
      (VectorFunctions.dot(x, typedLit(comp.toSeq)) - lit(offset)).as(s"pc$j")
    }
    emb.withColumn("pca", array(projCols.map(c => c): _*))
  }

  /** DuckDB oracle for the reduced-space top-k query: the FITTED
    * model (driver-side plain arrays) is embedded as literals —
    * eigenvectors are not derivable in SQL, but a fitted projection
    * is just k dot products, which is. `Double.toString` emits the
    * shortest round-trip literal, so DuckDB re-reads the exact same
    * doubles Spark projects with; the fold order of the projection
    * and cosine mirrors [[transform]] / VectorFunctions.sqlCosine,
    * making the hash compare exact after round(...,6).
    */
  def sqlReducedTopK(model: PcaModel, queryVecId: Long, topK: Int): String = {
    import graft.functions.VectorFunctions
    def d(x: Double): String = java.lang.Double.toString(x)
    val rows = model.components.zipWithIndex.map { case (comp, j) =>
      val off = comp.zip(model.mean).map { case (c, m) => c * m }.sum
      s"($j, [${comp.map(d).mkString(", ")}], ${d(off)})"
    }
    s"""WITH comps(j, comp, off) AS (VALUES ${rows.mkString(",\n  ")}),
       |pr AS (SELECT e.vec_id, c.j,
       |         ${VectorFunctions.sqlDot("e.embedding", "c.comp")} - c.off AS pj
       |       FROM embeddings e CROSS JOIN comps c),
       |rv AS (SELECT vec_id, list(pj ORDER BY j) AS r FROM pr GROUP BY vec_id),
       |q AS (SELECT r AS qe FROM rv WHERE vec_id = $queryVecId)
       |SELECT rv.vec_id, round(${VectorFunctions.sqlCosine("rv.r", "q.qe")}, 6) AS cos
       |FROM rv CROSS JOIN q
       |WHERE rv.vec_id <> $queryVecId
       |ORDER BY cos DESC, rv.vec_id LIMIT $topK""".stripMargin
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * O(d³) per sweep on the DRIVER over a d×d covariance; d is the
    * embedding dimension (64 here), so this is microseconds, and it
    * needs no linear-algebra dependency. Returns (eigenvalues,
    * column-eigenvector matrix).
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // signum(0) is 0, which would skip the exact-45° rotation
            // (equal diagonal entries) — treat 0 as +1
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { if (i != j) s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
