package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-means clustering over the embedding corpus — the unsupervised
  * grouping step behind domain discovery, topic-balanced sampling,
  * and semantic-dedup blocking (cluster first, compare within
  * clusters).
  *
  * Scale shape, per Lloyd iteration:
  *  - ASSIGN is a pure map: the k×d centroid matrix rides along as a
  *    literal (broadcast-by-value; a few KB for any practical k·d),
  *    distances and the argmin are one projection — the corpus is
  *    never shuffled, the scan's column pruning is untouched.
  *  - UPDATE is one partial aggregate keyed by (cluster, dim) —
  *    map-side combine reduces each partition to ≤ k·d rows before
  *    the shuffle, and the k·d result is collected (metadata-scale,
  *    like d8's convergence scalar).
  * So an iteration costs one corpus scan + one tiny shuffle — the
  * same shape at 60k rows and at 100 TB.
  *
  * Cross-engine exactness: distances fold in double precision in
  * array order (same cast points as
  * [[graft.functions.VectorFunctions]]), so the DuckDB oracle
  * computes bit-identical distances and the argmin picks the same
  * cluster; ties go to the lowest cluster index on both engines. The
  * ITERATIVE path is Spark-only (centroid means are
  * accumulation-order-dependent in the last ulp, so no exact oracle
  * can exist); the registered query audits the deterministic seeded
  * assignment, the spec covers convergence.
  */
object Clustering {

  /** Squared L2 distance: left-fold of (a[i]-b[i])² in double. */
  def distSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (s, v) => s + v)

  /** DuckDB fragment evaluating the same fold. */
  def sqlDistSq(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, [($a[i]::DOUBLE - $b[i]::DOUBLE) * " +
      s"($a[i]::DOUBLE - $b[i]::DOUBLE) for i in range(1, len($a) + 1)]), (s, v) -> s + v)"

  /** Deterministic seeds: the embeddings of the k smallest vec_ids
    * (a pure function of the corpus — every engine and every run
    * seeds identically). k rows collected: metadata-scale.
    */
  def seedCentroids(emb: DataFrame, k: Int): Seq[Seq[Float]] = {
    require(k >= 1, s"k out of range: $k")
    emb.orderBy("vec_id").limit(k).select("embedding")
      .collect().map(_.getSeq[Float](0).toSeq).toSeq
  }

  /** Nearest-centroid assignment — `(vec_id, embedding, cluster,
    * dist)`. Pure map (see object doc); ties take the lowest cluster
    * index (argmin = first position of the array minimum).
    */
  def assign(emb: DataFrame, centroids: Seq[Seq[Float]]): DataFrame = {
    require(centroids.nonEmpty, "assign needs at least one centroid")
    val d = array(centroids.map(c => distSq(col("embedding"), typedLit(c))): _*)
    emb.select(col("vec_id"), col("embedding"), d.as("__d"))
      .select(col("vec_id"), col("embedding"),
        (array_position(col("__d"), array_min(col("__d"))) - 1L).cast("int").as("cluster"),
        array_min(col("__d")).as("dist"))
  }

  /** One Lloyd centroid update: per-dimension means via a (cluster,
    * dim) partial aggregate. Clusters that lost every member keep
    * their previous centroid (the standard empty-cluster rule).
    */
  def update(assigned: DataFrame, prev: Seq[Seq[Float]]): Seq[Seq[Float]] = {
    val rows = assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos").agg(avg(col("v")).as("m"))
      .collect()
    val means = rows.groupBy(_.getInt(0)).map { case (c, rs) =>
      c -> rs.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq
    }
    prev.indices.map(i => means.getOrElse(i, prev(i)))
  }

  /** Lloyd's algorithm from the deterministic seeds: `iters`
    * assign/update rounds, returning the final centroids and
    * assignment. The driver loop holds only k×d floats; each round is
    * one corpus scan.
    */
  def kmeans(emb: DataFrame, k: Int, iters: Int): (Seq[Seq[Float]], DataFrame) = {
    // The loop re-reads its input once per round; persist the
    // two-column projection for the loop's lifetime so `iters` rounds
    // cost `iters` cache reads, not `iters` source scans (at 100 TB
    // the source scan IS the iteration cost). MEMORY_AND_DISK: an
    // overflow spills instead of silently re-scanning the source.
    val loopInput = emb.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents = seedCentroids(loopInput, k)
      var i = 0
      while (i < iters) {
        cents = update(assign(loopInput, cents), cents)
        i += 1
      }
      (cents, assign(emb, cents))
    } finally loopInput.unpersist(blocking = false)
  }

  /** Registered-query audit of the seeded assignment: per-cluster
    * population and distance envelope (min/max are
    * accumulation-order-independent, so they oracle exactly; a mean
    * would not).
    */
  def assignAudit(emb: DataFrame, k: Int): DataFrame =
    assign(emb, seedCentroids(emb, k))
      .groupBy("cluster").agg(count(lit(1)).as("n"),
        round(min("dist"), 6).as("min_d"), round(max("dist"), 6).as("max_d"))
      .orderBy("cluster")

  /** DuckDB oracle for [[assignAudit]]. */
  def sqlAssignAudit(k: Int): String =
    s"""WITH seeds AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, embedding AS ce
       |  FROM embeddings ORDER BY vec_id LIMIT $k),
       |d AS (
       |  SELECT e.vec_id, s.cluster, ${sqlDistSq("e.embedding", "s.ce")} AS dist
       |  FROM embeddings e CROSS JOIN seeds s),
       |a AS (
       |  SELECT vec_id, cluster, dist,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |  FROM d)
       |SELECT CAST(cluster AS INTEGER) AS cluster, count(*) AS n,
       |  round(min(dist), 6) AS min_d, round(max(dist), 6) AS max_d
       |FROM a WHERE rn = 1 GROUP BY cluster ORDER BY cluster""".stripMargin
}
