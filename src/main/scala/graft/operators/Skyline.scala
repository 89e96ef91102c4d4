package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skyline (Pareto-front) operator: rows not dominated in a set of
  * criteria — "find the offers where nothing else is both cheaper
  * AND bigger". Spark-side design follows the two-phase scheme of
  * the Spark-SQL skyline integration literature (EDBT'23 "Integration
  * of Skyline Queries into Spark SQL"; see PAPERS.md):
  *
  *   1. LOCAL phase: each partition computes its own front with a
  *      block-nested-loop pass (`mapPartitions`, no shuffle) — every
  *      globally-undominated row survives its partition's front, so
  *      this loses nothing and typically discards almost everything;
  *   2. GLOBAL phase: the union of local fronts (small — bounded by
  *      #partitions × local front size) merges on one task.
  *
  * The quadratic all-pairs formulation exists only as the DuckDB
  * oracle. Worst case (fully anti-correlated data) the front IS the
  * table and no algorithm helps; in the common case local fronts are
  * tiny and the global merge is driver-scale. Dominance ties
  * (identical criteria vectors) dominate nobody — duplicates all
  * stay, keeping results deterministic.
  */
object Skyline {

  /** Ids of the skyline rows of `df` under `dims`:
    * `(column, maximize)` criteria; null and NaN criteria rows are
    * excluded (NaN compares differently in every engine — Spark
    * primitive comparisons never match it, DuckDB sorts it greatest —
    * so dominance over NaN is not portable). `idCol` must be unique
    * and long-typed.
    */
  def skylineIds(df: DataFrame, idCol: String, dims: Seq[(String, Boolean)]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one criterion")
    val spark = df.sparkSession
    import spark.implicits._
    // normalize every criterion to MINIMIZE by negating maximized ones
    val key = array(dims.map { case (c, maximize) =>
      val d = col(c).cast("double")
      if (maximize) -d else d
    }: _*)
    val pts = df
      .filter(dims.map { case (c, _) =>
        col(c).isNotNull && !isnan(col(c).cast("double"))
      }.reduce(_ && _))
      .select(col(idCol).cast("long"), key).as[(Long, Seq[Double])]
      .map { case (id, k) => (id, k.toArray) }
    val local = pts.mapPartitions(blockSkyline)
    // repartition (a real shuffle), NOT coalesce: coalesce(1) is a
    // narrow dependency that would pull phase 1 into the same single
    // task, serializing the whole scan. The shuffle moves only the
    // small local fronts.
    val global = local.repartition(1).mapPartitions(blockSkyline)
    global.map(_._1).toDF(idCol)
  }

  /** Skyline rows of `df` (all columns), ordered by `idCol`. The
    * front is small by assumption, so it joins back by broadcast.
    */
  def skyline(df: DataFrame, idCol: String, dims: Seq[(String, Boolean)]): DataFrame =
    df.join(broadcast(skylineIds(df, idCol, dims)), idCol).orderBy(idCol)

  /** Block-nested-loop front of one block: keep a running front; a
    * new point evicts the kept points it dominates and joins unless
    * dominated itself.
    */
  private def blockSkyline(it: Iterator[(Long, Array[Double])]): Iterator[(Long, Array[Double])] = {
    val front = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    it.foreach { p =>
      var dominated = false
      var i = 0
      while (i < front.length && !dominated) {
        if (dominates(front(i)._2, p._2)) dominated = true
        else if (dominates(p._2, front(i)._2)) { front.remove(i); i -= 1 }
        i += 1
      }
      if (!dominated) front += p
    }
    front.iterator
  }

  /** a dominates b: a <= b in every dim, a < b in at least one
    * (all dims normalized to minimize).
    */
  private def dominates(a: Array[Double], b: Array[Double]): Boolean = {
    var allLe = true; var oneLt = false; var i = 0
    while (i < a.length && allLe) {
      if (a(i) > b(i)) allLe = false
      else if (a(i) < b(i)) oneLt = true
      i += 1
    }
    allLe && oneLt
  }

  /** DuckDB oracle: the textbook NOT EXISTS dominance formulation
    * over table `t` (quadratic — oracle-only).
    */
  def sqlSkyline(table: String, idCol: String, dims: Seq[(String, Boolean)],
      select: Seq[String]): String = {
    val dom = dims.map { case (c, maximize) =>
      if (maximize) s"u.$c >= t.$c" else s"u.$c <= t.$c"
    }.mkString(" AND ")
    val strict = dims.map { case (c, maximize) =>
      if (maximize) s"u.$c > t.$c" else s"u.$c < t.$c"
    }.mkString(" OR ")
    def usable(a: String) =
      dims.map { case (c, _) => s"$a.$c IS NOT NULL AND NOT isnan($a.$c::DOUBLE)" }
        .mkString(" AND ")
    s"""SELECT ${select.map(s => s"t.$s").mkString(", ")} FROM $table t
       |WHERE ${usable("t")} AND NOT EXISTS (
       |  SELECT 1 FROM $table u
       |  WHERE ${usable("u")}
       |    AND $dom AND ($strict))
       |ORDER BY t.$idCol""".stripMargin
  }
}
