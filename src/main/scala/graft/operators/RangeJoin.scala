package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a nested loop — the shape
  * behind "events inside campaign windows", sensor readings against
  * maintenance intervals, reads against genomic regions.
  *
  * Spark has no native range-join optimization: a bare
  * `points JOIN intervals ON t BETWEEN lo AND hi` with no equi key
  * plans BroadcastNestedLoopJoin (quadratic work, and a driver OOM
  * once neither side broadcasts). The standard distributed fix,
  * implemented here: overlay a coarse timeline grid of width `w`;
  * each interval replicates to the grid cells it overlaps
  * (`ceil(len/w) + 1` rows — bounded when w is chosen near the
  * typical interval length), each point maps to exactly ONE cell,
  * and the grid cell becomes the shuffle key of a plain equi-join
  * with the BETWEEN as a residual filter. Because a point lives in
  * one cell, every qualifying (interval, point) pair meets exactly
  * once — no post-join dedup. Both sides shuffle by cell: at 100 TB
  * neither side needs to broadcast, skew is bounded by cell
  * population (pick w, or salt a hot cell, exactly like any
  * equi-join), and Catalyst still pushes column pruning and the
  * residual into the scan.
  */
object RangeJoin {

  /** Join `points` (carrying a long grid column `t`, e.g. epoch
    * micros) into `intervals` (carrying longs `lo`, `hi`,
    * inclusive). Output: one row per containment, with all columns
    * of both inputs (minus the internal grid key).
    *
    * `bucketWidth` tunes replication: intervals replicate
    * `len/w + 1`-fold. Choose it near the typical interval length —
    * a too-small w multiplies the interval side, a too-large w
    * degrades the residual filter's selectivity, never correctness.
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals
      .withColumn("__cell", explode(sequence(
        expr(s"lo div $bucketWidth"), expr(s"hi div $bucketWidth"))))
    val pt = points.withColumn("__cell", expr(s"t div $bucketWidth"))
    iv.join(pt, Seq("__cell"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .drop("__cell")
  }
}
