package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data
  * clustering: interleaving the bits of N normalized columns gives a
  * 1-D sort key under which files hold tight value ranges in EVERY
  * participating dimension — so the footer-stats skipping tier
  * ([[graft.listing.StatsPruning]]) prunes files for predicates on
  * any clustered column, where a plain `clusterBy` sort only serves
  * its leading column. This is the standard lakehouse layout
  * technique (Delta OPTIMIZE ZORDER BY, Iceberg sort orders with
  * truncate transforms).
  *
  * All pure per-row bit arithmetic — codegen'd, shuffle-free; the
  * only non-map cost of a z-order rewrite is the range partitioning
  * of the write itself.
  */
object ZOrder {

  /** Min/max-normalize a numeric column onto the `[0, 2^bits)`
    * integer grid. `lo`/`hi` come from a one-row stats aggregate
    * (driver-side metadata). Degenerate spans collapse to 0 — a
    * constant column contributes nothing to the curve, harmlessly.
    *
    * NULLS map to grid cell 0 (Spark's `greatest` skips null
    * operands) — null rows co-locate with the dimension's minimum
    * instead of scattering. Harmless for skipping: a null row never
    * satisfies a value predicate, and IS NULL pruning runs off null
    * counts, not bounds.
    */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 20, s"bits out of range: $bits")
    val top = (1L << bits) - 1
    if (!(hi > lo)) lit(0L)
    else
      least(lit(top), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(top.toDouble) + lit(0.5))
          .cast("long")))
  }

  /** Runtime contract check for the SQL-function surface
    * (`graft_zvalue`): [[zvalue]] silently aliases values outside the
    * normalized `[0, 2^bits)` grid (only the low bits interleave), so
    * raw inputs would produce meaningless Morton keys with no error.
    * Out-of-range non-null values fail loudly via `raise_error`;
    * nulls pass through (the whole z-value goes null — the standard
    * null propagation).
    */
  def requireNormalized(c: Column, bits: Int = 16): Column = {
    val top = (1L << bits) - 1
    val v = c.cast("long")
    when(v.isNotNull && (v < 0 || v > top),
      raise_error(concat(
        lit(s"graft_zvalue expects pre-normalized inputs in [0, ${top + 1}) " +
          "(use ZOrder.normalize); got "), v.cast("string"))).cast("long"))
      .otherwise(v)
  }

  /** Interleave the low `bits` bits of the given (already
    * normalized, non-negative) long columns: bit `i` of column `j`
    * lands at position `i * n + j`, so the high bits of every
    * dimension dominate the key together.
    */
  def zvalue(normCols: Seq[Column], bits: Int = 16): Column = {
    require(normCols.size >= 2, "z-order needs at least two columns")
    require(normCols.size * bits <= 62, s"${normCols.size} cols x $bits bits exceeds a long")
    val n = normCols.size
    normCols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }
}
