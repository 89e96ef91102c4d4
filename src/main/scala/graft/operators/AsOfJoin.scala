package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical "operator Spark lacks".
  *
  * `joinPrior(left, right, key, ts)` attaches to every left row the
  * greatest right-side timestamp that is <= the left row's timestamp
  * within the same key (DuckDB's `ASOF JOIN ... ON l.k = r.k AND
  * l.ts >= r.ts` semantics; no match -> null).
  *
  * Implementation is preference-order (a): composed from built-ins.
  * Both sides union into one stream tagged right(0)/left(1), shuffle
  * ONCE on the key, sort within partitions by (ts, tag, right-ts),
  * and propagate the last-seen right timestamp with a running
  * `last(ignoreNulls)` window. That is exactly the partition+sort+
  * stream-scan a dedicated SortMergeAsOfJoinExec would run — same
  * shuffle count, same sort, no custom physical operator needed. At
  * 100 TB this is one shuffle of (key, ts, payload) and a linear
  * in-partition pass; skewed keys fall to AQE like any window op.
  */
object AsOfJoin {

  /** @return `left` columns + `asof_ts`: max right `tsCol` <= left
    *         `tsCol` per `keyCol` (null if none).
    */
  def joinPrior(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__payload", struct(leftCols.map(col): _*))
      .select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
        lit(1).as("__tag"), lit(null).cast(left.schema(tsCol).dataType).as("__rts"),
        col("__payload"))
    val r = right
      .select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
        lit(0).as("__tag"), col(tsCol).as("__rts"),
        lit(null).cast(l.schema("__payload").dataType).as("__payload"))
    val w = Window.partitionBy("__key")
      .orderBy(col("__ts"), col("__tag"), col("__rts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionAll(l)
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__payload.$c")) :+ col("asof_ts"): _*)
  }
}
