package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the audit a pipeline runs before
  * training on (or publishing) a table: null counts, exact distinct
  * cardinalities, and numeric ranges per column, in ONE pass over the
  * data.
  *
  * Scale shape: a single global aggregate; Spark plans the
  * multi-distinct via one Expand (rows × #distinct-columns) feeding
  * partial aggregates, so the cost is one shuffle of partial states —
  * there is no per-column pass and no driver-side iteration. The
  * result is O(#columns) rows. For 100 TB profile runs where exact
  * distinct counts are not required, swap `countDistinct` for
  * `approx_count_distinct` — the shape is otherwise identical (the
  * exact form is kept here because the DuckDB oracle proves it
  * value-for-value).
  */
object Profile {

  /** Long-format profile of `cols`: one row per column with
    * `(column, n_rows, n_nulls, n_distinct, min_val, max_val)`;
    * min/max are reported as DOUBLE (bit-identical across engines for
    * numeric source columns) and null for non-numeric columns.
    */
  def profileTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSet
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c")) ++
        (if (numeric(c))
           Seq(min(col(c)).cast("double").as(s"__min_$c"),
             max(col(c)).cast("double").as(s"__max_$c"))
         else
           Seq(lit(null).cast("double").as(s"__min_$c"),
             lit(null).cast("double").as(s"__max_$c")))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))
    }
    row.select(explode(array(perCol: _*)).as("p"))
      .select("p.*")
      .orderBy("column")
  }

  /** Grouped profile: [[profileTable]] per group — the per-source
    * audit that catches one feed going bad inside a healthy table
    * (nulls spiking in a single source, a range collapsing). Same
    * one-pass multi-distinct shape with the group key added to the
    * aggregate; output is O(#groups × #columns) rows.
    */
  def profileGrouped(df: DataFrame, group: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSet
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c")) ++
        (if (numeric(c))
           Seq(min(col(c)).cast("double").as(s"__min_$c"),
             max(col(c)).cast("double").as(s"__max_$c"))
         else
           Seq(lit(null).cast("double").as(s"__min_$c"),
             lit(null).cast("double").as(s"__max_$c")))
    }
    val row = df.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))
    }
    row.select(col(group), explode(array(perCol: _*)).as("p"))
      .select(col(group), col("p.*"))
      .orderBy(group, "column")
  }

  /** DuckDB oracle for [[profileGrouped]]. */
  def sqlProfileGrouped(group: String, table: String, cols: Seq[String],
      numericCols: Set[String]): String =
    cols.map { c =>
      val mm =
        if (numericCols(c)) s"CAST(min($c) AS DOUBLE) AS min_val, CAST(max($c) AS DOUBLE) AS max_val"
        else "CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val"
      s"""SELECT $group, '$c' AS "column", count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct, $mm
         |FROM $table GROUP BY $group""".stripMargin
    }.mkString("", "\nUNION ALL\n", s"\nORDER BY $group, \"column\"")

  /** DuckDB oracle for [[profileTable]]: one aggregate subquery per
    * column, unioned (the oracle may be per-column; the Spark plan is
    * one pass).
    */
  def sqlProfileTable(table: String, cols: Seq[String],
      numericCols: Set[String]): String =
    cols.map { c =>
      val mm =
        if (numericCols(c)) s"CAST(min($c) AS DOUBLE) AS min_val, CAST(max($c) AS DOUBLE) AS max_val"
        else "CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val"
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct, $mm
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
}
