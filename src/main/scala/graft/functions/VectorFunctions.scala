package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, with DuckDB
  * fragment builders that evaluate the SAME IEEE-double fold (same
  * element order, same cast points), so similarity scores hash-match
  * the oracle bit-for-bit — no tolerance needed.
  *
  * Scale note: pure per-row expressions (zip_with/aggregate compile
  * to array loops inside the stage); the expensive part of similarity
  * work is pair generation, handled by the operators in
  * [[graft.operators]] via blocking/LSH, never by these functions.
  */
object VectorFunctions {

  /** Left-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (s, v) => s + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native single-pass cosine (same fold order; see HashExpressions). */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Shim
    Shim.column(CosineSimExpr(Shim.expression(a), Shim.expression(b)))
  }

  // ------------------------------------------------------------ DuckDB side

  /** Same fold: prepend 0.0, products in index order. */
  def sqlDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, [$a[i]::DOUBLE * $b[i]::DOUBLE for i in range(1, len($a) + 1)]), (s, v) -> s + v)"

  def sqlNorm(a: String): String = s"sqrt(${sqlDot(a, a)})"

  def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (${sqlNorm(a)} * ${sqlNorm(b)}))"
}
