package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Shim

/** The library's signature primitives as plain SQL functions, so a
  * `spark.sql` user (or a BI tool speaking SQL) can call them without
  * touching the Scala API:
  *
  * {{{
  *   SELECT graft_minhash(text), graft_simhash(text) FROM docs
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * Registered either through [[graft.resolve.GlueSparkExtension]]
  * (`spark.sql.extensions=...`, cluster-wide) or per-session via
  * [[register]]. Each function resolves to the SAME native
  * expression / column composition the operators use — identical
  * semantics, codegen, and cross-engine hash constants.
  */
object SqlFunctions {

  private def col(e: Expression) = Shim.column(e)

  private def fn(name: String, n: Int)(b: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(SqlFunctions.getClass.getName, name),
      (args: Seq[Expression]) => {
        // wrong arity surfaces through the standard SQL error path
        // (AnalysisException with Spark's own error class), not a raw
        // IllegalArgumentException out of the analyzer
        if (args.length != n)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> s"`$name`", "expectedNum" -> n.toString,
              "actualNum" -> args.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        b(args)
      })

  /** All registrations: (identifier, info, builder). */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_charfold", 1)(a => Shim.expressionConverted(CrossHash.charFold(col(a.head)))),
    fn("graft_tokens", 1)(a => Shim.expressionConverted(CrossHash.tokens(col(a.head)))),
    fn("graft_minhash", 1)(a => MinHashSigExpr(a.head, 3)),
    fn("graft_simhash", 1)(a => SimHashExpr(a.head)),
    fn("graft_fingerprint", 1)(a => FingerprintExpr(a.head, 5)),
    fn("graft_cosine", 2)(a => CosineSimExpr(a(0), a(1))),
    fn("graft_chunk_hashes", 1)(a =>
      Shim.expressionConverted(graft.operators.Chunking.chunkHashes(col(a.head)))),
    fn("graft_zvalue", 2)(a =>
      Shim.expressionConverted(ZOrder.zvalue(
        Seq(ZOrder.requireNormalized(col(a(0))), ZOrder.requireNormalized(col(a(1))))))))

  /** Session-local registration (the non-extension path). */
  def register(spark: SparkSession): Unit = all.foreach { case (id, info, b) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, b)
  }
}
