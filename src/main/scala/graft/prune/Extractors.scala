package graft.prune

import graft.model.{CachedTableMetadata, ProjectionPattern, TableType}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Partition-value extractor expressions over a file-path column.
  *
  * Port of the reference's SQL-string generators (reference:
  * src/util/glue.ts:136-193) as Spark `Column`s — same regexes, but
  * codegen'd by Catalyst instead of interpolated into DuckDB SQL.
  */
object Extractors {

  /** Hive layout: `.../key=value/...`
    * (reference: src/util/glue.ts:173-174).
    *
    * Values are Hive-escaped in the path (Spark escapes `=`, `:`,
    * `%`, quotes, … as `%XX` when writing `key=value` dirs), so the
    * raw extract must be unescaped before it can be compared with
    * user literals — otherwise `key = 'a=b'` never matches the dir
    * `key=a%3Db` and listing-level pruning silently drops rows.
    * Hive's `%XX` scheme is URL-decoding without the `+`-means-space
    * rule, so protect literal `+` first, then `url_decode`; a value
    * that still fails to decode (stray `%` from a non-Hive writer)
    * passes through unchanged. `__HIVE_DEFAULT_PARTITION__` maps to
    * null, matching Spark's own partition discovery.
    */
  def hive(key: String)(path: Column): Column = {
    val raw = regexp_extract(path, java.util.regex.Pattern.quote(key) + "=([^/]+)", 1)
    val decoded = coalesce(try_url_decode(regexp_replace(raw, raw"\+", "%2B")), raw)
    when(raw === lit("__HIVE_DEFAULT_PARTITION__"), lit(null).cast("string"))
      .otherwise(decoded)
  }

  /** Date projection: SimpleDateFormat → regex, extract first match
    * (reference: src/util/glue.ts:148-153; default format
    * `yyyy-MM-dd`).
    */
  def dateProjection(format: Option[String])(path: Column): Column =
    regexp_extract(path, "(" + convertDateFormatToRegex(format.getOrElse("yyyy-MM-dd")) + ")", 1)

  /** Integer projection: first all-digit path segment, cast to int
    * (reference: src/util/glue.ts:155-157).
    */
  def integerProjection(path: Column): Column =
    regexp_extract(path, "/([0-9]+)/", 1).cast(IntegerType)

  /** Enum projection: last directory component
    * (reference: src/util/glue.ts:159-161).
    */
  def enumProjection(path: Column): Column =
    regexp_extract(path, "/([^/]+)/[^/]*$", 1)

  /** Java date-format tokens → regex (reference:
    * src/util/glue.ts:177-193).
    */
  def convertDateFormatToRegex(fmt: String): String =
    fmt
      .replace("yyyy", raw"\d{4}")
      .replace("MM", raw"\d{2}")
      .replace("dd", raw"\d{2}")
      .replace("HH", raw"\d{2}")
      .replace("mm", raw"\d{2}")
      .replace("ss", raw"\d{2}")

  /** Strip everything up to (and including) the table directory, so
    * projection regexes see only the partition-relative path. Without
    * this, a location like `.../2024/events/` would satisfy the
    * integer-projection regex before the actual partition dir — a
    * deliberate soundness improvement over the reference, whose
    * regexes scan the full path (src/util/glue.ts:155-161).
    */
  def relativize(location: Option[String])(path: Column): Column =
    location.map(_.stripSuffix("/").split("/").last).filter(_.nonEmpty) match {
      case Some(lastSeg) =>
        regexp_replace(path,
          "^.*?" + java.util.regex.Pattern.quote("/" + lastSeg + "/"), "/")
      case None => path
    }

  /** Extractor for one partition key of a table (dispatch port of
    * reference: src/util/glue.ts:136-175). Injected projection is
    * explicitly unsupported, matching the reference
    * (src/util/glue.ts:163-166).
    */
  def forKey(meta: CachedTableMetadata, key: String): Column => Column = {
    val rel = relativize(meta.table.location) _
    meta.tableType match {
      case TableType.GlueProjected =>
        val pattern: Option[ProjectionPattern] = meta.projectionPatterns.flatMap(_.get(key))
        pattern.map(_.ptype) match {
          case Some("date")     => p => dateProjection(pattern.flatMap(_.format))(rel(p))
          case Some("integer")  => p => integerProjection(rel(p))
          case Some("enum")     => p => enumProjection(rel(p))
          case Some("injected") =>
            throw new UnsupportedOperationException(
              s"Injected projection values not supported yet for partition key $key")
          case _ => hive(key)
        }
      case _ => hive(key)
    }
  }
}
