package graft.model

/** Data model for the Glue-table engine.
  *
  * Re-expresses the reference's metadata model (reference:
  * src/types.ts:4-62) as idiomatic Scala case classes. Schema of the
  * actual data stays external/deferred exactly like the reference —
  * Spark infers it from parquet at scan time, the way the reference
  * lets DuckDB infer it (reference: src/util/glue.ts:136-175).
  */

/** Table-type taxonomy (reference: src/types.ts:4-11). The reference
  * classifier only ever produces Hive, Iceberg, GlueProjected and
  * Unpartitioned (src/util/glue.ts:13-19) — its Hudi/Delta are
  * declared-but-unreachable. Here all six are REACHABLE: Delta reads
  * via the transaction log ([[graft.listing.DeltaLogResolver]]) and
  * Hudi COW via the timeline ([[graft.listing.HudiTimelineResolver]]),
  * both beyond-reference extensions.
  */
sealed trait TableType
object TableType {
  case object Hive          extends TableType
  case object Iceberg       extends TableType
  case object Hudi          extends TableType
  case object Delta         extends TableType
  case object GlueProjected extends TableType
  case object Unpartitioned extends TableType
}

/** One column of a catalog table (name + Glue/Hive type string). */
final case class ColumnDef(name: String, dataType: String = "string")

/** Catalog entry — the subset of an AWS Glue `Table` the engine uses
  * (reference: src/util/glue.ts:21-50): name, database, storage
  * location, partition keys, free-form parameters. `columns` are the
  * catalog-declared data columns (Glue `StorageDescriptor.Columns`,
  * Hive type strings); when present the reader trusts them instead of
  * inferring schema by scanning — at catalog scale an inference pass
  * over the data is never acceptable.
  */
final case class GlueTable(
    database: String,
    name: String,
    location: Option[String],
    partitionKeys: Seq[ColumnDef] = Nil,
    parameters: Map[String, String] = Map.empty,
    columns: Seq[ColumnDef] = Nil)

/** Partition-projection pattern parsed from Glue table parameters
  * `projection.<col>.<prop>` (reference: src/types.ts:35-40,
  * src/util/glue.ts:52-103).
  */
final case class ProjectionPattern(
    ptype: String,                     // enum | integer | date | injected
    format: Option[String] = None,     // date format, default yyyy-MM-dd
    range: Seq[String] = Nil,
    values: Seq[String] = Nil)

/** One partition's values + optional explicit location
  * (reference: src/types.ts:22-28).
  */
final case class PartitionInfo(values: Seq[String], location: Option[String])

/** Partition metadata fetched for Hive tables (reference:
  * src/types.ts:22-28; src/util/glue.ts:105-134). Note: the reference
  * has a bug where `keys` is filled with the first partition's VALUES
  * (src/util/glue.ts:123); we store the actual key names.
  */
final case class PartitionMetadata(keys: Seq[String], values: Seq[PartitionInfo])

/** Cached metadata wrapper (reference: src/types.ts:18-33). */
final case class CachedTableMetadata(
    timestamp: Long,
    tableType: TableType,
    table: GlueTable,
    partitionMetadata: Option[PartitionMetadata] = None,
    projectionPatterns: Option[Map[String, ProjectionPattern]] = None)

/** A single data file + the partition values extracted from its path
  * (reference: src/types.ts:13-16). `size`/`modTime` carry the
  * filesystem metadata captured at listing time so the read path can
  * build `FileStatus`es without a second round of per-file metadata
  * calls (at 10M files that second round is millions of S3 HEADs per
  * query). No default args: every listing source must supply real
  * values — `size` feeds planner statistics (broadcast decisions)
  * and scan split planning, so a silent 0 is a correctness hazard at
  * scale. `modTime = 0` means "source records no mtime" (Iceberg
  * manifests); it only surfaces via the `_metadata` column.
  */
final case class S3FileInfo(
    path: String,
    partitionValues: Map[String, String],
    size: Long,
    modTime: Long,
    /** Per-column min/max ranges for file skipping when the listing
      * source carries them for free (Iceberg manifest bounds); empty
      * when it doesn't — the read path then falls back to capped
      * footer reads. Explicit at every construction site, like
      * `size`.
      */
    bounds: Map[String, graft.listing.ColRange],
    /** Exact rows in the file when the listing source already knows
      * (Delta add-action `stats.numRecords`, Iceberg manifest
      * `record_count`) — metadata COUNT(*) then needs ZERO per-file
      * I/O. None means "source doesn't say" (plain Hive listings,
      * Hudi commit stats); consumers fall back to footer reads.
      * Explicit at every construction site, like `size`.
      */
    rowCount: Option[Long])

/** Engine configuration (reference: src/types.ts:42-49 — defaults
  * maxEntries=100, both TTLs 3600000 ms). `proxyAddress` replicates
  * the reference's optional HTTP block-cache path rewrite
  * (reference: src/glue-table-cache.ts:54-65).
  */
final case class CacheConfig(
    maxEntries: Int = 100,
    tableMetadataTtlMs: Long = 3600000L,
    s3ListingTtlMs: Long = 3600000L,
    proxyAddress: Option[String] = None,
    /** Negative-cache TTL for failed loads: queued/subsequent callers
      * fail fast with the cached error instead of stampeding a down
      * backend (reference keeps errors for the FULL entry TTL,
      * src/glue-table-cache.ts:163-167; a short window is the safer
      * default for a long-lived driver). 0 disables.
      */
    errorCacheTtlMs: Long = 30000L,
    /** Parquet tables with at most this many files get driver-side
      * footer min/max stats for planner-time FILE skipping (cached
      * with the listing TTL). Footer reads are one KB-scale GET per
      * file, so the cap bounds planning latency; beyond it, skipping
      * quietly degrades to partition pruning only. 0 disables. For
      * catalogs that carry stats in metadata (Iceberg manifests) the
      * bounds come from the manifest read instead — no per-file I/O.
      */
    footerStatsMaxFiles: Int = 4096)

object TableClassifier {
  /** Port of the reference classifier (src/util/glue.ts:13-19):
    * `table_type == ICEBERG` → Iceberg; `projection.enabled == true`
    * → GlueProjected; has partition keys → Hive; else Unpartitioned.
    *
    * DELTA is a beyond-reference extension: the reference declares
    * the type but can never return it (its classifier only checks
    * ICEBERG), so Delta-registered Glue tables are unreadable there.
    * Glue marks them with `table_type=DELTA` (the Athena/Glue
    * convention) or the Spark provider parameter.
    */
  def classify(t: GlueTable): TableType = {
    val params = t.parameters
    if (params.get("table_type").exists(_.equalsIgnoreCase("ICEBERG"))) TableType.Iceberg
    else if (params.get("table_type").exists(_.equalsIgnoreCase("DELTA")) ||
      params.get("spark.sql.sources.provider").exists(_.equalsIgnoreCase("delta"))) TableType.Delta
    else if (params.get("table_type").exists(_.equalsIgnoreCase("HUDI")) ||
      params.get("spark.sql.sources.provider").exists(_.equalsIgnoreCase("hudi"))) TableType.Hudi
    else if (params.get("projection.enabled").contains("true")) TableType.GlueProjected
    else if (t.partitionKeys.nonEmpty) TableType.Hive
    else TableType.Unpartitioned
  }
}

object ProjectionParser {
  /** Parse `projection.<col>.<prop>` parameters into per-column
    * patterns (reference: src/util/glue.ts:52-103). `range`/`values`
    * accept a JSON array or comma-separated string
    * (reference: src/util/glue.ts:84-99).
    */
  def parse(parameters: Map[String, String]): Map[String, ProjectionPattern] = {
    val Prop = raw"projection\.([^.]+)\.(type|format|range|values)".r
    val byCol = parameters.toSeq.collect {
      case (Prop(col, prop), v) => (col, prop, v)
    }.groupBy(_._1)
    byCol.flatMap { case (col, props) =>
      val m = props.map(p => p._2 -> p._3).toMap
      m.get("type").map { t =>
        col -> ProjectionPattern(
          ptype = t,
          format = m.get("format"),
          range = m.get("range").map(parseListValue).getOrElse(Nil),
          values = m.get("values").map(parseListValue).getOrElse(Nil))
      }
    }
  }

  /** JSON array (`["a","b"]` / `[1,2]`) or comma-separated (`a,b`)
    * → list of strings (reference: src/util/glue.ts:84-99).
    */
  def parseListValue(v: String): Seq[String] = {
    val s = v.trim
    if (s.startsWith("[") && s.endsWith("]")) {
      s.substring(1, s.length - 1).split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"").trim)
        .filter(_.nonEmpty)
    } else s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

/** A parsed `glue.db.tbl` reference. */
final case class GlueRefId(database: String, table: String)

object GlueRefId {
  /** Parse a multipart relation identifier as a glue reference.
    * 1-part names (a CTE/view literally named "glue") are NOT glue
    * refs; 2-part defaults the database (reference:
    * src/sql-transformer.ts:165-167); >3 parts throws (reference:
    * test/sql-transformer.test.ts:150-181).
    */
  def parse(parts: Seq[String]): Option[GlueRefId] =
    if (parts.length >= 2 && parts.head.equalsIgnoreCase("glue")) {
      parts.length match {
        case 2 => Some(GlueRefId("default", parts(1)))
        case 3 => Some(GlueRefId(parts(1), parts(2)))
        case n => throw new IllegalArgumentException(
          s"Invalid Glue table reference (expected glue.db.table): ${parts.mkString(".")} ($n parts)")
      }
    } else None
}

object Naming {
  /** Name-mangling rules (reference: src/sql-transformer.ts:283-293):
    * hyphens stripped; view name `GLUE__<db>_<tbl>`.
    */
  private def clean(s: String): String = s.replace("-", "")
  def filesVarName(db: String, tbl: String): String  = s"${clean(db)}_${clean(tbl)}_files"
  def gviewFilesVarName(db: String, tbl: String): String = s"${clean(db)}_${clean(tbl)}_gview_files"
  def viewName(db: String, tbl: String): String      = s"GLUE__${clean(db)}_${clean(tbl)}"
  def listingName(db: String, tbl: String): String   = s"${clean(db)}_${clean(tbl)}_s3_listing"
}
