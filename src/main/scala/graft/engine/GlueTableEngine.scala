package graft.engine

import graft.cache.{Retry, TtlCache}
import graft.catalog.CatalogProvider
import graft.listing.{FileLister, HadoopFileLister, IcebergSnapshotResolver}
import graft.model._
import graft.prune.Extractors
import org.apache.hadoop.fs.{FileStatus, Path => HadoopPath}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{PreListedFileIndex, Shim}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** The engine facade — Spark-native re-expression of the reference's
  * `GlueTableCache` public surface (reference:
  * src/glue-table-cache.ts:242-347, src/index.ts:1-2).
  *
  * Where the reference converts `glue.db.tbl` SQL into DuckDB setup
  * statements + a rewritten query string (string-level dataflow), this
  * engine rewrites the *logical plan*: each `UnresolvedRelation` over
  * the `glue` catalog becomes the plan of a (partition-pruned) parquet
  * read, and Spark executes it. No SQL re-serialization, no variables
  * — the idiomatic equivalents are documented per method.
  *
  * Scale notes (100 TB design):
  *  - Metadata and listings are driver-side and cached (LRU+TTL,
  *    single-flight) — O(#files) strings, never data.
  *  - Hive-layout tables are read with `basePath` so Spark's own
  *    `PartitioningAwareFileIndex` + `PruneFileSourcePartitions`
  *    prune partitions per-relation — sound under OR/CTE/subquery
  *    predicates, fixing the reference's OR-to-AND over-pruning bug
  *    (reference: src/sql-transformer.ts:244-247 joined with AND at
  *    src/glue-table-cache.ts:329-331).
  *  - Projection tables additionally prune the listing DataFrame with
  *    partition-key conjuncts found above each relation.
  *  - Data movement is all executor-side vectorized parquet scan with
  *    Catalyst filter pushdown.
  */
final class GlueTableEngine(
    val spark: SparkSession,
    catalog: CatalogProvider,
    config: CacheConfig = CacheConfig(),
    listerOverride: Option[FileLister] = None) {

  private def hadoopConf = Shim.classic(spark).sparkContext.hadoopConfiguration
  private val lister: FileLister = listerOverride.getOrElse(new HadoopFileLister(hadoopConf))
  private lazy val iceberg = new IcebergSnapshotResolver(hadoopConf)
  private lazy val delta = new graft.listing.DeltaLogResolver(spark)
  private lazy val hudi = new graft.listing.HudiTimelineResolver(hadoopConf)

  // Two caches, mirroring the reference (src/glue-table-cache.ts:75-84).
  private val metaCache = new TtlCache[CachedTableMetadata](
    config.maxEntries, config.tableMetadataTtlMs, config.errorCacheTtlMs)
  private val listingCache = new TtlCache[Seq[S3FileInfo]](
    config.maxEntries, config.s3ListingTtlMs, config.errorCacheTtlMs)
  // Derived from listingCache entries (typed partition values per
  // file, see [[typedListing]]); same TTL, invalidated together.
  private val typedCache = new TtlCache[(org.apache.spark.sql.types.StructType, Seq[org.apache.spark.sql.Row])](
    config.maxEntries, config.s3ListingTtlMs, config.errorCacheTtlMs)
  // Per-file column ranges for data skipping (see [[readTable]]);
  // derived from the listing like typedCache, same TTL/invalidation.
  private val statsCache = new TtlCache[Map[String, Map[String, graft.listing.ColRange]]](
    config.maxEntries, config.s3ListingTtlMs, config.errorCacheTtlMs)
  // Iceberg v2 delete files per table version (merge-on-read);
  // same TTL/invalidation family as the listing.
  private val deleteCache = new TtlCache[Seq[IcebergSnapshotResolver#IcebergDeleteFile]](
    config.maxEntries, config.s3ListingTtlMs, config.errorCacheTtlMs)
  // Canonical data-file path -> data sequence number per table
  // version — scopes equality deletes (they apply only to files with
  // a strictly smaller sequence); same TTL/invalidation family.
  private val seqCache = new TtlCache[Map[String, Long]](
    config.maxEntries, config.s3ListingTtlMs, config.errorCacheTtlMs)
  // Delta deletion vectors per table version (merge-on-read row
  // deletes: data-file path -> DV sidecar); same TTL/invalidation
  // family as the listing.
  private val dvCache = new TtlCache[Map[String, String]](
    config.maxEntries, config.s3ListingTtlMs, config.errorCacheTtlMs)

  // ---------------------------------------------------------------- metadata

  /** ≈ reference `getTableMetadataCached` (src/glue-table-cache.ts:150-204):
    * single-flight cached fetch with retry/backoff and 4xx bail.
    */
  def tableMetadata(database: String, table: String): CachedTableMetadata =
    metaCache.get(s"$database.$table") {
      val meta = Retry.withRetry() {
        val t = catalog.getTable(database, table)
        val ttype = TableClassifier.classify(t)
        val projections =
          if (ttype == TableType.GlueProjected) Some(ProjectionParser.parse(t.parameters)) else None
        // Partition fetch failure is non-fatal (reference:
        // test/util.glue.test.ts:100-114).
        val partMeta =
          if (ttype == TableType.Hive) {
            val vals = try catalog.getPartitions(database, table) catch { case _: Exception => Nil }
            Some(PartitionMetadata(t.partitionKeys.map(_.name), vals))
          } else None
        CachedTableMetadata(System.currentTimeMillis(), ttype, t, partMeta, projections)
      }
      // Outside the retry (a definition error never heals): the
      // listing frames expose fixed columns (path, size, modTime, pv)
      // that partition-key withColumns would silently REPLACE,
      // corrupting positional row layout downstream — a partition
      // value would be read back as the file path.
      val clash = meta.table.partitionKeys.map(_.name)
        .filter(k => GlueTableEngine.ReservedListingColumns.contains(k.toLowerCase))
      if (clash.nonEmpty) throw new IllegalArgumentException(
        s"partition key(s) ${clash.mkString(", ")} of $database.$table collide with " +
          "the listing's reserved columns (path, size, modTime, pv)")
      meta
    }

  private def location(meta: CachedTableMetadata): String =
    meta.table.location.getOrElse(throw new IllegalStateException(
      s"No storage location found for ${meta.table.database}.${meta.table.name}"))

  private def normalizeDir(l: String): String = if (l.endsWith("/")) l else l + "/"

  /** Scheme-insensitive canonical form for path comparison: listed
    * paths come back scheme-qualified (`file:/...`, `s3a://bucket/...`)
    * while catalog locations are free-form (`/...`, `s3://bucket/...`).
    * Authority+path is enough to match a file to its partition dir —
    * a table's partitions live on one filesystem.
    *
    * MUST produce the same string as [[canonPathCol]] for the same
    * URI: driver-side literals from this function are compared
    * against columns canonicalized by that one (DV sidecar `isin`
    * filters, changelog position legs). `s3://bucket/k` therefore
    * canonicalizes to `/bucket/k` (leading slash, authority kept) —
    * exactly the regexp's output — not `bucket/k`.
    * PathCanonSpec pins the agreement across schemes.
    */
  private[graft] def canonPath(p: String): String = {
    val uri = new org.apache.hadoop.fs.Path(p).toUri
    Option(uri.getAuthority).filter(_.nonEmpty).map("/" + _).getOrElse("") + uri.getPath
  }

  /** Hive partitions whose catalog-declared `location` lies OUTSIDE
    * the table root, paired with their catalog values. Glue allows a
    * partition to live anywhere; the reference lists only the table
    * location (reference: src/util/s3.ts:34-58) and silently misses
    * such partitions — here each external location is listed
    * separately and its values are tagged from the CATALOG, since an
    * out-of-root path carries no `key=value` segments to extract.
    */
  private def outOfRootPartitions(meta: CachedTableMetadata): Seq[(PartitionInfo, Map[String, String])] = {
    // compare canonicalized (scheme-insensitive) forms: catalog
    // locations are free-form, and a raw-string compare would call
    // 's3a://bucket/tbl/k=a' external to root 's3://bucket/tbl',
    // listing that partition twice (root listing + external listing)
    val rootPrefix = normalizeDir(canonPath(location(meta)))
    val keys = meta.partitionMetadata.map(_.keys).getOrElse(Nil)
    meta.partitionMetadata.map(_.values).getOrElse(Nil)
      .filter(_.location.exists(l => !normalizeDir(canonPath(l)).startsWith(rootPrefix)))
      .map(pi => pi -> keys.zip(pi.values).toMap)
  }

  // ---------------------------------------------------------------- listing

  /** Cached recursive file listing (≈ reference `__listS3FilesCached`
    * / `__listS3IcebergFilesCached`, src/glue-table-cache.ts:349-466).
    */
  def files(database: String, table: String, versionOffset: Int = 0): Seq[S3FileInfo] = {
    val meta = tableMetadata(database, table)
    val key = s"$database.$table#v$versionOffset" // '.'/'#' delimiters: unambiguous for names with underscores
    listingCache.get(key) {
      Retry.withRetry() {
        meta.tableType match {
          case TableType.Iceberg =>
            // Sizes AND identity-partition values come from the
            // manifests themselves (spec fields
            // `data_file.file_size_in_bytes` / `data_file.partition`)
            // — zero extra metadata calls, and partitioned Iceberg
            // tables prune like Hive ones (the reference never prunes
            // Iceberg). Manifests carry no mtime; 0 = unknown.
            iceberg.dataFilesDetailed(location(meta), versionOffset)
              .map(f => S3FileInfo(f.path, f.partition, f.size, modTime = 0L,
                bounds = f.bounds, rowCount = f.rowCount))
          case TableType.Delta =>
            // Same zero-extra-I/O contract as Iceberg: sizes,
            // partition values, AND per-column stats ranges all come
            // from the transaction log (add actions / checkpoint);
            // the read path's skipping tier consumes the bounds
            // without any footer reads. The SAME replay also yields
            // the deletion-vector descriptors — ONE rawState replay
            // feeds both, and priming dvCache here means
            // countRows/readTable never replay the log (or re-read a
            // checkpoint) just to learn whether DVs exist.
            val (dfs, dvMap) =
              delta.filesAndDeletionVectors(location(meta), versionOffset)
            dvCache.get(s"$database.$table#dv#v$versionOffset")(dvMap)
            dfs.map(f => S3FileInfo(f.path, f.partition, f.size, modTime = 0L,
              bounds = f.bounds, rowCount = f.rowCount))
          case TableType.Hudi =>
            // COW latest-file-slice resolution from the .hoodie
            // timeline: a directory listing would double-count every
            // updated row (stale slice versions stay until cleaning).
            // Hive-style partition segments in the path still prune
            // via the standard extractors.
            hudi.dataFilesDetailed(location(meta), versionOffset)
              .map { f =>
                // commit-stat partitionPaths use Hive k=v segments;
                // surface them as listing partition values (parity
                // with Delta/Iceberg listings — pruning itself works
                // either way via the path extractors)
                val pv = f.partitionPath.split('/').iterator
                  .filter(_.contains('=')).map { seg =>
                    val Array(k, v) = seg.split("=", 2)
                    k -> java.net.URLDecoder.decode(v, "UTF-8")
                  }.toMap
                S3FileInfo(f.path, pv, f.size, modTime = 0L, bounds = Map.empty,
                  rowCount = None) // Hudi commit stats carry no row counts
              }
          case _ =>
            val root = lister.list(location(meta), meta.table.partitionKeys.map(_.name))
            val external = outOfRootPartitions(meta).flatMap { case (pi, vals) =>
              lister.list(pi.location.get, Nil).map(f => f.copy(partitionValues = vals))
            }
            root ++ external
        }
      }
    }
  }

  /** The listing DataFrame: `path` + one extracted partition-value
    * column per key — the in-engine analog of the reference's
    * `<db>_<tbl>_s3_listing` table (reference:
    * src/glue-table-cache.ts:298-306). The B-tree indexes the
    * reference adds (src/glue-table-cache.ts:308-312) are
    * intentionally dropped: the listing is a small in-memory
    * DataFrame, filtered with codegen'd predicates.
    */
  def listingDF(database: String, table: String): DataFrame = {
    val meta = tableMetadata(database, table)
    val fs = files(database, table)
    val sp = Shim.classic(spark)
    import sp.implicits._
    val base = fs.map(f => (f.path, f.partitionValues)).toList.toDF("path", "pv")
    attachKeyColumns(meta, base).drop("pv")
  }

  /** Attach one extracted partition-value column per key to a frame
    * with `path` (+ `pv`, the listing-time catalog values map)
    * columns. Shared by [[listingDF]] and the read path's
    * [[typedListing]] so pruning and reading can never disagree on a
    * partition value.
    */
  private def attachKeyColumns(meta: CachedTableMetadata, base: DataFrame): DataFrame =
    meta.table.partitionKeys.foldLeft(base) { (df, key) =>
      val extracted = Extractors.forKey(meta, key.name)(col("path"))
      // Out-of-root Hive partition files have no key=value path
      // segment at all (raw regexp_extract yields ""); only then fall
      // back to the catalog map attached at listing time. Keying on
      // the RAW match keeps __HIVE_DEFAULT_PARTITION__ mapped to null
      // rather than resurrected from the raw listing values.
      val value = meta.tableType match {
        case TableType.Hive =>
          val raw = regexp_extract(col("path"),
            java.util.regex.Pattern.quote(key.name) + "=([^/]+)", 1)
          when(length(raw) > 0, extracted).otherwise(element_at(col("pv"), key.name))
        // Iceberg/Delta: the manifest's partition record / the log's
        // partitionValues map is authoritative (paths need not encode
        // values); fall back to the path extractor only when the
        // metadata carries no partition data.
        case TableType.Iceberg | TableType.Delta =>
          coalesce(element_at(col("pv"), key.name), extracted)
        case _ => extracted
      }
      df.withColumn(key.name, value)
    }

  /** Pruned path list (≈ the reference's `SET VARIABLE db_tbl_files`
    * statement, src/glue-table-cache.ts:323-333), with the optional
    * proxy-address rewrite (src/glue-table-cache.ts:54-65, 235-239).
    */
  def prunedFiles(database: String, table: String, predicates: Seq[Column]): Seq[String] = {
    val pruned = predicates.foldLeft(listingDF(database, table))(_.filter(_))
    val paths = pruned.select("path").collect().map(_.getString(0)).toSeq
    config.proxyAddress match {
      case Some(proxy) => paths.map(_.replaceFirst("^s3://", proxy))
      case None        => paths
    }
  }

  // ---------------------------------------------------------------- reading

  /** Full (unpruned) DataFrame for a table — the analog of the
    * reference's `GLUE__db_tbl` view body (reference:
    * src/sql-transformer.ts:295-328). Empty table → 1-null-column
    * empty relation, matching the reference's `SELECT NULL LIMIT 0`
    * (src/sql-transformer.ts:322).
    */
  def tableDF(database: String, table: String, versionOffset: Int = 0): DataFrame =
    readTable(database, table, versionOffset, keep = None, proxied = false)

  /** Exact `COUNT(*)` from METADATA alone, cheapest source first:
    * files whose LISTING already carries a row count (Delta
    * add-action `stats.numRecords`, Iceberg manifest `record_count`)
    * contribute with ZERO per-file I/O — at 10M files the log/
    * manifest state the engine has already cached answers the whole
    * count, where one footer GET per file would be hours of driver
    * I/O. Only files the listing is silent about (plain Hive
    * layouts, statless adds) fall back to parallel KB-scale footer
    * reads; still no Spark job, no data pages. A real distributed
    * `count()` remains the backstop when the format isn't parquet, a
    * footer is unreadable, or the snapshot carries merge-on-read
    * delete files (per-file counts predate the deletes, so a
    * metadata sum would overcount).
    */
  def countRows(database: String, table: String, versionOffset: Int = 0): Long = {
    val meta = tableMetadata(database, table)
    val infos = files(database, table, versionOffset)
    if (infos.isEmpty) return 0L
    if (classification(meta) != "parquet")
      return tableDF(database, table, versionOffset).count()
    // MOR deletes subtract rows that every per-file count (listing
    // OR footer) still includes — only a real scan is exact
    if (meta.tableType == TableType.Iceberg &&
        iceberg.deleteFilesDetailed(location(meta), versionOffset).nonEmpty)
      return tableDF(database, table, versionOffset).count()
    // same cache the listing build primes: job-free on a warm table
    if (meta.tableType == TableType.Delta &&
        dvCache.get(s"$database.$table#dv#v$versionOffset") {
          delta.deletionVectors(location(meta), versionOffset)
        }.nonEmpty)
      return tableDF(database, table, versionOffset).count()
    val (known, unknown) = infos.partition(_.rowCount.isDefined)
    val knownSum = known.flatMap(_.rowCount).sum
    if (unknown.isEmpty) return knownSum
    val conf = hadoopConf
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(1, unknown.size)))
    val counts =
      try {
        import scala.jdk.CollectionConverters._
        val tasks = unknown.map { f =>
          new java.util.concurrent.Callable[Option[Long]] {
            override def call() = graft.listing.FooterStats.rowCount(conf, f.path)
          }
        }
        pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
      } finally pool.shutdown()
    if (counts.forall(_.isDefined)) knownSum + counts.flatten.sum
    else tableDF(database, table, versionOffset).count()
  }

  /** Incremental snapshot read: the rows ADDED to an Iceberg table
    * between two snapshots — the primitive behind incremental
    * pipeline runs ("process only what arrived since the last run").
    * `fromOffset` is the older snapshot (versions back from latest,
    * like [[tableDF]]'s `versionOffset`), `toOffset` the newer;
    * the result scans exactly the data files present in `to` but not
    * in `from` (append-only snapshot semantics — a file rewritten by
    * compaction would surface as "new", exactly as Iceberg's own
    * incremental scan treats non-append snapshots).
    *
    * Scale shape: the file-set diff is driver-side metadata from the
    * cached manifest listings (no filesystem walk), and the scan
    * plans ONLY the added files — cost is proportional to the delta,
    * not the table. At 100 TB with daily appends this is the
    * difference between a 100 TB scan and a 100 GB one.
    */
  def tableDFIncremental(database: String, table: String,
      fromOffset: Int, toOffset: Int = 0): DataFrame = {
    require(fromOffset > toOffset,
      s"fromOffset ($fromOffset) must be OLDER (greater) than toOffset ($toOffset)")
    val older = files(database, table, fromOffset).map(_.path).toSet
    readTable(database, table, toOffset,
      keep = Some(files(database, table, toOffset).map(_.path).toSet -- older),
      proxied = false)
  }

  /** Changelog partition-value attachment: `(raw, fpCol) => raw +
    * typed partition columns`, for CDC legs that read leaf data files
    * directly — a partitioned lakehouse table's data files don't hold
    * their partition columns, so they're recovered from the LOG /
    * MANIFEST partition records (the same authoritative source the
    * scan path uses) as a tiny driver-built `(canonical path ->
    * values)` frame broadcast-joined on the canonical file path.
    * Candidate sets are CDC-small by contract, so the join stays a
    * narrow broadcast at any table size. LEFT join + loud per-row
    * guard (ADVICE r14 low): a scanned file missing from the
    * metadata-derived map means canonicalization drift, and an inner
    * join would silently DROP its change rows from the CDC stream —
    * here it raises instead.
    */
  private[graft] def partitionValuesAttach(database: String, table: String,
      meta: CachedTableMetadata, fromOffset: Int,
      toOffset: Int): (DataFrame, String) => DataFrame =
    if (meta.table.partitionKeys.isEmpty) (raw0, _) => raw0
    else {
      val pSchema = partitionSchemaOf(meta)
      val pvByPath = (files(database, table, toOffset) ++
          files(database, table, fromOffset))
        .map(f => canonPath(f.path) -> f.partitionValues).toMap
      (raw0, fpCol) => {
        import scala.jdk.CollectionConverters._
        val rows = pvByPath.toSeq.sortBy(_._1).map { case (p, pv) =>
          org.apache.spark.sql.Row.fromSeq(
            (p +: meta.table.partitionKeys.map(k => pv.get(k.name).orNull)) :+
              java.lang.Boolean.TRUE)
        }
        // attach under reserved __pv_ names: a MIXED-GENERATION table
        // (partition-spec evolution adopted a key some files predate)
        // can hand a raw frame that already CARRIES a partition column
        // as file bytes — joining same-named columns would be
        // ambiguous, and blind withColumn would overwrite real values
        val strSchema = StructType(
          (StructField(fpCol, StringType, nullable = false) +:
            meta.table.partitionKeys.map(k =>
              StructField(s"__pv_${k.name}", StringType, nullable = true))) :+
            StructField("__pv_hit", BooleanType, nullable = true))
        val pvDf0 = spark.createDataFrame(
          new java.util.ArrayList(rows.asJava), strSchema)
        val pvDf = meta.table.partitionKeys.foldLeft(pvDf0) { (d, k) =>
          d.withColumn(s"__pv_${k.name}",
            col(s"__pv_${k.name}").cast(pSchema(k.name).dataType))
        }
        val joined = raw0.join(broadcast(pvDf), Seq(fpCol), "left")
          // the miss guard is a FILTER, not a projection rider (ADVICE
          // r15 low): a Filter condition is evaluated for EVERY row
          // whatever the consumer projects, so a scanned file missing
          // from the metadata-derived map (canonicalization drift)
          // raises even when no partition column survives downstream
          // pruning — it can never silently pass null partition values
          // into the CDC stream. A file PRESENT in the map whose
          // record merely lacks a key is NOT a miss: pre-spec-
          // evolution files carry no value for later-adopted keys and
          // surface null (the pruner's keep-on-unknown rule, read
          // side) or their own file bytes below.
          .filter(when(col("__pv_hit").isNull,
            raise_error(concat(
              lit(s"changelog partition attach miss for $database.$table: "),
              col(fpCol)))).otherwise(lit(true)))
        val rawCols = raw0.columns.toSet
        val valued = meta.table.partitionKeys.foldLeft(joined) { (d, k) =>
          // metadata record first (authoritative for partitionBy-
          // written files, which hold no column bytes); fall back to
          // the file's own column for generations written before the
          // key joined the partition spec
          val v = if (rawCols(k.name))
            coalesce(col(s"__pv_${k.name}"), col(k.name))
          else col(s"__pv_${k.name}")
          d.withColumn(k.name, v)
        }
        valued.drop(
          meta.table.partitionKeys.map(k => s"__pv_${k.name}") :+ "__pv_hit": _*)
      }
    }

  /** NET row-level CHANGES of a Delta table between two versions —
    * the change-data-feed read an incremental consumer runs: every
    * emitted row carries `_change_type` 'insert' (present at `to`,
    * absent at `from`) or 'delete' (the reverse). Three legs, all
    * file-level metadata diffs first:
    *   - files added between the versions → their rows at `to`
    *     (deletion vectors applied) as inserts;
    *   - files removed → their rows at `from` as deletes;
    *   - files in BOTH whose deletion-vector descriptor changed →
    *     exact row-level deltas: newly-deleted positions as deletes,
    *     un-deleted positions (a restore rolled a DV back) as
    *     inserts — read by joining the raw file against the sidecar
    *     position sets, nothing rescanned beyond the changed files.
    * A copy-on-write rewrite therefore surfaces as delete+insert of
    * the rewritten file's rows (Iceberg changelog-scan semantics for
    * replace snapshots); MOR commits surface exact row deltas. Scale:
    * the version diff is driver-side metadata; scans touch only
    * changed files, and sidecar position sets broadcast.
    */
  def deltaChanges(database: String, table: String, fromOffset: Int,
      toOffset: Int = 0): DataFrame = {
    require(fromOffset > toOffset && toOffset >= 0,
      s"need fromOffset > toOffset >= 0, got $fromOffset -> $toOffset")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    val loc = location(meta)
    val fromFiles = files(database, table, fromOffset).map(_.path).toSet
    val toFiles = files(database, table, toOffset).map(_.path).toSet
    val dvFrom = delta.deletionVectors(loc, fromOffset)
    val dvTo = delta.deletionVectors(loc, toOffset)
    val ct = "_change_type"
    val legs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val added = toFiles -- fromFiles
    if (added.nonEmpty)
      legs += readTable(database, table, toOffset, keep = Some(added), proxied = false)
        .withColumn(ct, lit("insert"))
    val removed = fromFiles -- toFiles
    if (removed.nonEmpty)
      legs += readTable(database, table, fromOffset, keep = Some(removed), proxied = false)
        .withColumn(ct, lit("delete"))
    val dvChanged = (fromFiles intersect toFiles).toSeq.sorted
      .filter(p => dvFrom.get(p) != dvTo.get(p))
    if (dvChanged.nonEmpty) {
      def posDf(dv: Map[String, String]): DataFrame = {
        val byDv = dvChanged.flatMap(p => dv.get(p).map(d => (p, d))).groupBy(_._2)
        if (byDv.isEmpty)
          spark.range(0).select(col("id").cast("string").as("__fp"), col("id").as("__pos"))
        else byDv.toSeq.sortBy(_._1).map { case (dvPath, pairs) =>
          val fps = pairs.map { case (p, _) => canonPath(p) }
          spark.read.parquet(dvPath)
            .select(canonPathCol(col("file_path")).as("__fp"), col("pos").as("__pos"))
            .filter(col("__fp").isin(fps: _*))
        }.reduce(_.unionAll(_))
      }
      val pFrom = posDf(dvFrom)
      val pTo = posDf(dvTo)
      // mapped tables: raw files carry PHYSICAL names; the other legs
      // (readTable) emit logical ones — rename so the union agrees
      val mapping = delta.dataSchemaAt(loc, toOffset)
        .map(graft.listing.DeltaLogWriter.mappingOf).getOrElse(Map.empty)
      val raw0 = mapping.foldLeft(spark.read.parquet(dvChanged: _*)) {
          case (d, (l, ph)) => d.withColumnRenamed(ph, l)
        }
        .withColumn("__fp", canonPathCol(col("_metadata").getField("file_path")))
        .withColumn("__pos", col("_metadata").getField("row_index"))
      // partitioned tables: the raw leaf files don't hold the
      // partition columns the added/removed legs (readTable) emit —
      // attach them from the LOG's add-action partitionValues (r14
      // verdict ask #4, the exact recipe g66 used for Iceberg)
      val raw = partitionValuesAttach(database, table, meta,
        fromOffset, toOffset)(raw0, "__fp")
      def leg(pos: DataFrame, kind: String): DataFrame =
        raw.join(broadcast(pos), Seq("__fp", "__pos"))
          .drop("__fp", "__pos").withColumn(ct, lit(kind))
      legs += leg(pTo.join(pFrom, Seq("__fp", "__pos"), "left_anti"), "delete")
      legs += leg(pFrom.join(pTo, Seq("__fp", "__pos"), "left_anti"), "insert")
    }
    if (legs.isEmpty)
      readTable(database, table, toOffset, keep = None, proxied = false)
        .withColumn(ct, lit("")).limit(0)
    else legs.reduce(_.unionByName(_))
  }

  /** [[deltaChanges]] for ICEBERG — the changelog scan between two
    * snapshots: files added or removed between the versions surface
    * whole (the destination version's MOR deletes applied), and
    * POSITION-DELETE deltas over files live in both versions surface
    * exact row-level changes — newly-deleted positions as deletes,
    * positions un-deleted by a rollback as inserts (LIVENESS sets
    * are diffed, so a row re-deleted through a second delete file is
    * never double-emitted). Position-only deltas never scan data
    * files beyond the ones the delete files name; equality-delete
    * deltas (any MERGE-produced range) evaluate liveness at both
    * snapshots over the sequence-eligible candidate files with the
    * scan path's own delete application — one code path, identical
    * scoping. Same scale contract: driver-side metadata diff, scans
    * bounded to candidate files, position sets broadcast (CDC deltas
    * are small relative to the table by contract).
    */
  def icebergChanges(database: String, table: String, fromOffset: Int,
      toOffset: Int = 0): DataFrame = {
    require(fromOffset > toOffset && toOffset >= 0,
      s"need fromOffset > toOffset >= 0, got $fromOffset -> $toOffset")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val loc = location(meta)
    val fromFiles = files(database, table, fromOffset).map(_.path).toSet
    val toFiles = files(database, table, toOffset).map(_.path).toSet
    val ct = "_change_type"
    val legs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val added = toFiles -- fromFiles
    if (added.nonEmpty)
      legs += readTable(database, table, toOffset, keep = Some(added), proxied = false)
        .withColumn(ct, lit("insert"))
    val removed = fromFiles -- toFiles
    if (removed.nonEmpty)
      legs += readTable(database, table, fromOffset, keep = Some(removed), proxied = false)
        .withColumn(ct, lit("delete"))
    val delFrom = iceberg.deleteFilesDetailed(loc, fromOffset)
    val delTo = iceberg.deleteFilesDetailed(loc, toOffset)
    val delDelta = (delTo.map(_.path).toSet -- delFrom.map(_.path).toSet) ++
      (delFrom.map(_.path).toSet -- delTo.map(_.path).toSet)
    if (delDelta.nonEmpty) {
      // Partitioned tables: raw leaf-file reads don't see Hive-layout
      // partition columns, so attach them from the MANIFEST partition
      // records (the same authoritative source the scan path uses —
      // paths need not encode values). A tiny driver-built
      // (path -> values) frame broadcast-joined on the canonical file
      // path: candidate sets are CDC-small by contract, and the join
      // stays a narrow broadcast at any table size.
      // Mapped tables (a rename/drop happened): raw leaf files hold
      // PHYSICAL column names; the added/removed legs (readTable) and
      // the caller's schema are LOGICAL. Delete evaluation stays
      // physical (equality ids resolve to physical names, binding to
      // what the files hold); the legs project physical->logical in
      // ONE select at construction — mirroring the Delta changelog leg.
      val toLogical: DataFrame => DataFrame = {
        val mapping = iceberg.dataSchemaAt(loc, toOffset)
          .map(IcebergSnapshotResolver.mappingOf).getOrElse(Map.empty)
        if (mapping.isEmpty) identity
        else {
          val logicalByPhys = mapping.map(_.swap)
          df => df.select(df.columns.map(c =>
            df.col("`" + c + "`").as(logicalByPhys.getOrElse(c, c))).toSeq: _*)
        }
      }
      val attachParts: (DataFrame, String) => DataFrame = {
        val attach = partitionValuesAttach(database, table, meta, fromOffset, toOffset)
        (raw0, fpCol) => toLogical(attach(raw0, fpCol))
      }
      val commonRaw = (fromFiles intersect toFiles).toSeq.sorted
      val common = commonRaw.map(canonPath)
      val deltaDels = (delFrom ++ delTo).filter(d => delDelta(d.path))
      val eqDeltas = deltaDels.filter(_.content == 2)
      if (eqDeltas.isEmpty) {
        // FAST PATH — position-delete deltas only: the changed
        // positions are read straight from the (small) delete files,
        // diffed as sets, and only the data files those sets name are
        // ever scanned. No predicate evaluation needed.
        def posDf(dels: Seq[IcebergSnapshotResolver#IcebergDeleteFile]): DataFrame = {
          val pos = dels.filter(_.content == 1).map(_.path).distinct.sorted
          if (pos.isEmpty)
            spark.range(0).select(col("id").cast("string").as("__fp"), col("id").as("__pos"))
          else spark.read.parquet(pos: _*)
            .select(canonPathCol(col("file_path")).as("__fp"), col("pos").as("__pos"))
            .filter(col("__fp").isin(common: _*))
        }
        val pFrom = posDf(delFrom)
        val pTo = posDf(delTo)
        val newlyDel = pTo.join(pFrom, Seq("__fp", "__pos"), "left_anti")
        val revived = pFrom.join(pTo, Seq("__fp", "__pos"), "left_anti")
        // scan only files actually named by the delta position sets
        val touched = (newlyDel.unionAll(revived)).select("__fp").distinct()
          .collect().map(_.getString(0)).toSet
        if (touched.nonEmpty) {
          val rawPaths = commonRaw.filter(p => touched(canonPath(p)))
          val raw = spark.read.parquet(rawPaths: _*)
            .withColumn("__fp", canonPathCol(col("_metadata").getField("file_path")))
            .withColumn("__pos", col("_metadata").getField("row_index"))
          def leg(pos: DataFrame, kind: String): DataFrame =
            attachParts(raw.join(broadcast(pos), Seq("__fp", "__pos")), "__fp")
              .drop("__fp", "__pos").withColumn(ct, lit(kind))
          legs += leg(newlyDel, "delete")
          legs += leg(revived, "insert")
        }
      } else {
        // GENERAL PATH — the delete delta includes EQUALITY deletes
        // (r12 verdict ask #3: any MERGE-produced snapshot range hits
        // this; refusing made CDC internally inconsistent with the
        // scan path, which applies them). An equality delete names no
        // positions, so liveness is EVALUATED: read the candidate
        // files once, apply each snapshot's full delete stack with
        // the same strictly-smaller-sequence scoping as the scan path
        // (applyIcebergDeletes — one code path, no drift), and diff
        // the surviving position sets.
        //
        // Candidate set (the 100 TB bound): common files a CHANGED
        // delete could affect — files named by changed position-
        // delete files, plus files sequence-eligible for a changed
        // equality delete (data sequence strictly smaller; 0 =
        // unknown applies unscoped). Files outside it cannot change
        // liveness and are never scanned. An equality delete at the
        // head sequence makes every older common file a candidate —
        // that rescan is the inherent cost of exact net row-level
        // CDC over predicate deletes, paid only on ranges that
        // contain one.
        val seqFrom = iceberg.dataFilesDetailed(loc, fromOffset)
          .map(f => canonPath(f.path) -> f.seq).toMap
        val seqTo = iceberg.dataFilesDetailed(loc, toOffset)
          .map(f => canonPath(f.path) -> f.seq).toMap
        val posDeltaPaths = deltaDels.filter(_.content == 1).map(_.path).distinct.sorted
        val posNamed: Set[String] =
          if (posDeltaPaths.isEmpty) Set.empty
          else spark.read.parquet(posDeltaPaths: _*)
            .select(canonPathCol(col("file_path"))).distinct()
            .collect().map(_.getString(0)).toSet
        def eqEligible(cp: String): Boolean = {
          val s = seqTo.getOrElse(cp, seqFrom.getOrElse(cp, 0L))
          eqDeltas.exists(e => e.seq == 0L || s == 0L || s < e.seq)
        }
        val cands = commonRaw.filter { p =>
          val cp = canonPath(p); posNamed(cp) || eqEligible(cp)
        }
        if (cands.nonEmpty) {
          val raw = spark.read.parquet(cands: _*)
            .withColumn("__lfp", canonPathCol(col("_metadata").getField("file_path")))
            .withColumn("__lpos", col("_metadata").getField("row_index"))
          def livePos(dels: Seq[IcebergSnapshotResolver#IcebergDeleteFile],
              off: Int): DataFrame = {
            val seqMap = iceberg.dataFilesDetailed(loc, off).map(f => f.path -> f.seq).toMap
            applyIcebergDeletes(raw, dels, seqMap)
              .select(col("__lfp").as("__fp"), col("__lpos").as("__pos"))
          }
          val pFrom = livePos(delFrom, fromOffset)
          val pTo = livePos(delTo, toOffset)
          val newlyDel = pFrom.join(pTo, Seq("__fp", "__pos"), "left_anti")
          val revived = pTo.join(pFrom, Seq("__fp", "__pos"), "left_anti")
          def leg(pos: DataFrame, kind: String): DataFrame =
            attachParts(raw.join(broadcast(pos),
                col("__lfp") === col("__fp") && col("__lpos") === col("__pos")), "__lfp")
              .drop("__lfp", "__lpos", "__fp", "__pos").withColumn(ct, lit(kind))
          legs += leg(newlyDel, "delete")
          legs += leg(revived, "insert")
        }
      }
    }
    if (legs.isEmpty)
      readTable(database, table, toOffset, keep = None, proxied = false)
        .withColumn(ct, lit("")).limit(0)
    else legs.reduce(_.unionByName(_))
  }

  /** [[deltaChanges]] / [[icebergChanges]] for HUDI — completing the
    * CDC row of the format matrix. Hudi COW rewrites whole file
    * GROUPS on upsert/delete, so the net row-level diff comes from a
    * content diff over the TOUCHED slices only: rows of slices live
    * at `toOffset` but not `fromOffset` minus rows of the replaced
    * slices (exceptAll) are the inserts; the mirror diff is the
    * deletes. An update surfaces as one delete (old content) + one
    * insert (new content); rows the rewrite carried over unchanged
    * cancel exactly. Untouched file groups are never scanned, so the
    * scan is bounded by the churned slices — at 100 TB the cost of
    * CDC is proportional to the change, not the table. One
    * whole-row-keyed shuffle for each exceptAll.
    */
  def hudiChanges(database: String, table: String, fromOffset: Int,
      toOffset: Int = 0): DataFrame = {
    require(fromOffset > toOffset && toOffset >= 0,
      s"need fromOffset > toOffset >= 0, got $fromOffset -> $toOffset")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Hudi,
      s"$database.$table is ${meta.tableType}, not a Hudi table")
    val fromFiles = files(database, table, fromOffset).map(_.path).toSet
    val toFiles = files(database, table, toOffset).map(_.path).toSet
    val ct = "_change_type"
    val changedFrom = (fromFiles -- toFiles).toSeq.sorted
    val changedTo = (toFiles -- fromFiles).toSeq.sorted
    if (changedFrom.isEmpty && changedTo.isEmpty)
      return readTable(database, table, toOffset, keep = None, proxied = false)
        .withColumn(ct, lit("")).limit(0)
    def rowsOf(paths: Seq[String], off: Int): DataFrame =
      if (paths.isEmpty)
        readTable(database, table, off, keep = None, proxied = false).limit(0)
      else readTable(database, table, off, keep = Some(paths.toSet), proxied = false)
    val fromRows = rowsOf(changedFrom, fromOffset)
    val toRows = rowsOf(changedTo, toOffset)
    toRows.exceptAll(fromRows).withColumn(ct, lit("insert"))
      .unionByName(fromRows.exceptAll(toRows).withColumn(ct, lit("delete")))
  }

  // -------- schema resolution

  private def classification(meta: CachedTableMetadata): String =
    meta.table.parameters.getOrElse("classification", "parquet").toLowerCase

  /** XML record element name — Glue crawlers store it as the `rowTag`
    * table parameter.
    */
  private def xmlRowTag(meta: CachedTableMetadata): String =
    meta.table.parameters.getOrElse("rowTag", "row")

  /** Partition-column type in the read plan: pattern-implied for
    * projection keys (integer projection yields ints; date/enum
    * extract strings), catalog-declared otherwise.
    */
  private def partitionType(meta: CachedTableMetadata, key: String): DataType =
    meta.tableType match {
      case TableType.GlueProjected =>
        val ptype = meta.projectionPatterns.flatMap(_.get(key)).map(_.ptype)
        if (ptype.contains("integer")) IntegerType else StringType
      case _ =>
        meta.table.partitionKeys.find(_.name == key)
          .map(c => DataType.fromDDL(c.dataType)).getOrElse(StringType)
    }

  private def partitionSchemaOf(meta: CachedTableMetadata): StructType =
    StructType(meta.table.partitionKeys.map(k =>
      StructField(k.name, partitionType(meta, k.name), nullable = true)))

  /** Data (non-partition) schema. Catalog-declared columns (Glue
    * StorageDescriptor.Columns) make the read schema-first: no
    * CSV/JSON inference scan, no parquet footer merge — mandatory at
    * scale, where an inference pass would read the whole table once
    * before the query. Without declared columns, infer from a SINGLE
    * file (Spark's own non-mergeSchema parquet read is equally
    * single-footer). Keyed by that file's path — data files are
    * immutable, so a changed listing re-infers.
    */
  private val inferredSchemas = scala.collection.concurrent.TrieMap.empty[String, StructType]
  private def dataSchemaOf(meta: CachedTableMetadata, fmt: String, firstPath: String,
      versionOffset: Int = 0): StructType = {
    val declared = Option(meta.table.columns).filter(_.nonEmpty).map { cols =>
      StructType(cols.map(c => StructField(c.name, DataType.fromDDL(c.dataType))))
    }
    // DELTA: the log's metaData is the authoritative schema — under
    // additive evolution, single-file inference would read from a
    // pre-evolution file and silently drop the added columns. Cached
    // per table+offset; invalidateTable clears it.
    val fromLog: Option[StructType] =
      if (declared.isEmpty && meta.tableType == TableType.Delta) {
        val k = s"${meta.table.database}.${meta.table.name}#logschema#v$versionOffset"
        inferredSchemas.get(k).orElse {
          val s = delta.dataSchemaAt(location(meta), versionOffset)
          s.foreach(inferredSchemas.put(k, _)); s
        }
      } else None
    val raw = declared.orElse(fromLog).getOrElse(inferredSchemas.getOrElseUpdate(firstPath, fmt match {
      case "csv"  => spark.read.option("header", "true").option("inferSchema", "true").csv(firstPath).schema
      case "json" => spark.read.json(firstPath).schema
      case "orc"  => spark.read.orc(firstPath).schema
      case "xml"  => spark.read.option("rowTag", xmlRowTag(meta)).xml(firstPath).schema
      case "avro" => graft.sources.AvroSource.inferSchema(hadoopConf, firstPath)
      case _      => spark.read.parquet(firstPath).schema
    }))
    // ICEBERG: EXTEND the inferred schema with metadata-schema
    // columns no sampled file carries yet (additive evolution — a
    // column added by a later writer exists in the metadata first
    // and must read back as nulls, not vanish). Extension only:
    // hand-built or minimal metadata schemas (subset of the files')
    // must never SHRINK the read schema.
    val extended =
      if (declared.isEmpty &&
          (meta.tableType == TableType.Iceberg || meta.tableType == TableType.Hudi)) {
        val k = s"${meta.table.database}.${meta.table.name}#logschema#v$versionOffset"
        val metaSchema = inferredSchemas.get(k).orElse {
          val s =
            if (meta.tableType == TableType.Iceberg)
              iceberg.dataSchemaAt(location(meta), versionOffset)
            else // Hudi: per-commit schema in the timeline's extraMetadata
              graft.listing.HudiTimelineWriter.dataSchemaAt(spark, location(meta), versionOffset)
          s.foreach(inferredSchemas.put(k, _)); s
        }
        metaSchema.fold(raw) { ms =>
          // MAPPED mode (a rename/drop happened): the metadata/
          // timeline schema is AUTHORITATIVE, not an extension —
          // inference from a file would resurrect dropped bytes and
          // surface physical (pre-rename) names. Only this engine's
          // evolution commits set the flag, and they carry the
          // complete schema by construction.
          if (graft.listing.IcebergSnapshotResolver.isMapped(ms) ||
              graft.listing.HudiTimelineWriter.isMapped(ms)) ms
          else {
            val have = raw.fieldNames.map(_.toLowerCase).toSet
            StructType(raw.fields ++ ms.fields.filterNot(f => have(f.name.toLowerCase)))
          }
        }
      } else raw
    // Partition keys live in the partition schema, never the data
    // schema (a `partitionBy` writer never writes them into files).
    val keyNames = meta.table.partitionKeys.map(_.name.toLowerCase).toSet
    StructType(extended.filterNot(f => keyNames.contains(f.name.toLowerCase)))
  }

  // -------- typed listing

  /** The full listing of one table version as collected local rows
    * `(path, size, modTime, key1…keyN)`, partition values typed per
    * [[partitionType]] — the driver-side seed of the
    * [[PreListedFileIndex]]. Values are computed by the SAME
    * extractor columns as [[listingDF]] (shared
    * [[attachKeyColumns]]), so pruning and reading can never disagree
    * on a partition value. Cached with the listing TTL: the
    * evaluation is one local job over O(#files) rows, driver-side
    * metadata only — same cost class as the listing itself.
    */
  private def typedListing(database: String, table: String,
      versionOffset: Int): (StructType, Seq[Row]) =
    typedCache.get(s"$database.$table#typed#v$versionOffset") {
      val meta = tableMetadata(database, table)
      val infos = files(database, table, versionOffset)
      val pSchema = partitionSchemaOf(meta)
      val sp = Shim.classic(spark)
      import sp.implicits._
      val base = infos.map(f => (f.path, f.size, f.modTime, f.partitionValues))
        .toList.toDF("path", "size", "modTime", "pv")
      val typed = meta.table.partitionKeys.foldLeft(attachKeyColumns(meta, base)) {
        (df, k) => df.withColumn(k.name, col(k.name).cast(pSchema(k.name).dataType))
      }
      (pSchema, typed.drop("pv").collect().toSeq)
    }

  // -------- the read

  /** Read a table (optionally a kept subset of its files) through a
    * [[PreListedFileIndex]]: the scan plans over the `FileStatus`es
    * captured at listing time — sizes for split planning and
    * broadcast statistics, partition values as REAL partition
    * columns. Spark's `FileSourceStrategy` then pushes the query's
    * partition conjuncts into the index natively — per-relation,
    * correctly typed/unescaped, and sound under OR/CTE/joins. One
    * uniform path replaces the previous per-layout branches
    * (basePath discovery / `input_file_name()` extractors /
    * out-of-root unions), because the index attaches values itself.
    *
    * The reference declares JSON/CSV tables "not supported yet"
    * (reference README.md:22-23); supporting them here is a
    * deliberate extension — same listing machinery, different
    * `FileFormat` leaf.
    */
  private def readTable(database: String, table: String, versionOffset: Int,
      keep: Option[Set[String]], proxied: Boolean): DataFrame = {
    val meta = tableMetadata(database, table)
    val (pSchema, allRows) = typedListing(database, table, versionOffset)
    val rows = keep.fold(allRows)(k => allRows.filter(r => k(r.getString(0))))
    val fmt = classification(meta)
    if (rows.isEmpty)
      return spark.range(0).select(lit(null).cast("string").as("null"))
    // Reads of a pruned selection go through the optional HTTP cache
    // proxy, like the reference's files-variable scan (reference:
    // src/glue-table-cache.ts:54-65, 235-239); full-table reads don't.
    val rewrite: String => String =
      if (proxied) p => config.proxyAddress.fold(p)(proxy => p.replaceFirst("^s3://", proxy))
      else identity
    val nFixed = 3 // path, size, modTime
    val converter = CatalystTypeConverters.createToCatalystConverter(pSchema)
    val partitions = rows
      .groupBy(r => Row.fromSeq((nFixed until nFixed + pSchema.length).map(r.get)))
      .toSeq.sortBy(_._1.toString) // deterministic partition order
      .map { case (kv, rs) =>
        val ir = converter(kv).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val statuses = rs.map(r => new FileStatus(r.getLong(1), false, 1,
          128L * 1024 * 1024, r.getLong(2), new HadoopPath(rewrite(r.getString(0)))))
        (ir, statuses)
      }
    val dataSchema = dataSchemaOf(meta, fmt, rows.head.getString(0), versionOffset)
    // COLUMN MAPPING (Delta name mode / Iceberg field-id renames): a
    // renamed table's files carry the original PHYSICAL column names;
    // the log/metadata schema carries the logical ones plus the
    // physicalName annotation. Scan with the PHYSICAL schema (so
    // vectorized reads, pushed filters, and the stats-skipping tier
    // all bind to what the files hold), then project
    // physical->logical at the end. Unmapped tables take the identity
    // fast path.
    val colMapping: Map[String, String] = meta.tableType match {
      case TableType.Delta   => graft.listing.DeltaLogWriter.mappingOf(dataSchema)
      case TableType.Iceberg => graft.listing.IcebergSnapshotResolver.mappingOf(dataSchema)
      case TableType.Hudi    => graft.listing.HudiTimelineWriter.mappingOf(dataSchema)
      case _                 => Map.empty
    }
    val scanSchema =
      if (colMapping.isEmpty) dataSchema
      else StructType(dataSchema.fields.map(f =>
        f.copy(name = colMapping.getOrElse(f.name, f.name))))
    // File-level data skipping (Delta/Iceberg-style): per-file column
    // ranges, preferred source first —
    //  1. Iceberg manifests' lower/upper_bounds: already decoded into
    //     the cached listing (S3FileInfo.bounds) — zero extra I/O and
    //     no cap — this is the 10M-file path;
    //  2. parquet/ORC footers, read once per listing TTL on the
    //     driver (parallel KB-scale GETs) and capped by
    //     footerStatsMaxFiles.
    // Beyond the cap / for other formats / bound-less manifests the
    // map stays empty and skipping degrades to a no-op.
    val statsByPath: Map[String, Map[String, graft.listing.ColRange]] = {
      val cached = statsCache.get(s"$database.$table#stats#v$versionOffset") {
        val fromListing = files(database, table, versionOffset)
          .filter(_.bounds.nonEmpty).map(f => f.path -> f.bounds).toMap
        if (fromListing.nonEmpty) fromListing
        else if ((fmt == "parquet" || fmt == "orc") &&
            allRows.size <= config.footerStatsMaxFiles && config.footerStatsMaxFiles > 0) {
          val read: String => Map[String, graft.listing.ColRange] =
            if (fmt == "orc") graft.listing.FooterStats.readOrc(hadoopConf, _)
            else graft.listing.FooterStats.read(hadoopConf, _)
          // parallel driver-side fetch: serial footer GETs over S3
          // (~tens of ms each) would stall first-query planning by
          // minutes at the cap
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(16, math.max(1, allRows.size)))
          try {
            import scala.jdk.CollectionConverters._
            val tasks = allRows.map { r =>
              val p = r.getString(0)
              new java.util.concurrent.Callable[(String, Map[String, graft.listing.ColRange])] {
                override def call() = p -> read(p)
              }
            }
            pool.invokeAll(tasks.asJava).asScala.map(_.get()).toMap
          } finally pool.shutdown()
        } else Map.empty[String, Map[String, graft.listing.ColRange]]
      }
      val visible = if (proxied) cached.map { case (p, s) => rewrite(p) -> s } else cached
      // Key by Hadoop Path canonical form: listFiles looks ranges up
      // via FileStatus.getPath.toString, which normalizes the raw
      // listing string (duplicate slashes in S3 keys, trailing
      // slashes). A key/lookup mismatch is safe but silently turns
      // skipping off for that file.
      visible.map { case (p, s) => new HadoopPath(p).toString -> s }
    }
    val options: Map[String, String] = fmt match {
      // With a declared schema Spark binds CSV columns BY POSITION
      // and ignores header names; enforceSchema=false makes every
      // file's header get checked against the declared names at scan
      // time (executor-side, so it scales), failing loudly instead
      // of silently misassigning data when the catalog's column
      // order drifts from the files'.
      case "csv" if meta.table.columns.nonEmpty =>
        Map("header" -> "true", "enforceSchema" -> "false")
      case "csv" => Map("header" -> "true")
      case "xml" => Map("rowTag" -> xmlRowTag(meta))
      case _     => Map.empty
    }
    val base = PreListedFileIndex.dataFrame(spark, PreListedFileIndex.formatFor(fmt), options,
      scanSchema, pSchema, partitions, Seq(new HadoopPath(location(meta))), statsByPath)
    // Iceberg v2 merge-on-read: subtract live DELETE files. Position
    // deletes anti-join on (_metadata.file_path, _metadata.row_index)
    // — Spark's generated parquet metadata columns, so the base scan
    // stays a plain vectorized read and the (tiny) delete set
    // broadcasts; equality deletes anti-join null-safely on their
    // declared columns. Cost ∝ delete-file rows, never a data rewrite
    // — exactly Iceberg's own MOR contract.
    val merged = if (meta.tableType == TableType.Iceberg) {
      val deletes = deleteCache.get(s"${meta.table.database}.${meta.table.name}#del#v$versionOffset") {
        iceberg.deleteFilesDetailed(location(meta), versionOffset)
      }
      if (deletes.isEmpty) base
      else {
        val dataSeq = seqCache.get(s"${meta.table.database}.${meta.table.name}#seq#v$versionOffset") {
          iceberg.dataFilesDetailed(location(meta), versionOffset)
            .map(f => f.path -> f.seq).toMap // raw paths; canonicalized at join time
        }
        applyIcebergDeletes(base, deletes, dataSeq)
      }
    } else if (meta.tableType == TableType.Delta) {
      // Delta merge-on-read: subtract deletion-vector rows. Same
      // anti-join shape as Iceberg position deletes; per live
      // descriptor, only rows naming files that CURRENTLY point at
      // that sidecar apply (a superseded sidecar's rows for a re-DV'd
      // file are a subset of its replacement's, and a rewritten file
      // has a new physical path its old rows can never match).
      val dvs = dvCache.get(s"${meta.table.database}.${meta.table.name}#dv#v$versionOffset") {
        delta.deletionVectors(location(meta), versionOffset)
      }
      if (dvs.isEmpty) base
      else {
        val del = dvs.groupBy(_._2).toSeq.sortBy(_._1).map { case (dvPath, m) =>
          // canonPath (NOT .toUri.getPath, which drops the authority
          // of object-store URIs) so the isin literals match the
          // sidecar's canonPathCol-canonicalized file_path values
          val files = m.keySet.toSeq.map(canonPath)
          spark.read.parquet(dvPath)
            .select(canonPathCol(col("file_path")).as("__del_fp"),
              col("pos").as("__del_pos"))
            .filter(col("__del_fp").isin(files: _*))
        }.reduce(_.unionAll(_))
        base
          .withColumn("__fp", canonPathCol(col("_metadata").getField("file_path")))
          .withColumn("__pos", col("_metadata").getField("row_index"))
          .join(broadcast(del),
            col("__fp") === col("__del_fp") && col("__pos") === col("__del_pos"), "left_anti")
          .drop("__fp", "__pos")
      }
    } else base
    if (colMapping.isEmpty) merged
    else merged.select(
      dataSchema.fields.toSeq.map(f =>
        col(colMapping.getOrElse(f.name, f.name)).as(f.name)) ++
        pSchema.fields.toSeq.map(f => col(f.name)): _*)
  }

  /** Scheme-insensitive canonical path column (delete files record
    * raw writer paths; `_metadata.file_path` is a qualified URI).
    *
    * Also DECODES URI %-escapes: `_metadata.file_path` is a proper
    * URI where a space in a partition value rides as `%20`, while
    * manifests/logs carry the literal writer path — without decoding,
    * every path-keyed comparison (MOR delete application, DV sidecar
    * filters, changelog legs, sequence scoping) silently missed files
    * in any partition whose value URI-encodes (found via a partitioned
    * `4-NOT SPECIFIED` changelog: eq-delete seq scoping missed the
    * encoded paths and killed same-sequence merge rows). Literal `+`
    * is protected first (url_decode is form-decoding), and an
    * undecodable stray `%` falls back to the raw form — which is what
    * the driver-side [[canonPath]] preserves for the same string.
    */
  /** Fixed-point form for PERSISTING canonical paths in delete/DV
    * sidecar files: escape every residual `%` as `%25` so that
    * [[canonPathCol]] applied to the STORED value decodes back to
    * exactly the canonical path. Readers canonicalize every
    * `file_path` they load (externally-written delete files carry
    * raw writer paths, so they must), which would DOUBLE-decode a
    * canonical path holding a literal percent-escape — a partition
    * value like `50%25` decoded twice reads `50%`, mismatches the
    * once-decoded listing key, and rows silently skip: the same
    * failure class as the g68 space fix (ADVICE r15 low). Paths
    * without `%` — the universal common case — are bit-identical
    * under this encoding and skip the read-side decode entirely.
    * PathCanonSpec pins `canonPathCol(storedPathCol(p)) == p`.
    */
  private[graft] def storedPathCol(c: Column): Column =
    regexp_replace(c, "%", "%25")

  private[graft] def canonPathCol(c: Column): Column = {
    val stripped = regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")
    // %-gate: url_decode is only REACHED for paths that carry an
    // escape (the '+'-protect regexp + decode per row cost g29's MOR
    // anti-join 2.6x at sf1 when applied unconditionally — this
    // expression runs per ROW on _metadata.file_path in every
    // delete/DV application). Escape-free paths — the universal
    // common case — pay one contains() only. A '+'-only path skips
    // the decode and stays literal, which is what the driver-side
    // canonPath produces for the same string.
    when(stripped.contains("%"),
      coalesce(try_url_decode(regexp_replace(stripped, raw"\+", "%2B")), stripped))
      .otherwise(stripped)
  }

  private def applyIcebergDeletes(df: DataFrame,
      deletes: Seq[IcebergSnapshotResolver#IcebergDeleteFile],
      dataSeqByPath: Map[String, Long]): DataFrame = {
    var out = df
    val pos = deletes.filter(_.content == 1)
    if (pos.nonEmpty) {
      val del = spark.read.parquet(pos.map(_.path): _*)
        .select(canonPathCol(col("file_path")).as("__del_fp"), col("pos").as("__del_pos"))
      out = out
        .withColumn("__fp", canonPathCol(col("_metadata").getField("file_path")))
        .withColumn("__pos", col("_metadata").getField("row_index"))
        .join(broadcast(del),
          col("__fp") === col("__del_fp") && col("__pos") === col("__del_pos"), "left_anti")
        .drop("__fp", "__pos")
    }
    val eqs = deletes.filter(_.content == 2)
    if (eqs.nonEmpty) {
      // SEQUENCE SCOPING (Iceberg spec): an equality delete applies
      // only to data files with a STRICTLY smaller data sequence
      // number — rows re-appended AFTER the delete must survive it.
      // The per-row sequence comes from a tiny broadcast (path, seq)
      // join against the generated _metadata.file_path; an unknown
      // sequence (0, simplified fixtures) keeps the unscoped
      // read-latest behavior, matching pre-scoping semantics.
      val sp = Shim.classic(spark)
      import sp.implicits._
      val needScope = eqs.exists(_.seq > 0L) && dataSeqByPath.nonEmpty
      if (needScope) {
        // canonicalize with the SAME column rule used for
        // _metadata.file_path so the two sides always agree
        val seqDf = dataSeqByPath.toSeq.toDF("__seq_fp_raw", "__dseq")
          .select(canonPathCol(col("__seq_fp_raw")).as("__seq_fp"), col("__dseq"))
        out = out
          .withColumn("__fp2", canonPathCol(col("_metadata").getField("file_path")))
          .join(broadcast(seqDf), col("__fp2") === col("__seq_fp"), "left")
          .drop("__fp2", "__seq_fp")
      }
      eqs.foreach { ef =>
        if (ef.equalityCols.isEmpty) throw new IllegalStateException(
          s"equality delete file ${ef.path} carries no resolvable equality_ids")
        val del = spark.read.parquet(ef.path)
          .select(ef.equalityCols.map(c => col(c).as(s"__eq_$c")): _*).distinct()
        val eqCond = ef.equalityCols.map(c => out(c) <=> col(s"__eq_$c")).reduce(_ && _)
        val cond =
          if (needScope && ef.seq > 0L)
            // unknown file seq (null) conservatively matches, i.e.
            // the delete still applies — identical to pre-scoping
            eqCond && (coalesce(col("__dseq"), lit(Long.MinValue)) < lit(ef.seq))
          else eqCond
        out = out.join(broadcast(del), cond, "left_anti")
      }
      if (needScope) out = out.drop("__dseq")
    }
    out
  }

  /** Pruned read: filter the listing on partition predicates first,
    * then read only surviving files. With [[readTable]]'s native
    * partition pruning this listing-level step is a (still sound)
    * double-prune; it remains the impl of the reference's
    * files-variable read surface.
    */
  def prunedTableDF(database: String, table: String, predicates: Seq[Column],
      extraKeep: Option[Set[String]] = None): DataFrame = {
    val meta = tableMetadata(database, table)
    if (predicates.isEmpty && extraKeep.isEmpty)
      return readTable(database, table, 0, keep = None, proxied = false)
    val all = files(database, table)
    val predKept =
      if (predicates.isEmpty) all.map(_.path).toSet
      else predicates.foldLeft(listingDF(database, table))(_.filter(_))
        .select("path").collect().map(_.getString(0)).toSet
    // hidden-transform pruning (Iceberg bucket specs) intersects the
    // declared-key selection: both prunings are sound independently
    val kept = extraKeep.fold(predKept)(_ intersect predKept)
    if (kept.isEmpty && all.nonEmpty) {
      meta.tableType match {
        // A Hive listing can prune to empty spuriously (URI-escaped
        // partition values differ from the user's literal); fall back
        // to the full file set — Spark's own partition filters, which
        // unescape properly, still prune at planning, so a genuinely
        // empty selection stays cheap. (Hive tables never carry
        // hidden transform specs, so extraKeep is None here.)
        case TableType.Hive => readTable(database, table, 0, None, proxied = false)
        case _              => readTable(database, table, 0, None, proxied = false).limit(0)
      }
    } else readTable(database, table, 0, Some(kept), proxied = true)
  }

  // ---------------------------------------------------------------- SQL path

  private def glueRef(parts: Seq[String]): Option[GlueRefId] = GlueRefId.parse(parts)

  /** All glue refs in a SQL string (≈ reference
    * `getQueryGlueTableRefs`, src/sql-transformer.ts:63-78).
    */
  def glueTableRefs(sql: String): Seq[(String, String)] = {
    val plan = Shim.parsePlan(spark, sql)
    val out = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    plan.foreachWithSubqueries {
      case u: UnresolvedRelation =>
        glueRef(u.multipartIdentifier).foreach(r => out += ((r.database, r.table)))
      case _ =>
    }
    out.toSeq
  }

  /** Run a SQL query containing `glue.db.tbl` references — the
    * flagship entry point (≈ reference `convertGlueTableQuery` +
    * caller execution, src/glue-table-cache.ts:242-251). Partition
    * predicates are harvested per-relation from `Filter` nodes
    * directly above each scan; Hive tables additionally get Spark's
    * native partition pruning via the basePath read.
    */
  def query(sql: String): DataFrame = {
    val plan = Shim.parsePlan(spark, sql)
    val rewritten = rewriteWithPruning(plan)
    Shim.ofRows(spark, rewritten)
  }

  /** Register `GLUE__<db>_<tbl>` temp views for every glue ref in the
    * query (≈ reference `getGlueTableViewSetupSql`,
    * src/glue-table-cache.ts:253-347 + view naming at
    * src/sql-transformer.ts:283-293, hyphens stripped).
    */
  def setupFor(sql: String): Seq[String] =
    glueTableRefs(sql).map { case (db, tbl) =>
      val name = Naming.viewName(db, tbl)
      tableDF(db, tbl).createOrReplaceTempView(name)
      name
    }

  /** Reference-parity textual surface (≈ the rewritten-query half of
    * `convertGlueTableQuery`, reference: src/glue-table-cache.ts:
    * 242-251): the input SQL with every `glue.db.tbl` reference
    * replaced by its `GLUE__db_tbl` view name. Callers that want to
    * inspect or ship the rewritten SQL use this together with
    * [[setupFor]] (which registers those views):
    * `spark.sql(engine.rewrittenSql(q))` is then equivalent to
    * `engine.query(q)` minus listing-level pruning (the views are
    * unpruned by design, like the reference's).
    *
    * Refs are DISCOVERED by the parser ([[glueTableRefs]]) — only the
    * textual substitution is regex-based, handling optional backtick
    * quoting and the 2-part `glue.tbl` shorthand.
    */
  /** One-call textual conversion — the `convertGlueTableQuery`
    * equivalent (reference: src/glue-table-cache.ts:242-251, which
    * returns setup SQL ++ transformed query as one string): registers
    * the `GLUE__db_tbl` views ([[setupFor]]) and returns the
    * rewritten statement with the view names they now resolve to.
    * `spark.sql(result.sql)` is runnable immediately;
    * `result.toString` is the shippable combined artifact.
    */
  def convertGlueTableQuery(sql: String): GlueTableEngine.ConvertedQuery =
    GlueTableEngine.ConvertedQuery(setupFor(sql), rewrittenSql(sql))

  def rewrittenSql(sql: String): String =
    glueTableRefs(sql).foldLeft(sql) { case (s, (db, tbl)) =>
      val view = java.util.regex.Matcher.quoteReplacement(Naming.viewName(db, tbl))
      val q = java.util.regex.Pattern.quote _
      // 3-part first so `glue.db.tbl` never degrades to a partial
      // 2-part match; 2-part only for the default database. Both ends
      // are identifier-bounded: without the right boundary a ref whose
      // table is a PREFIX of another identifier (glue.orders vs
      // glue.orders_flat) would be rewritten mid-identifier, leaving a
      // corrupted name / stray backtick.
      val bL = "(?<![\\w`])"
      val bR = "(?![\\w`])"
      val threePart = ("(?i)" + bL + "`?glue`?\\.`?" + q(db) + "`?\\.`?" + q(tbl) + "`?" + bR).r
      val s1 = threePart.replaceAllIn(s, view)
      if (db.equalsIgnoreCase("default"))
        ("(?i)" + bL + "`?glue`?\\.`?" + q(tbl) + "`?" + bR).r.replaceAllIn(s1, view)
      else s1
    }

  /** Register the listing DataFrame as `<db>_<tbl>_s3_listing` — the
    * reference's listing-table statement (src/glue-table-cache.ts:
    * 298-306) as a temp view. (Index statements are intentionally
    * dropped: the listing is a small filtered DataFrame.)
    */
  def registerListing(database: String, table: String): String = {
    val name = Naming.listingName(database, table)
    listingDF(database, table).createOrReplaceTempView(name)
    name
  }

  /** Set a SQL session variable `<db>_<tbl>_files` holding the pruned
    * path array — surface parity with the reference's
    * `SET VARIABLE db_tbl_files = (SELECT list(path) ...)` statement
    * (src/glue-table-cache.ts:323-333), using Spark 4 session
    * variables.
    */
  def setFilesVariable(database: String, table: String,
      predicates: Seq[Column] = Nil): String = {
    val varName = Naming.filesVarName(database, table)
    val paths = prunedFiles(database, table, predicates)
    spark.sql(s"DECLARE OR REPLACE VARIABLE $varName ARRAY<STRING>")
    // Quote-doubling ('' for ') parses in every Spark string-literal
    // mode; backslashes are escape chars only while
    // escapedStringLiterals is off, so double them only then.
    val rawLiterals =
      spark.conf.get("spark.sql.parser.escapedStringLiterals", "false").toBoolean
    def quote(p: String): String = {
      val b = if (rawLiterals) p else p.replace("\\", "\\\\")
      "'" + b.replace("'", "''") + "'"
    }
    val arr =
      if (paths.isEmpty) "CAST(array() AS ARRAY<STRING>)"
      else paths.map(quote).mkString("array(", ", ", ")")
    spark.sql(s"SET VARIABLE $varName = $arr")
    varName
  }

  /** Rewrite each glue relation into its (pruned) parquet-read plan,
    * keeping every other node untouched. Also the workhorse of the
    * injected [[graft.resolve.GlueResolutionRule]], so plain
    * `spark.sql` gets the same projection/listing pruning as
    * [[query]] — not just Hive-layout basePath pruning.
    */
  private[graft] def rewriteWithPruning(plan: LogicalPlan): LogicalPlan = {
    def partitionConjuncts(cond: Expression, keys: Set[String],
        allowedQualifiers: Set[String]): Seq[Column] = {
      import org.apache.spark.sql.catalyst.{expressions => ce}
      def split(e: Expression): Seq[Expression] = e match {
        case ce.And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      // Structural whitelist: only plain comparison shapes over this
      // relation's partition attributes and literals may prune. This
      // rejects (a) correlated/outer-qualified attributes that merely
      // share a column name with a partition key, and (b) unresolved
      // functions (rand() etc. report deterministic=true before
      // resolution, so a deterministic check alone is ineffective).
      def allowedNode(e: Expression): Boolean = e match {
        case _: Literal | _: UnresolvedAttribute => true
        case _: ce.And | _: ce.Or | _: ce.Not => true
        case _: ce.EqualTo | _: ce.EqualNullSafe | _: ce.GreaterThan |
             _: ce.GreaterThanOrEqual | _: ce.LessThan | _: ce.LessThanOrEqual |
             _: ce.In | _: ce.IsNull | _: ce.IsNotNull | _: ce.Cast |
             _: ce.StartsWith | _: ce.EndsWith | _: ce.Contains => true
        case _ => false
      }
      def attrOk(a: UnresolvedAttribute): Boolean =
        keys.contains(a.nameParts.last.toLowerCase) &&
          (a.nameParts.length == 1 ||
            allowedQualifiers.contains(a.nameParts.init.map(_.toLowerCase).mkString(".")))
      split(cond).flatMap { c =>
        val attrs = c.collect { case a: UnresolvedAttribute => a }
        val onlyPartitionCols = attrs.nonEmpty &&
          attrs.forall(attrOk) &&
          c.find(e => !allowedNode(e)).isEmpty
        if (!onlyPartitionCols) None
        else {
          // Strip qualifiers (t.year → year) so the predicate binds to
          // the listing DataFrame's columns, then round-trip via SQL
          // text — simple, and only ever applied to small conjuncts.
          val stripped = c.transform {
            case a: UnresolvedAttribute => UnresolvedAttribute(Seq(a.nameParts.last))
          }
          try Some(expr(stripped.sql)) catch { case _: Exception => None }
        }
      }
    }

    // Replace relations bottom-up; at Filter nodes, retry the rewrite
    // of a directly-underlying glue relation with pruning predicates.
    def relationPlan(ref: GlueRefId, preds: Seq[Column],
        hiddenKeep: Option[Set[String]] = None): LogicalPlan = {
      val df = prunedTableDF(ref.database, ref.table, preds, hiddenKeep)
      Shim.analyzedPlan(df)
    }

    // An unaliased relation keeps its name qualifiers after rewrite:
    // SELECT tbl.col / db.tbl.col / glue.db.tbl.col must still
    // resolve, so wrap the bare parquet plan the same way Spark's
    // SessionCatalog wraps catalog tables.
    def qualified(ref: GlueRefId, plan: LogicalPlan): LogicalPlan =
      SubqueryAlias(Seq("glue", ref.database, ref.table), plan)

    // Top-down so the Filter case sees the still-unresolved relation
    // below it and can attach pruning predicates before the bare
    // relation case would rewrite it unpruned.
    // CTE definitions live OUTSIDE UnresolvedWith.children, so they
    // must be recursed explicitly — this is where the reference's
    // top-level-WHERE-only pruning silently skipped CTE bodies
    // (SURVEY §2a#5); we rewrite (and prune) inside them too.
    def rewrite(p: LogicalPlan): LogicalPlan = p.transformDownWithSubqueries {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (name, sub, maxRec) =>
          (name, rewrite(sub).asInstanceOf[SubqueryAlias], maxRec)
        })
      case f @ Filter(cond, child) =>
        // Peel SubqueryAlias to find a relation right below the filter.
        def relationBelow(n: LogicalPlan): Option[UnresolvedRelation] = n match {
          case u: UnresolvedRelation => Some(u)
          case SubqueryAlias(_, u: UnresolvedRelation) => Some(u)
          case _ => None
        }
        relationBelow(child) match {
          case Some(u) if glueRef(u.multipartIdentifier).isDefined =>
            val ref = glueRef(u.multipartIdentifier).get
            val keys = tableMetadata(ref.database, ref.table)
              .table.partitionKeys.map(_.name.toLowerCase).toSet
            // an aliased relation must be referenced via the alias;
            // unaliased may use table or db.table qualifiers
            val quals: Set[String] = child match {
              case SubqueryAlias(id, _) => Set(id.name.toLowerCase)
              case _ => Set(ref.table.toLowerCase,
                s"${ref.database}.${ref.table}".toLowerCase,
                s"glue.${ref.database}.${ref.table}".toLowerCase)
            }
            val preds = if (keys.isEmpty) Nil else partitionConjuncts(cond, keys, quals)
            val newRel = relationPlan(ref, preds, icebergHiddenKeep(ref, cond, quals))
            val newChild = child match {
              case SubqueryAlias(id, _) => SubqueryAlias(id, newRel)
              case _ => qualified(ref, newRel)
            }
            Filter(cond, newChild)
          case _ => f
        }
      case u: UnresolvedRelation if glueRef(u.multipartIdentifier).isDefined =>
        val ref = glueRef(u.multipartIdentifier).get
        qualified(ref, relationPlan(ref, Nil))
    }
    rewrite(plan)
  }

  /** Sink: write a DataFrame as a new glue table (Hive layout when
    * partition columns are given, flat parquet otherwise) and register
    * it in the catalog so it is immediately queryable as
    * `glue.<db>.<tbl>`. The reference is read-only; this is the write
    * half a pipeline engine needs. Partitioned writes produce the
    * same `key=value` layout the Hive read path prunes.
    */
  def writeTable(df: DataFrame, database: String, table: String, location: String,
      partitionBy: Seq[String] = Nil): GlueTable = {
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(location)
    val t = GlueTable(database, table, Some(location),
      partitionKeys = partitionBy.map(ColumnDef(_)))
    catalog match {
      case f: graft.catalog.FixtureCatalog => f.register(t)
      case _ => // external catalogs register out of band
    }
    invalidateTable(database, table)
    t
  }

  /** Write `df` as a NEW Delta table (commit 0: metaData + adds with
    * footer-derived stats) at `location` and register it — the
    * engine's transactional write path. Readers get time travel,
    * incremental reads, metadata counts, and log-stats file skipping
    * for free through the normal Delta read paths; a crash before
    * the commit JSON's atomic rename leaves only invisible garbage
    * files, never a half-visible table.
    */
  def writeDeltaTable(df: DataFrame, database: String, table: String,
      location: String, partitionBy: Seq[String] = Nil): GlueTable = {
    val root = new HadoopPath(location)
    val fs = root.getFileSystem(hadoopConf)
    if (fs.exists(root)) fs.delete(root, true) // overwrite semantics
    graft.listing.DeltaLogWriter.commit(spark, location, df, partitionBy)
    val t = GlueTable(database, table, Some(location),
      partitionKeys = partitionBy.map(ColumnDef(_)),
      parameters = Map("table_type" -> "DELTA"))
    catalog match {
      case f: graft.catalog.FixtureCatalog => f.register(t)
      case _ => // external catalogs register out of band
    }
    invalidateTable(database, table)
    t
  }

  /** SHALLOW-CLONE a registered Delta table: a new table at
    * `location` whose v0 references the source's live files by
    * absolute path — zero data copied, O(live files) metadata at any
    * table size — then registers and reads independently (appends to
    * the clone never touch the source). Retention caveat as in real
    * Delta CLONE: vacuuming the source can strand borrowed files.
    */
  def cloneDeltaTable(database: String, table: String,
      targetTable: String, location: String): GlueTable = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    graft.listing.DeltaLogWriter.shallowClone(spark, this.location(meta), location)
    val t = GlueTable(database, targetTable, Some(location),
      partitionKeys = meta.table.partitionKeys,
      parameters = Map("table_type" -> "DELTA"))
    catalog match {
      case f: graft.catalog.FixtureCatalog => f.register(t)
      case _ => // external catalogs register out of band
    }
    invalidateTable(database, targetTable)
    t
  }

  /** Append a batch to a registered Delta table as its next commit
    * version. Returns the committed version.
    */
  def appendDeltaTable(df: DataFrame, database: String, table: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    val v = graft.listing.DeltaLogWriter.commit(
      spark, location(meta), df, meta.table.partitionKeys.map(_.name))
    invalidateTable(database, table)
    v
  }

  /** RESTORE a registered Delta table to an earlier version as a new
    * commit (`RESTORE TABLE ... TO VERSION AS OF` semantics —
    * [[graft.listing.DeltaLogWriter.restore]]): after this, the
    * latest read equals the time-travel read at `versionOffset` (as
    * counted BEFORE the restore), history stays intact, and nothing
    * is deleted from storage until VACUUM. Pure metadata. Returns
    * the new version.
    */
  def restoreDeltaTable(database: String, table: String, versionOffset: Int): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    val v = graft.listing.DeltaLogWriter.restore(spark, location(meta), versionOffset)
    invalidateTable(database, table)
    v
  }

  /** Write `df` as a NEW Iceberg v2 table (snapshot 1, Avro
    * manifests with real footer-derived bounds) at `location` and
    * register it — the Iceberg counterpart of [[writeDeltaTable]].
    * Readers get time travel, incremental reads, and manifest-bounds
    * file skipping through the normal Iceberg paths.
    */
  def writeIcebergTable(df: DataFrame, database: String, table: String,
      location: String, partitionBy: Seq[String] = Nil): GlueTable = {
    val root = new HadoopPath(location)
    val fs = root.getFileSystem(hadoopConf)
    if (fs.exists(root)) fs.delete(root, true) // overwrite semantics
    graft.listing.IcebergWriter.commit(spark, location, df, partitionBy)
    val t = GlueTable(database, table, Some(location),
      partitionKeys = partitionBy.map(ColumnDef(_)),
      parameters = Map("table_type" -> "ICEBERG"))
    catalog match {
      case f: graft.catalog.FixtureCatalog => f.register(t)
      case _ => // external catalogs register out of band
    }
    invalidateTable(database, table)
    t
  }

  /** Write-time bucket column for a [[graft.listing.IcebergBucket]]
    * transform: computed once per batch as a narrow projection; reads
    * never evaluate it.
    */
  private def bucketColumnFor(df: DataFrame, src: String, n: Int): Column = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    df.schema(src).dataType match {
      case LongType => udf((v: java.lang.Long) =>
        if (v == null) null
        else Integer.valueOf(graft.listing.IcebergBucket.of(v, n))).apply(col(src))
      case IntegerType => udf((v: java.lang.Integer) =>
        if (v == null) null
        else Integer.valueOf(graft.listing.IcebergBucket.of(v, n))).apply(col(src))
      case StringType => udf((v: String) =>
        if (v == null) null
        else Integer.valueOf(graft.listing.IcebergBucket.of(v, n))).apply(col(src))
      case other => throw new IllegalArgumentException(
        s"bucket transform supports long/int/string source columns, $src is $other")
    }
  }

  /** Write-time value column for any supported hidden transform. */
  private def transformColumnFor(df: DataFrame, src: String, transform: String): Column = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val BucketRe = """bucket\[(\d+)\]""".r
    val TruncRe = """truncate\[(\d+)\]""".r
    transform match {
      case BucketRe(n) => bucketColumnFor(df, src, n.toInt)
      case TruncRe(w0) =>
        val w = w0.toInt
        df.schema(src).dataType match {
          case LongType => udf((v: java.lang.Long) =>
            if (v == null) null
            else java.lang.Long.valueOf(graft.listing.IcebergTruncate.ofLong(v, w))).apply(col(src))
          case IntegerType => udf((v: java.lang.Integer) =>
            if (v == null) null
            else Integer.valueOf(graft.listing.IcebergTruncate.ofLong(v.longValue(), w).toInt)).apply(col(src))
          case StringType => udf((v: String) =>
            if (v == null) null
            else graft.listing.IcebergTruncate.ofString(v, w)).apply(col(src))
          case other => throw new IllegalArgumentException(
            s"truncate transform supports long/int/string source columns, $src is $other")
        }
      case other => throw new IllegalArgumentException(s"unsupported hidden transform: $other")
    }
  }

  /** Write an Iceberg table with HIDDEN partitioning — the spec's
    * bucket transform (`bucket[N]` over `bucketCol`): rows land in
    * per-bucket files, the manifest partition record carries the
    * bucket int under `<col>_bucket`, and the partition spec declares
    * `{"transform": "bucket[N]", "source-id": <col>}` — but the
    * bucket NEVER appears as a table column (that is what "hidden"
    * means; readers see the raw schema). The payoff at 100 TB: an
    * equality/IN probe on the source column scans 1/N of the table
    * with no user-visible partition column to mis-join on —
    * [[query]] translates such conjuncts through [[IcebergBucket]]
    * and prunes the file listing before planning.
    */
  def writeIcebergTableBucketed(df: DataFrame, database: String, table: String,
      location: String, bucketCol: String, nBuckets: Int): GlueTable = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val field = s"${bucketCol}_bucket"
    val bCol = bucketColumnFor(df, bucketCol, nBuckets)
    val root = new HadoopPath(location)
    val fs = root.getFileSystem(hadoopConf)
    if (fs.exists(root)) fs.delete(root, true) // overwrite semantics
    // cluster by bucket before writing: one shuffle buys one file per
    // bucket per task instead of (input partitions x buckets) small
    // files — the small-files problem is the first thing bucketing is
    // supposed to solve at scale
    graft.listing.IcebergWriter.commit(spark, location,
      df.withColumn(field, bCol).repartition(col(field)),
      partitionBy = Seq(field),
      transforms = Map(field -> (s"bucket[$nBuckets]", bucketCol)))
    val t = GlueTable(database, table, Some(location),
      partitionKeys = Nil, // hidden: the spec field is not a column
      parameters = Map("table_type" -> "ICEBERG"))
    catalog match {
      case f: graft.catalog.FixtureCatalog => f.register(t)
      case _ => // external catalogs register out of band
    }
    invalidateTable(database, table)
    t
  }

  /** [[writeIcebergTableBucketed]]'s ORDER-PRESERVING sibling: hidden
    * `truncate[W]` partitioning over an int/long/string column. Rows
    * land in W-wide windows (`v - (((v % W) + W) % W)`; string
    * prefixes of length W), never as a table column — and because
    * integer truncate preserves order, [[query]] prunes RANGE
    * predicates on the source column (BETWEEN scans only the
    * overlapping windows), which bucket hashing cannot do.
    */
  def writeIcebergTableTruncated(df: DataFrame, database: String, table: String,
      location: String, truncCol: String, width: Int): GlueTable = {
    require(width > 0, s"width must be positive: $width")
    val field = s"${truncCol}_trunc"
    val transform = s"truncate[$width]"
    val bCol = transformColumnFor(df, truncCol, transform)
    val root = new HadoopPath(location)
    val fs = root.getFileSystem(hadoopConf)
    if (fs.exists(root)) fs.delete(root, true) // overwrite semantics
    graft.listing.IcebergWriter.commit(spark, location,
      df.withColumn(field, bCol).repartition(col(field)),
      partitionBy = Seq(field),
      transforms = Map(field -> (transform, truncCol)))
    val t = GlueTable(database, table, Some(location),
      partitionKeys = Nil, // hidden: the spec field is not a column
      parameters = Map("table_type" -> "ICEBERG"))
    catalog match {
      case f: graft.catalog.FixtureCatalog => f.register(t)
      case _ => // external catalogs register out of band
    }
    invalidateTable(database, table)
    t
  }

  /** Hidden-partition pruning for Iceberg transform specs. Plain
    * equality / IN conjuncts on a hidden-spec SOURCE column translate
    * through the transform ([[graft.listing.IcebergBucket]] /
    * [[graft.listing.IcebergTruncate]]) to the admissible partition
    * values, and — because truncate PRESERVES ORDER on integers —
    * range conjuncts (>, >=, <, <=, BETWEEN) prune truncate specs by
    * window overlap. Only files whose manifest partition record can
    * satisfy every constrained spec are kept. Sound by construction:
    * only whole top-level conjuncts of those exact shapes prune (an
    * OR involving the column keeps everything), unknown partition
    * values keep the file, string truncate serves equality only, and
    * the file listing is driver-side metadata, so the filter costs no
    * Spark job. Returns None when nothing prunes.
    */
  private def icebergHiddenKeep(ref: GlueRefId, cond: Expression,
      quals: Set[String]): Option[Set[String]] = {
    val meta = tableMetadata(ref.database, ref.table)
    if (meta.tableType != TableType.Iceberg) return None
    val specs = iceberg.hiddenSpecs(location(meta))
    if (specs.isEmpty) return None
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def split(e: Expression): Seq[Expression] = e match {
      case ce.And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    def attrOk(a: UnresolvedAttribute, src: String): Boolean =
      a.nameParts.last.equalsIgnoreCase(src) &&
        (a.nameParts.length == 1 ||
          quals.contains(a.nameParts.init.map(_.toLowerCase).mkString(".")))
    def litVal(l: ce.Literal): Option[Any] = l.value match {
      case null => None
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
      case i: Int => Some(i)
      case lo: Long => Some(lo)
      case _ => None // other types never constrain a hidden spec here
    }
    def asLong(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong); case l: Long => Some(l); case _ => None
    }
    val conjuncts = split(cond)
    // per source column: intersected equality value sets + numeric bounds
    final case class Cons(eq: Option[Seq[Any]],
        lo: Seq[(Long, Boolean)], hi: Seq[(Long, Boolean)]) {
      def isFree: Boolean = eq.isEmpty && lo.isEmpty && hi.isEmpty
    }
    def consFor(src: String): Cons = {
      val eqSets = conjuncts.flatMap {
        case ce.EqualTo(a: UnresolvedAttribute, l: ce.Literal) if attrOk(a, src) =>
          litVal(l).map(Seq(_))
        case ce.EqualTo(l: ce.Literal, a: UnresolvedAttribute) if attrOk(a, src) =>
          litVal(l).map(Seq(_))
        case ce.In(a: UnresolvedAttribute, vs) if attrOk(a, src) &&
            vs.forall(_.isInstanceOf[ce.Literal]) =>
          val lits = vs.map(v => litVal(v.asInstanceOf[ce.Literal]))
          if (lits.forall(_.isDefined)) Some(lits.flatten) else None
        case _ => None
      }
      // attr-side vs literal-side comparisons normalize to bounds on the attr
      // Spark 4 parses BETWEEN as an unresolved function (the analyzer
      // later lowers it to >= AND <=); match it here since pruning
      // runs on the UNRESOLVED plan
      def between(e: Expression): Option[(Long, Long)] = e match {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if f.nameParts.map(_.toLowerCase) == Seq("between") =>
          f.arguments match {
            case Seq(a: UnresolvedAttribute, l1: ce.Literal, l2: ce.Literal)
                if attrOk(a, src) =>
              for (lo1 <- litVal(l1).flatMap(asLong); hi1 <- litVal(l2).flatMap(asLong))
                yield (lo1, hi1)
            case _ => None
          }
        case _ => None
      }
      val lo = conjuncts.flatMap {
        case e if between(e).isDefined => between(e).map(b => (b._1, true))
        case ce.GreaterThan(a: UnresolvedAttribute, l: ce.Literal) if attrOk(a, src) =>
          litVal(l).flatMap(asLong).map((_, false))
        case ce.GreaterThanOrEqual(a: UnresolvedAttribute, l: ce.Literal) if attrOk(a, src) =>
          litVal(l).flatMap(asLong).map((_, true))
        case ce.LessThan(l: ce.Literal, a: UnresolvedAttribute) if attrOk(a, src) =>
          litVal(l).flatMap(asLong).map((_, false))
        case ce.LessThanOrEqual(l: ce.Literal, a: UnresolvedAttribute) if attrOk(a, src) =>
          litVal(l).flatMap(asLong).map((_, true))
        case _ => None
      }
      val hi = conjuncts.flatMap {
        case e if between(e).isDefined => between(e).map(b => (b._2, true))
        case ce.LessThan(a: UnresolvedAttribute, l: ce.Literal) if attrOk(a, src) =>
          litVal(l).flatMap(asLong).map((_, false))
        case ce.LessThanOrEqual(a: UnresolvedAttribute, l: ce.Literal) if attrOk(a, src) =>
          litVal(l).flatMap(asLong).map((_, true))
        case ce.GreaterThan(l: ce.Literal, a: UnresolvedAttribute) if attrOk(a, src) =>
          litVal(l).flatMap(asLong).map((_, false))
        case ce.GreaterThanOrEqual(l: ce.Literal, a: UnresolvedAttribute) if attrOk(a, src) =>
          litVal(l).flatMap(asLong).map((_, true))
        case _ => None
      }
      Cons(
        if (eqSets.isEmpty) None else Some(eqSets.reduce((a, b) => a.filter(b.toSet))),
        lo, hi)
    }
    val BucketRe = """bucket\[(\d+)\]""".r
    val TruncRe = """truncate\[(\d+)\]""".r
    // (spec field, keep-predicate over the file's partition value)
    val fieldPreds: Seq[(String, String => Boolean)] = specs.flatMap { case (field, src, tr) =>
      val c = consFor(src)
      if (c.isFree) None
      else tr match {
        case BucketRe(n0) =>
          val n = n0.toInt
          c.eq.map { vals =>
            val buckets = vals.map(v => graft.listing.IcebergBucket.of(v, n)).toSet
            (field, (pv: String) =>
              scala.util.Try(pv.toInt).toOption.forall(buckets.contains))
          }
        case TruncRe(w0) =>
          val w = w0.toInt
          val eqLongs = c.eq.map(_.flatMap(asLong))
          val eqStrings = c.eq.map(_.collect { case st: String => st })
          Some((field, (pv: String) => {
            scala.util.Try(pv.toLong).toOption match {
              case Some(t) => // integer window [t, t + w - 1]
                val eqOk = eqLongs.forall(vs =>
                  vs.exists(v => graft.listing.IcebergTruncate.ofLong(v, w) == t))
                val loOk = c.lo.forall { case (l, incl) =>
                  if (incl) t + w - 1 >= l else t + w - 1 > l }
                val hiOk = c.hi.forall { case (u, incl) =>
                  if (incl) t <= u else t < u }
                eqOk && loOk && hiOk
              case None => // string truncate: equality (prefix) only
                eqStrings.forall(vs =>
                  vs.exists(v => graft.listing.IcebergTruncate.ofString(v, w) == pv))
            }
          }))
        case _ => None // unknown transform: never prune on it
      }
    }
    if (fieldPreds.isEmpty) return None
    val keep = files(ref.database, ref.table).filter { f =>
      fieldPreds.forall { case (field, ok) =>
        f.partitionValues.get(field) match {
          case Some(v) => ok(v)
          case None    => true // unknown partition value: keep (sound)
        }
      }
    }.map(_.path).toSet
    Some(keep)
  }

  /** Append a batch to a registered Iceberg table as its next
    * snapshot. Returns the new sequence number.
    */
  /** `evolve = true` permits ADDITIVE schema evolution: a batch whose
    * schema extends the table's as a strict prefix appends new
    * trailing columns (positional field ids stay stable), the evolved
    * schema publishes with the commit, and pre-evolution files read
    * the new columns back as nulls — the Iceberg twin of g40's Delta
    * evolution contract. Non-additive shapes still fail loudly.
    */
  def appendIcebergTable(df: DataFrame, database: String, table: String,
      evolve: Boolean = false): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    // The partition SPEC is metadata, not catalog state — it, not the
    // catalog, is the append layout's authority (the writer's
    // spec-stability check refuses a mismatched append).
    // ALL spec fields in spec order are the layout (not just hidden
    // ones): an identity-partitioned table that adopted a hidden
    // transform via spec evolution keeps BOTH dimensions — identity
    // values come straight from the batch columns, hidden transform
    // columns are recomputed per batch. Falling back to the catalog
    // keys covers tables whose metadata predates spec records.
    val sfields = iceberg.specFields(location(meta))
    val (batch, partBy, transforms) =
      if (sfields.isEmpty) (df, meta.table.partitionKeys.map(_.name),
        Map.empty[String, (String, String)])
      else {
        val hidden = sfields.filter(_._3 != "identity")
        val withCols = hidden.foldLeft(df) { case (acc, (field, src, tr)) =>
          acc.withColumn(field, transformColumnFor(acc, src, tr))
        }.repartition(sfields.map(h => col(h._1)): _*)
        (withCols, sfields.map(_._1),
          hidden.map { case (f, src, tr) => f -> (tr, src) }.toMap)
      }
    val v = graft.listing.IcebergWriter.commit(
      spark, location(meta), batch, partBy,
      allowAdditive = evolve, transforms = transforms)
    invalidateTable(database, table)
    v
  }

  /** RENAME a Delta column — metadata-only, zero files rewritten
    * however large the table ([[graft.listing.DeltaLogWriter
    * .renameColumn]]: Delta column mapping, name mode). Reads resolve
    * the logical name through the physicalName annotation; later
    * appends arrive with logical names and are written back under the
    * fixed physical ones. Returns the new version.
    */
  def renameDeltaColumn(database: String, table: String,
      oldName: String, newName: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    val v = graft.listing.DeltaLogWriter.renameColumn(spark, location(meta), oldName, newName)
    invalidateTable(database, table)
    v
  }

  /** DROP a Delta column — metadata-only, zero files rewritten
    * ([[graft.listing.DeltaLogWriter.dropColumn]]): readers stop
    * projecting it, history still travels to the pre-drop schema, and
    * a later re-add binds to a FRESH physical name so pre-drop bytes
    * never resurrect. Returns the new version.
    */
  def dropDeltaColumn(database: String, table: String, name: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    val v = graft.listing.DeltaLogWriter.dropColumn(spark, location(meta), name)
    invalidateTable(database, table)
    v
  }

  /** RENAME an Iceberg column — metadata-only, zero files rewritten
    * ([[graft.listing.IcebergWriter.renameColumn]]: field ids are the
    * identity, names are display). Reads resolve the new logical name
    * through the field's physical-name mapping; later appends arrive
    * with logical names and are written back under the fixed physical
    * ones. Returns the new sequence number.
    */
  def renameIcebergColumn(database: String, table: String,
      oldName: String, newName: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val v = graft.listing.IcebergWriter.renameColumn(spark, location(meta), oldName, newName)
    invalidateTable(database, table)
    v
  }

  /** DROP an Iceberg column — metadata-only, zero files rewritten
    * ([[graft.listing.IcebergWriter.dropColumn]]): readers stop
    * projecting it, history still time-travels to the pre-drop
    * metadata, and a later re-add binds to a FRESH field id and
    * physical name so pre-drop bytes never resurrect. Returns the new
    * sequence number.
    */
  def dropIcebergColumn(database: String, table: String, name: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val v = graft.listing.IcebergWriter.dropColumn(spark, location(meta), name)
    invalidateTable(database, table)
    v
  }

  /** APPEND a batch to an Iceberg table on a named BRANCH — the
    * staging half of write-audit-publish: the snapshot publishes into
    * the snapshots array and moves only the branch ref, so every main
    * reader (engine queries, time travel, changelog) is oblivious to
    * it until [[publishIcebergBranch]] fast-forwards main. Returns
    * the staged sequence number.
    */
  def appendIcebergBranch(df: DataFrame, database: String, table: String,
      branch: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    require(branch != "main", "main is not a stageable branch — use appendIcebergTable")
    val v = graft.listing.IcebergWriter.commit(
      spark, location(meta), df, Nil, branch = Some(branch))
    invalidateTable(database, table)
    v
  }

  /** The AUDIT read of write-audit-publish: the branch head's rows,
    * read outside the main table surface (plain-table branches;
    * column-mapped or MOR tables stage on main-only paths).
    */
  def icebergBranchDF(database: String, table: String, branch: String): DataFrame = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val paths = iceberg.dataFilesForRef(location(meta), branch)
    if (paths.isEmpty) spark.range(0).select(lit(null).cast("string").as("null"))
    else spark.read.parquet(paths: _*)
  }

  /** TAG the current main snapshot — an immutable named ref: later
    * writes move main past it while the tag keeps naming the exact
    * snapshot ([[graft.listing.IcebergWriter.tagSnapshot]]). Read it
    * back with [[icebergTagDF]]. Returns the tagged snapshot id.
    */
  def tagIcebergSnapshot(database: String, table: String, tag: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val v = graft.listing.IcebergWriter.tagSnapshot(spark, location(meta), tag)
    invalidateTable(database, table)
    v
  }

  /** DROP a named ref (tag or staged branch) — metadata-only
    * ([[graft.listing.IcebergWriter.dropRef]]). Also the documented
    * RECOVERY path when snapshot expiry fails on a dangling ref
    * (a ref pointing at a snapshot the current metadata no longer
    * lists): expiry keeps failing loudly rather than silently
    * under-protecting, and the operator repairs the table by
    * dropping the dangling ref, then re-runs expiry.
    */
  def dropIcebergRef(database: String, table: String, ref: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val v = graft.listing.IcebergWriter.dropRef(spark, location(meta), ref)
    invalidateTable(database, table)
    v
  }

  /** Read a TAGGED snapshot — the frozen state the tag names,
    * however far main has moved since. Same resolution as the
    * branch-audit read.
    */
  def icebergTagDF(database: String, table: String, tag: String): DataFrame =
    icebergBranchDF(database, table, tag)

  /** PUBLISH a staged branch: metadata-only fast-forward of main onto
    * the branch head ([[graft.listing.IcebergWriter.publishBranch]]) —
    * the audited snapshots become visible to every main reader
    * atomically, with zero data movement. Returns the new sequence
    * number.
    */
  def publishIcebergBranch(database: String, table: String, branch: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val v = graft.listing.IcebergWriter.publishBranch(spark, location(meta), branch)
    invalidateTable(database, table)
    v
  }

  /** RENAME a Hudi column — metadata-only, zero slices rewritten
    * ([[graft.listing.HudiTimelineWriter.renameColumn]]): the
    * timeline schema renames the field, its physical-name annotation
    * keeps binding to what the slices hold, appends arrive logical
    * and land physical. Partition columns are rejected (their names
    * are baked into the Hive-style layout). Returns the published
    * instant.
    */
  def renameHudiColumn(database: String, table: String,
      oldName: String, newName: String): String = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Hudi,
      s"$database.$table is ${meta.tableType}, not a Hudi table")
    require(!meta.table.partitionKeys.exists(_.name.equalsIgnoreCase(oldName)),
      s"cannot rename $oldName: it is a partition column of $database.$table")
    val v = graft.listing.HudiTimelineWriter.renameColumn(spark, location(meta), oldName, newName)
    invalidateTable(database, table)
    v
  }

  /** DROP a Hudi column — metadata-only, zero slices rewritten
    * ([[graft.listing.HudiTimelineWriter.dropColumn]]): readers stop
    * projecting it, history still travels, and a later re-add binds
    * to a FRESH physical column so pre-drop bytes never resurrect.
    * Returns the published instant.
    */
  def dropHudiColumn(database: String, table: String, name: String): String = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Hudi,
      s"$database.$table is ${meta.tableType}, not a Hudi table")
    require(!meta.table.partitionKeys.exists(_.name.equalsIgnoreCase(name)),
      s"cannot drop $name: it is a partition column of $database.$table")
    val v = graft.listing.HudiTimelineWriter.dropColumn(spark, location(meta), name)
    invalidateTable(database, table)
    v
  }

  /** EVOLVE an Iceberg table's partition spec — metadata-only, zero
    * files rewritten ([[graft.listing.IcebergWriter.updateSpec]]):
    * pre-evolution files keep their layout and are always read (they
    * carry no value for the new spec field, and pruning keeps
    * unknown-value files — sound by construction); batches appended
    * AFTER the evolution land partitioned under the new spec, and
    * conjuncts on the source column prune them through the transform.
    * The payoff at 100 TB: a table can adopt (or retire, or re-width)
    * hidden partitioning as its query pattern emerges, without a
    * single rewrite — Iceberg's signature layout feature. Supported
    * transforms: `bucket[N]`, `truncate[W]` on a long/int/string
    * source column. Returns the new sequence number.
    */
  def evolveIcebergPartitionSpec(database: String, table: String,
      sourceCol: String, transform: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val BucketRe = """bucket\[(\d+)\]""".r
    val TruncRe = """truncate\[(\d+)\]""".r
    // the PARAMETER is part of the field name: a re-evolution (e.g.
    // truncate[100] -> truncate[50]) must never reinterpret values
    // written under the retired spec as windows of the new width —
    // a distinct name makes old files read as value-unknown (kept,
    // sound) instead of mis-pruned
    val field = transform match {
      case BucketRe(n) => s"${sourceCol}_bucket_$n"
      case TruncRe(w)  => s"${sourceCol}_trunc_$w"
      case other => throw new IllegalArgumentException(
        s"unsupported hidden transform for spec evolution: $other")
    }
    val v = graft.listing.IcebergWriter.updateSpec(spark, location(meta),
      Seq((field, transform, sourceCol)))
    invalidateTable(database, table)
    v
  }

  /** MERGE-ON-READ DELETE for an Iceberg table: write the matching
    * rows' positions as a POSITION DELETE FILE and publish it as a
    * new snapshot — NO data file is rewritten, deletion cost is
    * proportional to the matched rows alone (the opposite trade from
    * [[deleteDeltaWhere]]'s copy-on-write; readers pay the anti-join
    * until a compaction folds the deletes in). Uses the engine's own
    * `_metadata`-driven read to find (file, row_index) pairs, so any
    * predicate works. Returns the new sequence number.
    */
  def deleteIcebergWhere(database: String, table: String, predicate: Column): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val loc = location(meta)
    val matches = tableDF(database, table)
      .filter(coalesce(predicate, lit(false)))
      .select(
        // canonPathCol, not a bare scheme strip: _metadata.file_path
        // is URI-ENCODED (a partition value with a space reads as
        // %20), while listing paths decode — an encoding-blind strip
        // here silently skipped every row in such a partition (found
        // by g68's space-holding o_orderpriority partition)
        canonPathCol(col("_metadata").getField("file_path")).as("file_path"),
        col("_metadata").getField("row_index").as("pos"))
    val delDir = s"${loc.stripSuffix("/")}/deletes_${System.nanoTime()}"
    // storedPathCol: readers re-canonicalize stored paths, so persist
    // the fixed-point form (a literal '%' in a partition value would
    // otherwise decode twice and silently skip its rows)
    matches.select(storedPathCol(col("file_path")).as("file_path"), col("pos"))
      .coalesce(1).write.mode("overwrite").parquet(delDir)
    val fs = new HadoopPath(delDir).getFileSystem(hadoopConf)
    val delFile = fs.listStatus(new HadoopPath(delDir)).toSeq
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val v = graft.listing.IcebergWriter.commitDeletes(
      spark, loc, Seq((delFile.toString, 1, Nil)))
    invalidateTable(database, table)
    v
  }

  /** MERGE-ON-READ equality delete for an Iceberg table: publish the
    * key batch as an EQUALITY DELETE FILE over `keyCols` — every
    * live row matching any key row is deleted at read time, no data
    * rewrite, cost proportional to the key batch. Returns the new
    * sequence number.
    */
  def deleteIcebergMatching(database: String, table: String,
      keys: DataFrame, keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "equality delete needs at least one key column")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val loc = location(meta)
    val delDir = s"${loc.stripSuffix("/")}/deletes_${System.nanoTime()}"
    keys.select(keyCols.map(col): _*).distinct()
      .coalesce(1).write.mode("overwrite").parquet(delDir)
    val fs = new HadoopPath(delDir).getFileSystem(hadoopConf)
    val delFile = fs.listStatus(new HadoopPath(delDir)).toSeq
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val v = graft.listing.IcebergWriter.commitDeletes(
      spark, loc, Seq((delFile.toString, 2, keyCols)))
    invalidateTable(database, table)
    v
  }

  /** ONE-SNAPSHOT Iceberg MERGE (upsert) by `key` — the same upsert
    * contract as [[mergeDelta]] and [[upsertHudi]], in Iceberg's
    * native merge-on-read shape
    * ([[graft.listing.IcebergWriter.commitMerge]]): the source
    * batch's data files and an equality delete over its keys publish
    * at the SAME sequence number, so prior matches die and the new
    * rows land atomically (strict sequence scoping keeps the delete
    * off the batch's own files — a reader can never see the delete
    * without the insert). No data rewrite; readers pay the anti-join
    * until compaction folds the deletes in. Returns the new
    * sequence number.
    */
  def mergeIceberg(database: String, table: String, source: DataFrame, key: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    require(source.columns.contains(key), s"merge key $key not in the source batch")
    val v = graft.listing.IcebergWriter.commitMerge(
      spark, location(meta), source, Seq(key))
    invalidateTable(database, table)
    v
  }

  /** OPTIMIZE-style compaction for a Delta table: rewrite the live
    * file set into `ceil(liveBytes / targetFileBytes)` files as ONE
    * commit — remove actions retire every previous live file, adds
    * publish the compacted replacements with fresh footer-derived
    * stats. Readers flip atomically; earlier versions still
    * time-travel to the old layout (nothing is physically deleted —
    * vacuuming is a separate lifecycle, as in Delta itself). Returns
    * the committed version.
    */
  def optimizeDeltaTable(database: String, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      zorderBy: Seq[String] = Nil, bits: Int = 16): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    val live = files(database, table)
    val nFiles = math.max(1, math.ceil(
      live.map(_.size).sum.toDouble / targetFileBytes).toInt)
    val keys = meta.table.partitionKeys.map(_.name)
    val df = tableDF(database, table)
    // Delta OPTIMIZE ZORDER BY parity: range-partition + sort by the
    // Morton interleave so each output file holds a tight range in
    // EVERY clustered dimension, and the freshly written add-stats
    // make the log's file skipping selective on all of them.
    val compacted =
      if (zorderBy.isEmpty) df.repartition(nFiles)
      else {
        zorderBy.foreach { c =>
          val f = df.schema.find(_.name == c).getOrElse(throw new IllegalArgumentException(
            s"zorderBy column $c not found in $database.$table"))
          require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
            s"zorderBy column $c must be numeric, got ${f.dataType.simpleString}")
        }
        val stats = df.agg(
          zorderBy.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))).head,
          zorderBy.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))).tail: _*)
          .head()
        val norm = zorderBy.zipWithIndex.map { case (c, i) =>
          if (stats.isNullAt(2 * i) || stats.isNullAt(2 * i + 1)) lit(0L)
          else graft.functions.ZOrder.normalize(
            col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits)
        }
        df.withColumn("__z", graft.functions.ZOrder.zvalue(norm, bits))
          .repartitionByRange(nFiles, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
      }
    val v = graft.listing.DeltaLogWriter.commitWith(
      spark, location(meta), compacted, keys, removePaths = live.map(_.path))
    invalidateTable(database, table)
    v
  }

  /** Row-level DELETE WHERE for a Delta table, as surgical
    * copy-on-write: files whose log stats PROVE no row can match
    * (the same one-sided [[graft.listing.StatsPruning]] prover the
    * read path skips with) are left untouched — same physical file,
    * no rewrite; only files that may contain matching rows are read,
    * filtered to the survivors (`WHERE p` deletes rows where p is
    * TRUE; false and NULL rows stay, per SQL DELETE semantics), and
    * rewritten in ONE commit (removes for the affected files + adds
    * for their replacements). At 100 TB a delete touching one day of
    * data rewrites that day's files, not the table. Returns the
    * committed version.
    */
  def deleteDeltaWhere(database: String, table: String, predicate: Column): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    val df = tableDF(database, table)
    // a RESOLVED predicate expression to feed the stats prover
    val cond = df.filter(predicate).queryExecution.optimizedPlan.collectFirst {
      case Filter(c, _) => c
    }.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
    val resolver: graft.listing.StatsPruning.Resolver = (a, b) => a.equalsIgnoreCase(b)
    val live = files(database, table)
    val (untouched, affected) = live.partition(f =>
      f.bounds.nonEmpty && graft.listing.StatsPruning.proveFalse(cond, f.bounds, resolver))
    if (affected.isEmpty) // every file provably unaffected: no commit at all
      return delta.latestVersion(location(meta)).getOrElse(0L)
    val keys = meta.table.partitionKeys.map(_.name)
    val survivors = readTable(database, table, 0,
      keep = Some(affected.map(_.path).toSet), proxied = false)
      .filter(!coalesce(predicate, lit(false)))
    val v = graft.listing.DeltaLogWriter.commitWith(
      spark, location(meta), survivors, keys, removePaths = affected.map(_.path))
    invalidateTable(database, table)
    v
  }

  /** MERGE-ON-READ DELETE for a Delta table — the deletion-vector
    * path: write the matching rows' `(file_path, pos)` positions as a
    * DV sidecar and RE-ADD each affected file with the descriptor in
    * ONE commit ([[graft.listing.DeltaLogWriter
    * .commitDeletionVectors]]). NO data file is rewritten; deletion
    * cost is proportional to the matched rows alone — the opposite
    * trade from [[deleteDeltaWhere]]'s copy-on-write (readers pay a
    * broadcast anti-join until a rewrite retires the DV), mirroring
    * [[deleteIcebergWhere]] so Delta holds BOTH delete shapes, as
    * real Delta does. Positions MERGE with any existing DV on the
    * same file: the re-add REPLACES the descriptor, so the new
    * sidecar carries the union of old and new positions. Returns the
    * committed version (or the current one when nothing matches).
    */
  def deleteDeltaWhereMor(database: String, table: String, predicate: Column): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    val loc = location(meta)
    // tableDF already subtracts existing DVs, so `matches` holds only
    // still-live rows; row_index is the file-physical position either
    // way, which is exactly what the sidecar records
    val matches = tableDF(database, table)
      .filter(coalesce(predicate, lit(false)))
      .select(
        // canonPathCol, not a bare scheme strip: _metadata.file_path
        // is URI-ENCODED (a partition value with a space reads as
        // %20), while listing paths decode — an encoding-blind strip
        // here silently skipped every row in such a partition (found
        // by g68's space-holding o_orderpriority partition)
        canonPathCol(col("_metadata").getField("file_path")).as("file_path"),
        col("_metadata").getField("row_index").as("pos"))
    val affectedCanon = matches.select("file_path").distinct()
      .collect().map(_.getString(0)).toSet
    if (affectedCanon.isEmpty)
      return delta.latestVersion(loc).getOrElse(0L)
    val affected = files(database, table).map(_.path)
      .filter(p => affectedCanon.contains(canonPath(p)))
    // carry forward existing positions of the re-DV'd files
    val existing = delta.deletionVectors(loc)
    val carried = affected.flatMap(p => existing.get(p).map(dv => (p, dv)))
      .groupBy(_._2)
    val dvRows = carried.toSeq.sortBy(_._1).foldLeft(matches) {
      case (acc, (oldDv, pairs)) =>
        val fps = pairs.map { case (p, _) => canonPath(p) }
        acc.unionAll(spark.read.parquet(oldDv)
          .select(canonPathCol(col("file_path")).as("file_path"), col("pos"))
          .filter(col("file_path").isin(fps: _*)))
    }
    val dvDir = s"${loc.stripSuffix("/")}/dv_${System.nanoTime()}"
    // storedPathCol: same fixed-point rule as deleteIcebergWhere —
    // the sidecar is re-canonicalized on every read
    dvRows.distinct()
      .select(storedPathCol(col("file_path")).as("file_path"), col("pos"))
      .coalesce(1).write.mode("overwrite").parquet(dvDir)
    val fs = new HadoopPath(dvDir).getFileSystem(hadoopConf)
    val dvFile = fs.listStatus(new HadoopPath(dvDir)).toSeq
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val v = graft.listing.DeltaLogWriter.commitDeletionVectors(
      spark, loc, affected.map(_ -> dvFile.toString).toMap)
    invalidateTable(database, table)
    v
  }

  /** Row-level UPDATE ... SET for a Delta table — the same
    * stats-surgical copy-on-write as [[deleteDeltaWhere]]: provably
    * unaffected files keep their physical file; affected files are
    * rewritten with each SET column replaced where the predicate is
    * TRUE (false/NULL rows keep their values). One commit, fresh
    * stats on the rewritten files. Returns the committed version.
    */
  def updateDeltaWhere(database: String, table: String, predicate: Column,
      set: Map[String, Column]): Long = {
    require(set.nonEmpty, "UPDATE needs at least one SET column")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    val df = tableDF(database, table)
    set.keys.foreach { c =>
      require(df.columns.contains(c), s"SET column $c not in $database.$table")
    }
    val cond = df.filter(predicate).queryExecution.optimizedPlan.collectFirst {
      case Filter(c, _) => c
    }.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
    val resolver: graft.listing.StatsPruning.Resolver = (a, b) => a.equalsIgnoreCase(b)
    val live = files(database, table)
    val (_, affected) = live.partition(f =>
      f.bounds.nonEmpty && graft.listing.StatsPruning.proveFalse(cond, f.bounds, resolver))
    if (affected.isEmpty)
      return delta.latestVersion(location(meta)).getOrElse(0L)
    val keys = meta.table.partitionKeys.map(_.name)
    val hit = coalesce(predicate, lit(false))
    val base = readTable(database, table, 0,
      keep = Some(affected.map(_.path).toSet), proxied = false)
    val updated = set.foldLeft(base) { case (d, (c, v)) =>
      d.withColumn(c, when(hit, v).otherwise(col(c)))
    }
    val v = graft.listing.DeltaLogWriter.commitWith(
      spark, location(meta), updated, keys, removePaths = affected.map(_.path))
    invalidateTable(database, table)
    v
  }

  /** MERGE (upsert) a source batch into a Delta table by `key`:
    * target rows whose key appears in the source are REPLACED by the
    * source row, source rows with no target match are INSERTED — one
    * commit. Surgical like [[deleteDeltaWhere]]: only target files
    * whose key bounds intersect the source's key span rewrite (a file
    * provably outside it cannot hold a matching key); the rewrite
    * anti-joins the affected rows against the source keys and unions
    * the full source. Source keys are expected unique per batch (the
    * standard upsert contract — duplicate source keys all land).
    * Returns the committed version.
    */
  def mergeDelta(database: String, table: String, source: DataFrame, key: String): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    require(source.columns.contains(key), s"merge key $key not in the source batch")
    val span = source.agg(min(col(key)), max(col(key))).head()
    if (span.isNullAt(0)) // empty source: nothing to do
      return delta.latestVersion(location(meta)).getOrElse(0L)
    val df = tableDF(database, table)
    val cond = df.filter(col(key).between(lit(span.get(0)), lit(span.get(1))))
      .queryExecution.optimizedPlan.collectFirst { case Filter(c, _) => c }
      .getOrElse(org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
    val resolver: graft.listing.StatsPruning.Resolver = (a, b) => a.equalsIgnoreCase(b)
    val (_, affected) = files(database, table).partition(f =>
      f.bounds.nonEmpty && graft.listing.StatsPruning.proveFalse(cond, f.bounds, resolver))
    val keys = meta.table.partitionKeys.map(_.name)
    val kept =
      if (affected.isEmpty) source // pure insert
      else readTable(database, table, 0,
        keep = Some(affected.map(_.path).toSet), proxied = false)
        .join(source.select(col(key)).distinct(), Seq(key), "left_anti")
        .unionByName(source)
    val v = graft.listing.DeltaLogWriter.commitWith(
      spark, location(meta), kept, keys, removePaths = affected.map(_.path))
    invalidateTable(database, table)
    v
  }

  /** Write `df` as a NEW Hudi copy-on-write table at `location` and
    * register it — the Hudi member of the write trio
    * ([[writeDeltaTable]], [[writeIcebergTable]]). Partitioned
    * writes use Hive-style `k=v` dirs, so the engine's partition
    * extractors prune them like any other layout.
    */
  def writeHudiTable(df: DataFrame, database: String, table: String,
      location: String, partitionBy: Seq[String] = Nil): GlueTable = {
    val root = new HadoopPath(location)
    val fs = root.getFileSystem(hadoopConf)
    if (fs.exists(root)) fs.delete(root, true) // overwrite semantics
    graft.listing.HudiTimelineWriter.commit(spark, location, df, partitionBy)
    val t = GlueTable(database, table, Some(location),
      partitionKeys = partitionBy.map(ColumnDef(_)),
      parameters = Map("table_type" -> "HUDI"))
    catalog match {
      case f: graft.catalog.FixtureCatalog => f.register(t)
      case _ => // external catalogs register out of band
    }
    invalidateTable(database, table)
    t
  }

  /** Append a batch to a registered Hudi table as its next completed
    * instant (new file groups — a pure insert). Returns the instant.
    */
  /** `evolve = true` permits ADDITIVE schema evolution, mirroring the
    * Delta (g40) and Iceberg (g44) contracts: a batch whose schema
    * extends the table's recorded schema as a strict prefix appends
    * new trailing columns (the commit records the evolved schema in
    * its extraMetadata; older slices read the new columns as nulls
    * via the timeline-schema extension). Non-additive shapes fail
    * loudly; tables without a recorded schema (pre-r12) skip the
    * check for compatibility.
    */
  def appendHudiTable(df: DataFrame, database: String, table: String,
      evolve: Boolean = false): String = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Hudi,
      s"$database.$table is ${meta.tableType}, not a Hudi table")
    graft.listing.HudiTimelineWriter.dataSchemaAt(spark, location(meta)).foreach { cur =>
      val declared = cur.fields.map(f => (f.name, f.dataType)).toSeq
      val mine = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val additive = evolve && mine.size > declared.size &&
        mine.take(declared.size) == declared
      if (declared != mine && !additive)
        throw new IllegalArgumentException(
          s"append schema mismatch for Hudi table at ${location(meta)}: table declares " +
            s"${declared.map { case (a, b) => s"$a:${b.simpleString}" }.mkString("[", ", ", "]")}, batch has " +
            s"${mine.map { case (a, b) => s"$a:${b.simpleString}" }.mkString("[", ", ", "]")}" +
            (if (!evolve && mine.size > declared.size && mine.take(declared.size) == declared)
               " (additive; pass evolve = true to extend the schema)" else ""))
    }
    val v = graft.listing.HudiTimelineWriter.commit(
      spark, location(meta), df, meta.table.partitionKeys.map(_.name))
    invalidateTable(database, table)
    v
  }

  /** ROLLBACK a registered Hudi table to an earlier instant as a new
    * replacecommit ([[graft.listing.HudiTimelineWriter.rollback]]):
    * after this, the latest read equals the time-travel read at
    * `versionOffset` (counted BEFORE the rollback); the timeline
    * stays append-only so every prior state still travels, and
    * [[cleanHudiTable]] reclaims orphaned slices later. Pure
    * metadata. Returns the published instant.
    */
  def rollbackHudiTable(database: String, table: String, versionOffset: Int): String = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Hudi,
      s"$database.$table is ${meta.tableType}, not a Hudi table")
    val v = graft.listing.HudiTimelineWriter.rollback(spark, location(meta), versionOffset)
    invalidateTable(database, table)
    v
  }

  /** COPY-ON-WRITE upsert by `key`: file groups whose FOOTER key
    * range intersects the source span are retired via a
    * replacecommit and rewritten (existing rows minus updated keys,
    * plus the source batch) in the same instant; every other group
    * keeps its physical file untouched. This is the same
    * stats-surgical shape as [[mergeDelta]] — Hudi commit stats
    * carry no column bounds, so the prover reads the parquet footers
    * of the live slices (driver-side KB GETs, the price real Hudi
    * pays to its bloom index). Pure inserts (no intersecting group)
    * append as a new file group without retiring anything.
    */
  def upsertHudi(database: String, table: String, source: DataFrame, key: String): String = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Hudi,
      s"$database.$table is ${meta.tableType}, not a Hudi table")
    require(source.columns.contains(key), s"upsert key $key not in the source batch")
    val span = source.agg(min(col(key)), max(col(key))).head()
    val live = new graft.listing.HudiTimelineResolver(hadoopConf)
      .dataFilesDetailed(location(meta))
    if (span.isNullAt(0) || live.isEmpty)
      return appendHudiTable(source, database, table)
    val df = tableDF(database, table)
    val cond = df.filter(col(key).between(lit(span.get(0)), lit(span.get(1))))
      .queryExecution.optimizedPlan.collectFirst { case Filter(c, _) => c }
      .getOrElse(org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
    val resolver: graft.listing.StatsPruning.Resolver = (a, b) => a.equalsIgnoreCase(b)
    val affected = live.filterNot { f =>
      val bounds = graft.listing.FooterStats.read(hadoopConf, f.path)
      bounds.nonEmpty && graft.listing.StatsPruning.proveFalse(cond, bounds, resolver)
    }
    val keys = meta.table.partitionKeys.map(_.name)
    val instant =
      if (affected.isEmpty)
        graft.listing.HudiTimelineWriter.commit(spark, location(meta), source, keys)
      else {
        val kept = readTable(database, table, 0,
          keep = Some(affected.map(_.path).toSet), proxied = false)
          .join(source.select(col(key)).distinct(), Seq(key), "left_anti")
          .unionByName(source)
        val retired = affected.groupBy(_.partitionPath)
          .map { case (p, fsz) => p -> fsz.map(_.fileId) }
        graft.listing.HudiTimelineWriter.commit(spark, location(meta), kept, keys,
          replaceFileIds = retired)
      }
    invalidateTable(database, table)
    instant
  }

  /** Row-level DELETE WHERE for a Hudi table — the copy-on-write
    * replacecommit shape of [[upsertHudi]] minus the insert: file
    * groups whose parquet footers PROVE no row can match keep their
    * physical file untouched; matching groups are rewritten to their
    * surviving rows (`WHERE p` deletes rows where p is TRUE; false
    * and NULL rows stay, per SQL DELETE semantics) and retired via
    * the same replacecommit. Completes the row-level-delete row of
    * the format matrix (Delta CoW g48-style, Iceberg MOR, now Hudi
    * CoW). Returns the committed instant, or "" when every group is
    * provably unaffected (no commit at all).
    */
  def deleteHudiWhere(database: String, table: String, predicate: Column): String = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Hudi,
      s"$database.$table is ${meta.tableType}, not a Hudi table")
    val live = new graft.listing.HudiTimelineResolver(hadoopConf)
      .dataFilesDetailed(location(meta))
    if (live.isEmpty) return ""
    val df = tableDF(database, table)
    val cond = df.filter(predicate).queryExecution.optimizedPlan.collectFirst {
      case Filter(c, _) => c
    }.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
    val resolver: graft.listing.StatsPruning.Resolver = (a, b) => a.equalsIgnoreCase(b)
    val affected = live.filterNot { f =>
      val bounds = graft.listing.FooterStats.read(hadoopConf, f.path)
      bounds.nonEmpty && graft.listing.StatsPruning.proveFalse(cond, bounds, resolver)
    }
    if (affected.isEmpty) return ""
    val keys = meta.table.partitionKeys.map(_.name)
    val kept = readTable(database, table, 0,
      keep = Some(affected.map(_.path).toSet), proxied = false)
      .filter(!coalesce(predicate, lit(false)))
    val retired = affected.groupBy(_.partitionPath)
      .map { case (p, fsz) => p -> fsz.map(_.fileId) }
    val instant = graft.listing.HudiTimelineWriter.commit(
      spark, location(meta), kept, keys, replaceFileIds = retired)
    invalidateTable(database, table)
    instant
  }

  /** Iceberg small-file compaction (the OPTIMIZE analog): rewrite
    * the live row set — with any merge-on-read deletes APPLIED — as
    * `ceil(bytes/target)` files in one REWRITE snapshot whose
    * manifest list references only the new manifest. Retired data
    * and delete files stop being referenced (physical reclamation is
    * [[expireIcebergSnapshots]]); earlier snapshots still
    * time-travel. Returns the new sequence number.
    */
  /** ROLLBACK a registered Iceberg table to an earlier snapshot as a
    * new snapshot ([[graft.listing.IcebergWriter.rollback]]): after
    * this, the latest read equals the time-travel read at
    * `snapshotOffset` (counted BEFORE the rollback); history stays
    * intact and expire reclaims orphans later. Pure metadata.
    * Returns the new sequence number.
    */
  def rollbackIcebergTable(database: String, table: String, snapshotOffset: Int): Long = {
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val v = graft.listing.IcebergWriter.rollback(spark, location(meta), snapshotOffset)
    invalidateTable(database, table)
    v
  }

  def compactIcebergTable(database: String, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val live = files(database, table)
    val nFiles = math.max(1, math.ceil(
      live.map(_.size).sum.toDouble / targetFileBytes).toInt)
    // tableDF subtracts live MOR deletes, so compaction folds them in
    val v = graft.listing.IcebergWriter.commit(spark, location(meta),
      tableDF(database, table).repartition(nFiles),
      meta.table.partitionKeys.map(_.name), rewriteAll = true)
    invalidateTable(database, table)
    v
  }

  /** Iceberg SNAPSHOT EXPIRY: drop metadata versions older than the
    * last `retainVersions`, then physically delete every file —
    * data parquet, delete parquet, manifest/manifest-list Avro,
    * metadata JSON — referenced by none of the retained versions.
    * The lifecycle mirror of [[vacuumDeltaTable]]/[[cleanHudiTable]]
    * : rewritten-away and MOR-deleted files finally leave disk here,
    * never on the write path. Returns the deleted paths.
    */
  def expireIcebergSnapshots(database: String, table: String,
      retainVersions: Int = 2): Seq[String] = {
    require(retainVersions >= 1, "must retain at least the current version")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Iceberg,
      s"$database.$table is ${meta.tableType}, not an Iceberg table")
    val root = location(meta).stripSuffix("/")
    val fs = new HadoopPath(root).getFileSystem(hadoopConf)
    val metaDir = new HadoopPath(s"$root/metadata")
    if (!fs.exists(metaDir)) return Nil

    // every path any retained version can reach — PLUS every path any
    // named ref (staged WAP branch, tag) can reach: the version walk
    // resolves refs.main only, so a staged branch's data files are
    // invisible to it, and deleting them would make a later
    // publishBranch fast-forward main onto snapshots whose parquet is
    // gone (ADVICE r13 high). Ref manifests were always kept (the
    // manifestFiles walk spans every snapshot of a retained version);
    // this closes the data-file half.
    val keepData = ((0 until retainVersions).flatMap { off =>
      iceberg.dataFilesDetailed(root, off).map(f => canonPath(f.path)) ++
        iceberg.deleteFilesDetailed(root, off).map(f => canonPath(f.path))
    } ++ iceberg.refReachableFiles(root).map(canonPath)).toSet
    val keepMeta = (0 until retainVersions)
      .flatMap(off => iceberg.manifestFiles(root, off).map(canonPath)).toSet

    // metadata JSONs beyond the retention horizon
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val jsons = fs.listStatus(metaDir).toSeq
      .filter(_.getPath.getName.endsWith(".json"))
      .map { st =>
        val in = fs.open(st.getPath)
        val n = try om.readTree(in) finally in.close()
        (Option(n.get("last-sequence-number")).map(_.asLong()).getOrElse(0L), st.getPath)
      }.sortBy(-_._1)
    val expiredJsons = jsons.drop(retainVersions).map(_._2)

    val staleAvro = fs.listStatus(metaDir).toSeq
      .filter(_.getPath.getName.endsWith(".avro"))
      .map(_.getPath).filterNot(p => keepMeta.contains(canonPath(p.toString)))
    def walk(p: HadoopPath): Seq[HadoopPath] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.getPath.getName == "metadata") Nil
        else if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Nil
      }
    val staleData = walk(new HadoopPath(root))
      .filterNot(p => keepData.contains(canonPath(p.toString)))

    val doomed = expiredJsons ++ staleAvro ++ staleData
    doomed.foreach(p => fs.delete(p, false))
    invalidateTable(database, table)
    doomed.map(_.toString)
  }

  /** Hudi small-file compaction (the OPTIMIZE analog — Hudi calls it
    * clustering): rewrite the whole live set as `ceil(bytes/target)`
    * file groups in ONE replacecommit retiring every current group.
    * Earlier instants still time-travel to the old layout; nothing
    * is physically deleted ([[cleanHudiTable]] is the deletion
    * half). Returns the instant.
    */
  def compactHudiTable(database: String, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024): String = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Hudi,
      s"$database.$table is ${meta.tableType}, not a Hudi table")
    val live = new graft.listing.HudiTimelineResolver(hadoopConf)
      .dataFilesDetailed(location(meta))
    val nFiles = math.max(1, math.ceil(
      live.map(_.size).sum.toDouble / targetFileBytes).toInt)
    val retired = live.groupBy(_.partitionPath)
      .map { case (p, fsz) => p -> fsz.map(_.fileId) }
    val instant = graft.listing.HudiTimelineWriter.commit(spark, location(meta),
      tableDF(database, table).repartition(nFiles),
      meta.table.partitionKeys.map(_.name), replaceFileIds = retired)
    invalidateTable(database, table)
    instant
  }

  /** Hudi CLEANING: physically delete file slices referenced by none
    * of the last `retainInstants` timeline states (stale upsert
    * versions, groups retired by replacecommits) — the VACUUM
    * analog, same retention contract as [[vacuumDeltaTable]].
    * Returns the deleted paths.
    */
  def cleanHudiTable(database: String, table: String, retainInstants: Int = 2): Seq[String] = {
    require(retainInstants >= 1, "must retain at least the current instant")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Hudi,
      s"$database.$table is ${meta.tableType}, not a Hudi table")
    val root = location(meta).stripSuffix("/")
    val fs = new HadoopPath(root).getFileSystem(hadoopConf)
    val hudiRes = new graft.listing.HudiTimelineResolver(hadoopConf)
    val referenced = (0 until retainInstants)
      .flatMap(off => hudiRes.dataFilesDetailed(root, off).map(f => canonPath(f.path))).toSet
    def walk(p: HadoopPath): Seq[HadoopPath] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name == ".hoodie") Nil
        else if (st.isDirectory) walk(st.getPath)
        else if (name.endsWith(".parquet")) Seq(st.getPath)
        else Nil
      }
    val doomed = walk(new HadoopPath(root))
      .filterNot(p => referenced.contains(canonPath(p.toString)))
    doomed.foreach(p => fs.delete(p, false))
    invalidateTable(database, table)
    doomed.map(_.toString)
  }

  /** Physically delete data files no longer referenced by the last
    * `retainVersions` versions — the VACUUM half of the Delta
    * lifecycle ([[optimizeDeltaTable]] retires files logically but
    * keeps them for time travel). Only files under the table root are
    * candidates; anything referenced by ANY retained version
    * survives. Returns the deleted paths.
    */
  def vacuumDeltaTable(database: String, table: String, retainVersions: Int = 2): Seq[String] = {
    require(retainVersions >= 1, "must retain at least the current version")
    val meta = tableMetadata(database, table)
    require(meta.tableType == TableType.Delta,
      s"$database.$table is ${meta.tableType}, not a Delta table")
    val root = location(meta).stripSuffix("/")
    val fs = new HadoopPath(root).getFileSystem(hadoopConf)
    // live deletion-vector sidecars are referenced files too — a
    // vacuum that reclaimed one would silently RESURRECT its deleted
    // rows on the next read
    val referenced = (0 until retainVersions)
      .flatMap(off => files(database, table, off).map(f => canonPath(f.path)) ++
        delta.deletionVectors(root, off).values.map(canonPath)).toSet
    def walk(p: HadoopPath): Seq[HadoopPath] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name == "_delta_log") Nil
        else if (st.isDirectory) walk(st.getPath)
        else if (name.endsWith(".parquet")) Seq(st.getPath)
        else Nil
      }
    val doomed = walk(new HadoopPath(root))
      .filterNot(p => referenced.contains(canonPath(p.toString)))
    doomed.foreach(p => fs.delete(p, false))
    doomed.map(_.toString)
  }

  /** Small-file compaction — the maintenance operation every
    * long-running ingest pipeline needs (streaming/incremental
    * writers leave thousands of KB-scale files per partition; at
    * 100 TB that means listing storms and task-per-tiny-file
    * overhead). Rewrites `database.table` as `outTable` at
    * `outLocation` with file count sized from the REAL listed bytes
    * (the size metadata the listing already carries — no extra
    * stat pass): `ceil(totalBytes / targetFileBytes)` output files,
    * hash-distributed by the partition keys so each Hive partition
    * dir collapses to a bounded file set while the write stays one
    * shuffle. The reference is read-only; this is the write-side
    * counterpart of its "list once, plan many" philosophy.
    *
    * `clusterBy`: range-partition and sort the rewrite by these
    * columns instead of hash-distributing — each output file then
    * covers a narrow value range, which is what makes planner-time
    * FILE skipping (footer min/max stats, [[graft.listing
    * .FooterStats]]) selective on later reads. Compact-then-cluster
    * is the standard layout-maintenance pair (the 1-D case of Delta
    * `OPTIMIZE ... ZORDER BY`).
    */
  def compactTable(database: String, table: String, outTable: String,
      outLocation: String, targetFileBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Nil): GlueTable = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val meta = tableMetadata(database, table)
    val totalBytes = files(database, table).map(_.size).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val keys = meta.table.partitionKeys.map(_.name)
    val df = tableDF(database, table)
    val repart =
      if (clusterBy.nonEmpty)
        df.repartitionByRange(nFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else if (keys.nonEmpty) df.repartition(nFiles, keys.map(col): _*)
      else df.repartition(nFiles)
    writeTable(repart, database, outTable, outLocation, partitionBy = keys)
  }

  /** Compact with a Z-ORDER layout: rows are range-partitioned and
    * sorted by the Morton interleave of the `zorderBy` columns
    * ([[graft.functions.ZOrder]]), so every output file holds a tight
    * value range in EACH clustered dimension and the footer-stats
    * skipping tier prunes files for predicates on ANY of them —
    * `compactTable(clusterBy = ...)` serves only its leading column.
    * The per-column min/max needed for grid normalization is one
    * tiny aggregate over the (already planned) table scan.
    */
  def compactTableZOrder(database: String, table: String, outTable: String,
      outLocation: String, zorderBy: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024, bits: Int = 16): GlueTable = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(zorderBy.size >= 2, "z-order needs at least two columns")
    val meta = tableMetadata(database, table)
    val totalBytes = files(database, table).map(_.size).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val keys = meta.table.partitionKeys.map(_.name)
    val df = tableDF(database, table)
    // grid normalization needs a numeric span: validate up front so a
    // string/complex zorderBy column errors by name, not as a null
    // cast deep in the stats row
    zorderBy.foreach { c =>
      val f = df.schema.find(_.name == c).getOrElse(throw new IllegalArgumentException(
        s"zorderBy column $c not found in $database.$table (columns: ${df.columns.mkString(", ")})"))
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"zorderBy column $c must be numeric, got ${f.dataType.simpleString}")
    }
    val stats = df.agg(
      zorderBy.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))).head,
      zorderBy.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))).tail: _*)
      .head()
    val norm = zorderBy.zipWithIndex.map { case (c, i) =>
      // empty table / all-null column: min/max aggregate to NULL —
      // treat as a degenerate span (the dimension contributes cell 0,
      // matching the hi <= lo rule) instead of an opaque NPE
      if (stats.isNullAt(2 * i) || stats.isNullAt(2 * i + 1))
        lit(0L)
      else
        graft.functions.ZOrder.normalize(col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits)
    }
    val z = graft.functions.ZOrder.zvalue(norm, bits)
    val repart = df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    writeTable(repart, database, outTable, outLocation, partitionBy = keys)
  }

  /** S3 credential configuration (≈ reference `setCredentials` /
    * `CREATE SECRET`, src/glue-table-cache.ts:98-122): maps onto the
    * Hadoop S3A configuration the executors use for s3a:// locations.
    * No-op for local file:// fixtures.
    */
  def setCredentials(accessKey: String, secretKey: String,
      sessionToken: Option[String] = None): Unit = {
    val conf = hadoopConf
    conf.set("fs.s3a.access.key", accessKey)
    conf.set("fs.s3a.secret.key", secretKey)
    sessionToken match {
      case Some(tok) =>
        conf.set("fs.s3a.session.token", tok)
        conf.set("fs.s3a.aws.credentials.provider",
          "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")
      case None =>
        conf.unset("fs.s3a.session.token")
    }
  }

  // ---------------------------------------------------------------- cache mgmt

  /** ≈ reference `clearCache` (src/glue-table-cache.ts:124-127). */
  def clearCache(): Unit = {
    metaCache.invalidateAll(); listingCache.invalidateAll(); typedCache.invalidateAll()
    statsCache.invalidateAll(); deleteCache.invalidateAll(); seqCache.invalidateAll()
  }

  /** ≈ reference `invalidateTable` (src/glue-table-cache.ts:206-215):
    * drop the metadata key and every listing key containing
    * `<db>_<tbl>`.
    */
  def invalidateTable(database: String, table: String): Unit = {
    metaCache.invalidate(s"$database.$table")
    listingCache.invalidateMatching(s"$database.$table")
    typedCache.invalidateMatching(s"$database.$table")
    statsCache.invalidateMatching(s"$database.$table")
    deleteCache.invalidateMatching(s"$database.$table")
    seqCache.invalidateMatching(s"$database.$table")
    dvCache.invalidateMatching(s"$database.$table")
    inferredSchemas.keys.filter(_.startsWith(s"$database.$table#"))
      .foreach(inferredSchemas.remove)
  }

  /** ≈ reference `close` (drops caches; the SparkSession is shared
    * and stays up, like the reference leaves the caller's process
    * alone).
    */
  def close(): Unit = clearCache()
}

object GlueTableEngine {
  /** Column names the listing frames own (lower-cased): partition
    * keys may not shadow them — see the validation in
    * `tableMetadata`.
    */
  private[engine] val ReservedListingColumns = Set("path", "size", "modtime", "pv")

  /** Result of `convertGlueTableQuery`: the temp views registered for
    * the query's glue refs, and the statement rewritten to use them.
    * `toString` renders the reference-style single artifact (setup
    * comment header + SQL).
    */
  final case class ConvertedQuery(setupViews: Seq[String], sql: String) {
    override def toString: String =
      setupViews.map(v => s"-- registered temp view: $v\n").mkString + sql
  }
}
