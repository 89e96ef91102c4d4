package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate, SubqueryExpression}
import org.apache.spark.sql.execution.datasources.{FileFormat, FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A [[FileIndex]] over files already listed (and stat'ed) by the
  * engine's cached lister — the Spark-native analog of the
  * reference's files-variable read path (reference:
  * src/glue-table-cache.ts:323-333 feeding
  * `parquet_scan(getvariable(...))`): DuckDB scans exactly the listed
  * paths; here Spark plans over exactly the listed `FileStatus`es.
  *
  * Why not hand Spark the paths and let `InMemoryFileIndex` re-list?
  * At 10M files that second pass is millions of S3 LIST/HEAD calls
  * per query, for metadata the engine's TTL cache already holds. This
  * index serves size/mtime from the listing (S3 LIST carries both;
  * Iceberg manifests carry size), so the scan plans its splits and
  * the optimizer gets real `sizeInBytes` statistics — broadcast
  * decisions are wrong in BOTH directions if sizes are fake: 0 bytes
  * broadcasts a 100 TB table (OOM), +∞ never broadcasts a 1 MB one.
  *
  * Partition semantics: each file belongs to a partition-value tuple
  * computed at listing time (Hive `key=value` extraction, projection
  * patterns, or catalog values for out-of-root partitions). Spark's
  * `FileSourceStrategy` splits query predicates on
  * [[partitionSchema]] and passes the partition conjuncts to
  * [[listFiles]], giving native planner-time partition pruning (and
  * runtime dynamic pruning) — per-relation and sound under OR/CTE,
  * unlike the reference's global top-level-WHERE rewrite
  * (reference: src/sql-transformer.ts:244-247).
  */
final class PreListedFileIndex(
    override val partitionSchema: StructType,
    partitions: Seq[(InternalRow, Seq[FileStatus])],
    roots: Seq[Path],
    statsByPath: Map[String, Map[String, graft.listing.ColRange]] = Map.empty)
  extends FileIndex {

  private val dirs: Seq[PartitionDirectory] =
    partitions.map { case (values, statuses) => PartitionDirectory(values, statuses.toArray) }

  override def rootPaths: Seq[Path] = roots

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    skipByStats(pruneByPartition(partitionFilters), dataFilters)
  }

  private def pruneByPartition(partitionFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    if (partitionSchema.isEmpty) return dirs
    val resolver = SQLConf.get.resolver
    // Bind by name against the partition schema. A filter that can't
    // be bound here (subquery-bearing, non-deterministic, or
    // referencing something else) is skipped — returning a superset
    // is always safe; the filter still runs above the scan.
    val bindable = partitionFilters.filter { f =>
      f.deterministic && !SubqueryExpression.hasSubquery(f) &&
        f.references.forall(a => partitionSchema.exists(sf => resolver(sf.name, a.name)))
    }
    if (bindable.isEmpty) return dirs
    val bound = bindable.reduce(And).transform {
      case a: AttributeReference =>
        val idx = partitionSchema.indexWhere(sf => resolver(sf.name, a.name))
        BoundReference(idx, partitionSchema(idx).dataType, nullable = true)
    }
    val predicate = Predicate.createInterpreted(bound)
    predicate.initialize(0)
    dirs.filter(d => predicate.eval(d.values))
  }

  /** File-level data skipping: drop a file when some pushed data
    * filter is provably false on its column ranges (footer/manifest
    * min-max — the Delta/Iceberg data-skipping design). A file with
    * no stats, or a filter shape the prover doesn't know, is always
    * kept; the filter still runs in the scan above.
    */
  private def skipByStats(selected: Seq[PartitionDirectory],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    if (statsByPath.isEmpty || dataFilters.isEmpty) return selected
    val resolver = SQLConf.get.resolver
    val usable = dataFilters.filter(f => f.deterministic && !SubqueryExpression.hasSubquery(f))
    if (usable.isEmpty) return selected
    selected.map { d =>
      val kept = d.files.filter { f =>
        statsByPath.get(f.getPath.toString) match {
          case Some(stats) if stats.nonEmpty =>
            !usable.exists(e => graft.listing.StatsPruning.proveFalse(e, stats, resolver))
          case _ => true
        }
      }
      if (kept.length == d.files.length) d else PartitionDirectory(d.values, kept)
    }
  }

  override def inputFiles: Array[String] =
    dirs.iterator.flatMap(_.files.map(_.getPath.toString)).toArray

  override def refresh(): Unit = () // engine TTL caches own freshness

  /** Real bytes on disk × the configured compression factor — the
    * statistic `JoinSelection` compares against the broadcast
    * threshold.
    */
  override val sizeInBytes: Long = {
    val raw = dirs.iterator.flatMap(_.files).map(_.getLen).sum
    (raw * SQLConf.get.fileCompressionFactor).toLong
  }
}

object PreListedFileIndex {

  /** `FileFormat` for a Glue `classification` table parameter. */
  def formatFor(classification: String): FileFormat = classification match {
    case "csv"  => new org.apache.spark.sql.execution.datasources.csv.CSVFileFormat()
    case "json" => new org.apache.spark.sql.execution.datasources.json.JsonFileFormat()
    case "orc"  => new org.apache.spark.sql.execution.datasources.orc.OrcFileFormat()
    case "xml"  => new org.apache.spark.sql.execution.datasources.xml.XmlFileFormat()
    case "avro" => new GraftAvroFileFormat()
    case _      => new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
  }

  /** Plan a DataFrame over a pre-listed file set: `HadoopFsRelation`
    * over a [[PreListedFileIndex]], wrapped in a `LogicalRelation` —
    * exactly what `spark.read.parquet(paths)` builds, minus the
    * driver-side re-listing `InMemoryFileIndex` would do.
    */
  def dataFrame(
      spark: SparkSession,
      format: FileFormat,
      options: Map[String, String],
      dataSchema: StructType,
      partitionSchema: StructType,
      partitions: Seq[(InternalRow, Seq[FileStatus])],
      roots: Seq[Path],
      statsByPath: Map[String, Map[String, graft.listing.ColRange]] = Map.empty): DataFrame = {
    val index = new PreListedFileIndex(partitionSchema, partitions, roots, statsByPath)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = format,
      options = options)(Shim.classic(spark))
    Shim.ofRows(spark, LogicalRelation(relation, isStreaming = false))
  }
}
