package graft.listing

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** One live data file of a Delta table version. */
final case class DeltaDataFile(path: String, size: Long,
    partition: Map[String, String], bounds: Map[String, ColRange])

/** Delta Lake transaction-log → data-file resolution, without a
  * Delta runtime — the Delta counterpart of
  * [[IcebergSnapshotResolver]], and a deliberate beyond-reference
  * extension: the reference's classifier declares the DELTA table
  * type but can never return it (reference: src/util/glue.ts:13-19),
  * so Delta-registered Glue tables are unreadable there.
  *
  * Pure-metadata walk of the public Delta protocol
  * (https://github.com/delta-io/delta/blob/master/PROTOCOL.md):
  *   1. versions are the `_delta_log/<20-digit>.json` commits; the
  *      latest version minus `versionOffset` is the read target
  *      (time travel, same offset convention as Iceberg's);
  *   2. state starts from the newest `<v>.checkpoint[.N.M].parquet`
  *      at or below the target (classic and multi-part checkpoints),
  *      read as parquet — a checkpoint IS the replayed state, so a
  *      million-commit table costs one checkpoint read plus the
  *      commits after it, never a full log replay;
  *   3. the remaining JSON commits replay in order: `add` upserts a
  *      file (last writer wins per path), `remove` deletes it,
  *      `metaData` refreshes the schema used to type file statistics.
  *
  * Per-file `stats` (numRecords / minValues / maxValues / nullCount)
  * decode into [[ColRange]]s for the planner's file-skipping tier —
  * the same zero-extra-I/O path as Iceberg manifest bounds. Float and
  * double ranges are marked `mayHideNaN` (Delta writers disagree on
  * NaN handling, so only NaN-safe proofs may use them); timestamp
  * stats are skipped entirely (writer-dependent serialization),
  * which only costs skipping opportunity, never correctness.
  *
  * Like the Iceberg resolver, everything here is driver-side
  * metadata: at 100 TB only paths and stats move through the driver,
  * and commit JSONs are KB-scale regardless of table size.
  */
/** Delta transaction-log WRITER — the engine's transactional write
  * path, readable back by [[DeltaLogResolver]] (round-trip
  * spec-proven) and by any Delta reader that follows the protocol.
  * Each [[commit]] writes the batch's data files under a
  * per-version subdirectory, derives per-file statistics from the
  * parquet FOOTERS just written (numRecords + min/max + null
  * evidence — zero extra data scans), and publishes the version by
  * an atomic rename of the commit JSON into `_delta_log/` — readers
  * never observe a half-written commit, and data files without a
  * published commit are invisible garbage, the standard lakehouse
  * crash contract.
  */
object DeltaLogWriter {
  private def jstr(s: String): String =
    new ObjectMapper().writeValueAsString(s)

  /** Write `df` as the next commit of the Delta table at `location`
    * (version 0 creates the table and records `metaData`). Returns
    * the committed version.
    */
  def commit(spark: SparkSession, location: String, df: org.apache.spark.sql.DataFrame,
      partitionBy: Seq[String] = Nil): Long =
    commitWith(spark, location, df, partitionBy, removePaths = Nil)

  /** [[commit]] that additionally RETIRES files — the rewrite shape
    * (OPTIMIZE/compaction, delete-where): one commit carries remove
    * actions for every retired file plus the adds of its replacement
    * data, so readers atomically flip from the old layout to the new
    * and earlier versions still time-travel to the old slices.
    */
  def commitWith(spark: SparkSession, location: String, df: org.apache.spark.sql.DataFrame,
      partitionBy: Seq[String], removePaths: Seq[String],
      txn: Option[(String, Long)] = None): Long = {
    val root = location.stripSuffix("/")
    val logDir = new Path(s"$root/_delta_log")
    val conf = org.apache.spark.sql.graft.Shim.classic(spark)
      .sparkContext.hadoopConfiguration
    val fs = logDir.getFileSystem(conf)
    fs.mkdirs(logDir)
    val CommitRe = """(\d{20})\.json""".r
    val version = fs.listStatus(logDir).toSeq.flatMap(_.getPath.getName match {
      case CommitRe(v) => Some(v.toLong)
      case _           => None
    }).maxOption.map(_ + 1L).getOrElse(0L)

    val sub = s"v$version"
    val out = s"$root/$sub"
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(out)

    // per-file add actions, stats from the footers just written
    val dataSchema = org.apache.spark.sql.types.StructType(
      df.schema.filterNot(f => partitionBy.contains(f.name)))
    def walk(p: Path): Seq[Path] = {
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Nil
      }
    }
    val adds = walk(new Path(out)).sortBy(_.toString).map { p =>
      val rel = p.toUri.getPath.stripPrefix(new Path(root).toUri.getPath).stripPrefix("/")
      val pv = rel.split('/').dropRight(1).collect {
        case seg if seg.contains('=') =>
          val Array(k, v) = seg.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      val pvJson = pv.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ", ", "}")
      val size = fs.getFileStatus(p).getLen
      val stats = statsJson(conf, p.toString, dataSchema)
      s"""{"add":{"path":${jstr(rel)},"size":$size,"partitionValues":$pvJson,"dataChange":true""" +
        stats.map(s => s""","stats":${jstr(s)}""").getOrElse("") + "}}"
    }
    val metaLine =
      if (version == 0L)
        Seq(s"""{"metaData":{"id":${jstr(java.util.UUID.nameUUIDFromBytes(root.getBytes("UTF-8")).toString)},""" +
          s""""format":{"provider":"parquet"},"schemaString":${jstr(dataSchema.json)},""" +
          s""""partitionColumns":[${partitionBy.map(jstr).mkString(", ")}]}}""")
      else Nil
    val rootPath = new Path(root).toUri.getPath
    val removes = removePaths.map { p =>
      // record table-root-relative paths when possible (the form adds
      // use); the resolver resolves either form
      val uriPath = new Path(p).toUri.getPath
      val rel = if (uriPath.startsWith(rootPath))
        uriPath.stripPrefix(rootPath).stripPrefix("/") else p
      s"""{"remove":{"path":${jstr(rel)},"dataChange":false}}"""
    }
    // streaming exactly-once: a txn action records (appId, version) so
    // a replayed micro-batch can be recognized and skipped (the Delta
    // streaming-sink idempotence protocol)
    val txnLine = txn.toSeq.map { case (appId, v) =>
      s"""{"txn":{"appId":${jstr(appId)},"version":$v}}"""
    }
    val body = (metaLine ++ txnLine ++ removes ++ adds).mkString("", "\n", "\n")

    // atomic publish: write to a temp name, rename into place
    val tmp = new Path(logDir, f".${version}%020d.json.tmp")
    val dst = new Path(logDir, f"${version}%020d.json")
    val os = fs.create(tmp, true)
    try os.write(body.getBytes("UTF-8")) finally os.close()
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"commit $version already published at $dst")
    version
  }

  /** Footer-derived stats JSON for one data file: numRecords always;
    * min/max for int/long/float/double/string columns (dates and
    * timestamps are skipped — their catalyst forms don't round-trip
    * through JSON text unambiguously, and absent stats only cost
    * skipping); nullCount 0 recorded when the footer proves it.
    */
  private def statsJson(conf: org.apache.hadoop.conf.Configuration,
      path: String, schema: StructType): Option[String] = {
    val n = FooterStats.rowCount(conf, path).getOrElse(return None)
    val ranges = FooterStats.read(conf, path)
    def render(dt: DataType, v: Any): Option[String] = (dt, v) match {
      case (LongType, l: Long)       => Some(l.toString)
      case (IntegerType, i: Int)     => Some(i.toString)
      case (DoubleType, d: Double)   => Some(d.toString)
      case (FloatType, f: Float)     => Some(f.toString)
      case (StringType, s: UTF8String) => Some(jstr(s.toString))
      case _ => None
    }
    val mins = scala.collection.mutable.ListBuffer.empty[String]
    val maxs = scala.collection.mutable.ListBuffer.empty[String]
    val nulls = scala.collection.mutable.ListBuffer.empty[String]
    schema.fields.foreach { f =>
      ranges.get(f.name).foreach { r =>
        if (!r.allNulls)
          for (mn <- render(f.dataType, r.min); mx <- render(f.dataType, r.max)) {
            mins += s"${jstr(f.name)}: $mn"
            maxs += s"${jstr(f.name)}: $mx"
          }
        if (r.noNulls) nulls += s"${jstr(f.name)}: 0"
        else if (r.allNulls) nulls += s"${jstr(f.name)}: $n"
      }
    }
    Some(s"""{"numRecords": $n, "minValues": {${mins.mkString(", ")}}, """ +
      s""""maxValues": {${maxs.mkString(", ")}}, "nullCount": {${nulls.mkString(", ")}}}""")
  }
}

final class DeltaLogResolver(spark: SparkSession) {
  private val mapper = new ObjectMapper()
  private def hadoopConf =
    org.apache.spark.sql.graft.Shim.classic(spark).sparkContext.hadoopConfiguration

  private val CommitRe = """(\d{20})\.json""".r
  private val CheckpointRe = """(\d{20})\.checkpoint(?:\.\d+\.\d+)?\.parquet""".r

  /** Latest commit version, or None for a missing/empty log. */
  def latestVersion(location: String): Option[Long] = {
    val (_, commits, _) = listLog(location)
    commits.lastOption.map(_._1)
  }

  /** Highest `txn` version recorded for `appId` across the commit
    * JSONs — the reader half of the streaming-sink idempotence
    * protocol ([[DeltaLogWriter.commitWith]]'s `txn`). Commits
    * trimmed behind a checkpoint are not consulted (the sink's
    * recovery window is the retained log tail — ample for any
    * realistic replay horizon).
    */
  def lastTxnVersion(location: String, appId: String): Option[Long] = {
    val (logDir, commits, _) = listLog(location)
    val fs = logDir.getFileSystem(hadoopConf)
    val versions = commits.flatMap { case (_, p) =>
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      text.split('\n').iterator.map(_.trim).filter(_.nonEmpty).flatMap { line =>
        Option(mapper.readTree(line).get("txn"))
          .filter(t => Option(t.get("appId")).exists(_.asText() == appId))
          .flatMap(t => Option(t.get("version")).map(_.asLong()))
      }.toSeq
    }
    versions.maxOption
  }

  /** Live data files of the selected version (latest − offset). */
  def dataFilesDetailed(location: String, versionOffset: Int = 0): Seq[DeltaDataFile] = {
    require(versionOffset >= 0, s"versionOffset must be >= 0: $versionOffset")
    val (logDir, commits, checkpoints) = listLog(location)
    if (commits.isEmpty) return Nil
    val target = commits.last._1 - versionOffset
    if (target < 0) return Nil

    val root = location.stripSuffix("/")
    // mutable replay state: path -> (size, partitionValues, bounds)
    val live = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Map[String, String], String)]
    var schema: Option[StructType] = None

    val cpVer = checkpoints.keySet.filter(_ <= target).maxOption
    cpVer.foreach { v =>
      val df = spark.read.parquet(checkpoints(v).map(_.toString): _*)
      if (df.columns.contains("metaData")) {
        val m = df.filter(col("metaData").isNotNull)
          .select("metaData.schemaString").collect().headOption
        schema = m.flatMap(r => Option(r.getString(0))).flatMap(parseSchema)
      }
      if (df.columns.contains("add")) {
        val hasStats = df.select("add.*").columns.contains("stats")
        val cols = Seq(col("add.path"), col("add.size"), col("add.partitionValues")) ++
          (if (hasStats) Seq(col("add.stats")) else Nil)
        df.filter(col("add").isNotNull).select(cols: _*).collect().foreach { r =>
          val pv = Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty)
          val st = if (hasStats && !r.isNullAt(3)) r.getString(3) else null
          live(resolvePath(root, r.getString(0))) = (r.getLong(1), pv, st)
        }
      }
    }

    val fs = logDir.getFileSystem(hadoopConf)
    commits.filter { case (v, _) => v > cpVer.getOrElse(-1L) && v <= target }
      .foreach { case (_, p) =>
        val in = fs.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        text.split('\n').iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          Option(node.get("metaData")).flatMap(m => Option(m.get("schemaString")))
            .foreach(s => schema = parseSchema(s.asText()))
          Option(node.get("add")).foreach { a =>
            val pv = Option(a.get("partitionValues")).map { o =>
              o.properties().asScala
                .filter(e => !e.getValue.isNull)
                .map(e => e.getKey -> e.getValue.asText()).toMap
            }.getOrElse(Map.empty)
            val stats = Option(a.get("stats")).filter(!_.isNull).map(_.asText()).orNull
            live(resolvePath(root, a.get("path").asText())) =
              (Option(a.get("size")).map(_.asLong()).getOrElse(0L), pv, stats)
          }
          Option(node.get("remove")).foreach { r =>
            live.remove(resolvePath(root, r.get("path").asText()))
          }
        }
      }

    live.toSeq.map { case (path, (size, pv, stats)) =>
      DeltaDataFile(path, size, pv,
        Option(stats).flatMap(s => schema.map(boundsOf(s, _))).getOrElse(Map.empty))
    }.sortBy(_.path)
  }

  private def listLog(location: String): (Path, Seq[(Long, Path)], Map[Long, Seq[Path]]) = {
    val logDir = new Path(s"${location.stripSuffix("/")}/_delta_log")
    val fs = logDir.getFileSystem(hadoopConf)
    if (!fs.exists(logDir)) return (logDir, Nil, Map.empty)
    val statuses = fs.listStatus(logDir).toSeq
    val commits = statuses.flatMap { s =>
      s.getPath.getName match {
        case CommitRe(v) => Some(v.toLong -> s.getPath)
        case _           => None
      }
    }.sortBy(_._1)
    val checkpoints = statuses.flatMap { s =>
      s.getPath.getName match {
        case CheckpointRe(v) => Some(v.toLong -> s.getPath)
        case _               => None
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    (logDir, commits, checkpoints)
  }

  /** `add.path` is URL-encoded and relative to the table root unless
    * absolute (the protocol allows both).
    */
  private def resolvePath(root: String, raw: String): String = {
    val decoded =
      try new java.net.URI(raw).getPath match {
        case null | "" => raw
        case p if raw.contains("://") => raw // absolute URI: keep scheme form
        case p => p
      }
      catch { case _: java.net.URISyntaxException => raw }
    if (decoded.contains("://") || decoded.startsWith("/")) decoded
    else s"$root/$decoded"
  }

  private def parseSchema(json: String): Option[StructType] =
    try DataType.fromJson(json) match {
      case s: StructType => Some(s)
      case _             => None
    } catch { case _: Exception => None }

  /** Decode one add-action `stats` JSON into per-column ranges, typed
    * by the table schema so they compare directly against pushed
    * literals (same catalyst-internal forms as [[FooterStats]]).
    * Anything unparseable is simply omitted — absence means "cannot
    * skip", never a wrong skip.
    */
  private def boundsOf(statsJson: String, schema: StructType): Map[String, ColRange] = {
    val node =
      try mapper.readTree(statsJson)
      catch { case _: Exception => return Map.empty }
    if (node == null) return Map.empty
    val numRecords = Option(node.get("numRecords")).filter(_.isNumber).map(_.asLong())
    val mins = Option(node.get("minValues"))
    val maxs = Option(node.get("maxValues"))
    val nulls = Option(node.get("nullCount"))

    def conv(dt: DataType, n: JsonNode): Option[Any] = dt match {
      case LongType if n.isNumber    => Some(n.asLong())
      case IntegerType if n.isNumber => Some(n.asInt())
      case DoubleType if n.isNumber =>
        Some(n.asDouble()).filterNot(_.isNaN)
      case FloatType if n.isNumber =>
        Some(n.floatValue()).filterNot(_.isNaN)
      case StringType if n.isTextual => Some(UTF8String.fromString(n.asText()))
      case DateType if n.isTextual =>
        try Some(java.time.LocalDate.parse(n.asText()).toEpochDay.toInt)
        catch { case _: java.time.format.DateTimeParseException => None }
      case _ => None // timestamps et al.: writer-dependent, skip soundly
    }

    schema.fields.flatMap { f =>
      val nc = nulls.flatMap(o => Option(o.get(f.name))).filter(_.isNumber).map(_.asLong())
      val noNulls = nc.contains(0L)
      val allNulls = (nc, numRecords) match {
        case (Some(c), Some(t)) => t > 0 && c == t
        case _                  => false
      }
      val mn = mins.flatMap(o => Option(o.get(f.name))).filterNot(_.isNull).flatMap(conv(f.dataType, _))
      val mx = maxs.flatMap(o => Option(o.get(f.name))).filterNot(_.isNull).flatMap(conv(f.dataType, _))
      val hideNaN = f.dataType == FloatType || f.dataType == DoubleType
      (mn, mx) match {
        case (Some(a), Some(b)) =>
          Some(f.name -> ColRange(a, b, allNulls = false, noNulls = noNulls, mayHideNaN = hideNaN))
        case _ if allNulls =>
          Some(f.name -> ColRange(null, null, allNulls = true, noNulls = false))
        case _ => None
      }
    }.toMap
  }
}
