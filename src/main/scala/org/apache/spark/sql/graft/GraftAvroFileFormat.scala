package org.apache.spark.sql.graft

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** Read-only Avro `FileFormat` without `spark-avro` (absent from the
  * offline jar set) — plain `org.apache.avro` (which Spark ships)
  * behind the same `HadoopFsRelation`/[[PreListedFileIndex]] planning
  * path as every other format, replacing round 6's one-task-per-file
  * `mapPartitions` tier. What the promotion buys at scale:
  *
  *  - **Partitioned tables.** Partition values come from the
  *    `FileIndex` like any format, so Hive-layout Avro tables prune
  *    and read typed partition columns (round 6 rejected them).
  *  - **Splits.** Avro's 16-byte sync markers make files splittable:
  *    a reader `sync`s to the first block after `file.start` and
  *    stops once past `file.start + file.length` — the classic
  *    Hadoop split contract, so one 10 GB Avro file fans out across
  *    executors instead of pinning one task.
  *  - **Column pruning.** The requested columns become a projected
  *    Avro *reader* schema; Avro schema resolution then skips
  *    non-requested writer fields during decode instead of
  *    materializing them.
  *
  * Mirrors the reference's `read_avro` DuckDB extension surface
  * (reference: src/util/iceberg.ts:30-33 uses it for manifests; the
  * engine's `classification=avro` tables extend it to DATA files).
  *
  * Schema-evolution semantics match the other sources: a requested
  * column absent from a file's writer schema yields null for that
  * file's rows — probed via `Schema.getField`, never
  * `GenericRecord.get(String)`, which THROWS on a missing field (the
  * round-5 Iceberg-manifest bug class).
  */
final class GraftAvroFileFormat extends FileFormat with Serializable {

  override def inferSchema(
      sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] =
    files.headOption.map(f => graft.sources.AvroSource.inferSchema(
      sparkSession.sessionState.newHadoopConf(), f.getPath.toString))

  override def prepareWrite(
      sparkSession: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory =
    throw new UnsupportedOperationException("the offline Avro format is read-only")

  override def isSplitable(
      sparkSession: SparkSession,
      options: Map[String, String],
      path: Path): Boolean = true

  override def toString: String = "GraftAvro"
  override def hashCode(): Int = getClass.hashCode()
  override def equals(other: Any): Boolean = other.isInstanceOf[GraftAvroFileFormat]

  override def buildReader(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val bc = sparkSession.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    file => readSplit(bc.value.value, file, requiredSchema)
  }

  /** Stream one split's records as internal rows: open, `sync` to the
    * first block at/after `file.start`, stop past the split end. The
    * reader closes when the iterator drains AND on task completion (a
    * `LIMIT`-style early abort or task failure otherwise leaks the
    * `FsInput` fd / S3 stream until GC in a long-lived executor).
    */
  private def readSplit(conf: Configuration, file: PartitionedFile,
      requiredSchema: StructType): Iterator[InternalRow] = {
    val in = new FsInput(file.toPath, conf)
    val datumReader = new GenericDatumReader[GenericRecord]()
    val reader =
      try new DataFileReader[GenericRecord](in, datumReader)
      catch { case t: Throwable => in.close(); throw t }
    var closed = false
    def close(): Unit = if (!closed) { closed = true; reader.close() }
    try {
      val writerSchema = reader.getSchema
      require(writerSchema.getType == Schema.Type.RECORD,
        s"${file.toPath}: expected an Avro record writer schema, got ${writerSchema.getType}")
      // Projected reader schema: the writer's fields ∩ the requested
      // columns, writer types kept. Schema resolution matches by NAME,
      // so decode skips everything else; requested columns the writer
      // lacks resolve to slot -1 → null. `setExpected` swaps the
      // expected schema on the live reader — resolution is computed
      // lazily per record batch, so this is safe before the first
      // `next()`.
      val writerFields = requiredSchema.fields.flatMap(f => Option(writerSchema.getField(f.name)))
      val projected = Schema.createRecord(
        writerSchema.getName, null, writerSchema.getNamespace, false,
        writerFields.map(f => new Schema.Field(f.name, f.schema, null, f.defaultVal())).toList.asJava)
      datumReader.setExpected(projected)
      val fieldPos: Array[Int] =
        requiredSchema.fields.map(f => Option(projected.getField(f.name)).map(_.pos).getOrElse(-1))
      val converters: Array[AnyRef => Any] =
        requiredSchema.fields.map(f => converterFor(f.name, f.dataType, file.toPath.toString))
      reader.sync(file.start)
      val end = file.start + file.length
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => close()))
      new Iterator[InternalRow] {
        override def hasNext: Boolean = {
          if (closed) return false
          val h = reader.hasNext && !reader.pastSync(end)
          if (!h) close()
          h
        }
        override def next(): InternalRow = {
          val rec = reader.next()
          val vals = new Array[Any](fieldPos.length)
          var i = 0
          while (i < fieldPos.length) {
            vals(i) = if (fieldPos(i) < 0) null else {
              val v = rec.get(fieldPos(i))
              if (v == null) null else converters(i)(v)
            }
            i += 1
          }
          new GenericInternalRow(vals)
        }
      }
    } catch { case t: Throwable => close(); throw t }
  }

  /** [[toInternal]] with the mismatch case named: a writer whose
    * physical type disagrees with the catalog (e.g. long where the
    * catalog says int) must fail with the column and file in hand,
    * not a bare scala.MatchError three stack frames into a task.
    * try/catch costs nothing on the no-throw path, so this wraps the
    * per-value converter directly.
    */
  private def converterFor(colName: String, dt: DataType, filePath: String): AnyRef => Any = {
    val base = toInternal(dt)
    v =>
      try base(v)
      catch {
        case _: MatchError => throw new IllegalStateException(
          s"$filePath: column '$colName' is declared $dt in the catalog but this file's " +
            s"Avro writer stored a ${v.getClass.getName} ('$v') — writer/catalog schema " +
            "mismatch (only int->long and float->double widenings are supported)")
      }
  }

  /** Avro generic datum → Catalyst internal value for one column.
    * Widenings mirror the catalog-vs-writer tolerances of the old
    * row-level source (int→long, float→double).
    */
  private def toInternal(dt: DataType): AnyRef => Any = dt match {
    // only value classes Avro legitimately maps to STRING — Utf8/
    // String (CharSequence) and enum symbols (the canonical Avro-
    // enum-to-Hive-STRING mapping). A blanket toString would silently
    // stringify a mismatched writer type (long where the catalog says
    // string) instead of surfacing the named mismatch error like
    // every other column type.
    case StringType => {
      case s: CharSequence => UTF8String.fromString(s.toString)
      case e: org.apache.avro.generic.GenericEnumSymbol[_] =>
        UTF8String.fromString(e.toString)
    }
    case IntegerType => { case i: java.lang.Integer => i.intValue() }
    case LongType => {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue() // widen
    }
    case FloatType => { case f: java.lang.Float => f.floatValue() }
    case DoubleType => {
      case d: java.lang.Double => d.doubleValue()
      case f: java.lang.Float => f.doubleValue() // widen
    }
    case BooleanType => { case b: java.lang.Boolean => b.booleanValue() }
    case BinaryType => { case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    }
    case other => throw new UnsupportedOperationException(
      s"Avro type $other not supported by the offline Avro source")
  }
}
