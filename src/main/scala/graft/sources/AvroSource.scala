package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** Distributed Avro source without `spark-avro` (absent from the
  * offline jar set) — plain `org.apache.avro` (which Spark ships)
  * driven from `mapPartitions`, the documented last-resort tier when
  * no built-in operator can express the semantics. Mirrors the
  * reference's `read_avro` DuckDB extension surface (reference:
  * src/util/iceberg.ts:30-33 uses it for manifests; the engine's
  * `classification=avro` tables extend that to DATA files).
  *
  * Scale shape: one task per file (the same unit DuckDB's read_avro
  * and Hive's non-splittable codecs use); records stream off
  * `FsInput` (works for file:// and s3a:// alike) and convert to
  * rows lazily — no whole-file buffering. Schema is either the
  * catalog's declared columns or the FIRST file's embedded writer
  * schema (one KB-scale metadata read, no data scan).
  */
object AvroSource {

  /** Read `paths` as `schema`-shaped rows, one task per file. */
  def read(spark: SparkSession, paths: Seq[String], schema: StructType): DataFrame = {
    val sc = Shim.classic(spark).sparkContext
    val bc = sc.broadcast(new SerializableConfiguration(sc.hadoopConfiguration))
    val parallelism = math.max(1, math.min(paths.size, sc.defaultParallelism))
    val rdd = sc.parallelize(paths, parallelism).mapPartitions { it =>
      it.flatMap(p => readFile(bc.value.value, p, schema))
    }
    Shim.classic(spark).createDataFrame(rdd, schema)
  }

  /** StructType from the embedded writer schema of one Avro file —
    * driver-side, metadata-only.
    */
  def inferSchema(conf: Configuration, path: String): StructType = {
    val reader = new DataFileReader[GenericRecord](
      new FsInput(new Path(path), conf), new GenericDatumReader[GenericRecord]())
    try toStruct(reader.getSchema) finally reader.close()
  }

  private def toStruct(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"expected an Avro record schema, got ${s.getType}")
    StructType(s.getFields.asScala.map { f =>
      StructField(f.name(), toSparkType(f.schema()), nullable = true)
    }.toSeq)
  }

  private def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING  => StringType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.UNION =>
      // the common nullable pattern: union(null, T) → T
      val nonNull = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported Avro union $s")
      toSparkType(nonNull.head)
    case other => throw new UnsupportedOperationException(
      s"Avro type $other not supported by the offline Avro source")
  }

  /** Lazily stream one file's records as rows. The reader closes when
    * the iterator drains AND on task completion (a `LIMIT`-style
    * early abort or task failure otherwise leaks the `FsInput` fd /
    * S3 stream until GC in a long-lived executor).
    *
    * Requested columns resolve against the file's WRITER schema by
    * position, once per file: a catalog-declared column absent from a
    * file yields null for that file's rows — `GenericRecord
    * .get(String)` would instead throw `AvroRuntimeException` on the
    * first row (the round-5 Iceberg-manifest bug class).
    */
  private def readFile(conf: Configuration, path: String, schema: StructType): Iterator[Row] = {
    val reader = new DataFileReader[GenericRecord](
      new FsInput(new Path(path), conf), new GenericDatumReader[GenericRecord]())
    val writerSchema = reader.getSchema
    require(writerSchema.getType == Schema.Type.RECORD,
      s"$path: expected an Avro record writer schema, got ${writerSchema.getType}")
    val fieldPos: Array[Int] =
      schema.fields.map(f => Option(writerSchema.getField(f.name)).map(_.pos).getOrElse(-1))
    var closed = false
    def close(): Unit = if (!closed) { closed = true; reader.close() }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => close()))
    new Iterator[Row] {
      override def hasNext: Boolean = {
        if (closed) return false
        val h = reader.hasNext
        if (!h) close()
        h
      }
      override def next(): Row = {
        val rec = reader.next()
        Row.fromSeq(schema.fields.indices.map { i =>
          if (fieldPos(i) < 0) null
          else convert(rec.get(fieldPos(i)), schema.fields(i).dataType)
        })
      }
    }
  }

  private def convert(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s, StringType) => s.toString // Utf8 → String
    case (i: java.lang.Integer, IntegerType) => i.intValue()
    case (i: java.lang.Integer, LongType)    => i.longValue() // widen
    case (l: java.lang.Long, LongType)       => l.longValue()
    case (f: java.lang.Float, FloatType)     => f.floatValue()
    case (f: java.lang.Float, DoubleType)    => f.doubleValue() // widen
    case (d: java.lang.Double, DoubleType)   => d.doubleValue()
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (other, t) => throw new IllegalArgumentException(
      s"cannot convert Avro value of ${other.getClass} to $t")
  }
}
