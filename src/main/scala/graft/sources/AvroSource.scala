package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro schema utilities for the offline (no `spark-avro`) read
  * path. The data read itself is
  * `org.apache.spark.sql.graft.GraftAvroFileFormat` — a real
  * `FileFormat` planned through the engine's `PreListedFileIndex`
  * like every other source (splittable via sync markers, partition
  * columns from the index, column pruning via a projected reader
  * schema). This object keeps the driver-side, metadata-only schema
  * mapping: one file's embedded writer schema → `StructType`.
  * Mirrors the reference's `read_avro` DuckDB extension surface
  * (reference: src/util/iceberg.ts:30-33 uses it for manifests; the
  * engine's `classification=avro` tables extend that to DATA files).
  */
object AvroSource {

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
}
