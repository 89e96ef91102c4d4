package graft

import graft.catalog.FixtureCatalog
import graft.engine.GlueTableEngine
import graft.fixtures.TestFixtures
import graft.model.{ColumnDef, GlueTable}
import org.scalatest.funsuite.AnyFunSuite

/** Split semantics of the offline Avro `FileFormat`: Avro's 16-byte
  * sync markers make files splittable, so a scan planned with a small
  * `maxPartitionBytes` must fan one file out across MANY tasks and
  * still read every record exactly once (an off-by-one in the
  * `sync`/`pastSync` window double-reads or drops a block).
  */
class AvroFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("one avro file fans out into many splits and reads exactly once") {
    val cat = new FixtureCatalog()
    cat.register(GlueTable("default", "avro_split",
      Some(TestFixtures.ordersAvroPartitioned(spark, TestSpark.sfDir)),
      partitionKeys = Seq(ColumnDef("st")),
      parameters = Map("classification" -> "avro")))
    val eng = new GlueTableEngine(spark, cat)
    val want = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try {
      val df = eng.query("SELECT o_orderkey FROM glue.default.avro_split")
      assert(df.rdd.getNumPartitions > 3, s"expected many splits, got ${df.rdd.getNumPartitions}")
      val got = df.collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want) // no dropped or double-read blocks
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("writer/catalog physical-type mismatch fails with column and file named") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = new java.io.File("target/fixtures/avro_mismatch")
    dir.mkdirs()
    val schema = SchemaBuilder.record("r").fields().requiredLong("k").endRecord()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-0.avro"))
    try {
      val rec = new GenericData.Record(schema); rec.put("k", 7L); w.append(rec)
    } finally w.close()

    val cat = new FixtureCatalog()
    cat.register(GlueTable("default", "avro_mismatch", Some(dir.getAbsolutePath),
      columns = Seq(ColumnDef("k", "int")), // catalog lies: writer stored long
      parameters = Map("classification" -> "avro")))
    val eng = new GlueTableEngine(spark, cat)
    val e = intercept[Exception] {
      eng.query("SELECT k FROM glue.default.avro_mismatch").collect()
    }
    // the task failure must surface the named IllegalStateException,
    // not a bare scala.MatchError
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => s"${t.getClass.getName}: ${t.getMessage}").mkString("\n")
    assert(msgs.contains("column 'k'"), msgs)
    assert(msgs.contains("part-0.avro"), msgs)
    assert(msgs.contains("mismatch"), msgs)
    assert(!msgs.contains("scala.MatchError"), msgs)
  }

  test("string column with a non-string writer type fails loudly, not via toString") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = new java.io.File("target/fixtures/avro_str_mismatch")
    dir.mkdirs()
    val schema = SchemaBuilder.record("r").fields().requiredLong("s").endRecord()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-0.avro"))
    try {
      val rec = new GenericData.Record(schema); rec.put("s", 7L); w.append(rec)
    } finally w.close()

    val cat = new FixtureCatalog()
    cat.register(GlueTable("default", "avro_str_mismatch", Some(dir.getAbsolutePath),
      columns = Seq(ColumnDef("s", "string")), // catalog lies: writer stored long
      parameters = Map("classification" -> "avro")))
    val eng = new GlueTableEngine(spark, cat)
    val e = intercept[Exception] {
      eng.query("SELECT s FROM glue.default.avro_str_mismatch").collect()
    }
    // a blanket toString would silently return "7" — the mismatch
    // must be named for string targets exactly like numeric ones
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => s"${t.getClass.getName}: ${t.getMessage}").mkString("\n")
    assert(msgs.contains("column 's'"), msgs)
    assert(msgs.contains("mismatch"), msgs)
  }

  test("Avro enum columns read as their catalog-declared string type") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = new java.io.File("target/fixtures/avro_enum")
    dir.mkdirs()
    val schema = SchemaBuilder.record("r").fields()
      .name("st").`type`().enumeration("status").symbols("OPEN", "CLOSED").noDefault()
      .endRecord()
    val enumSchema = schema.getField("st").schema()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-0.avro"))
    try {
      Seq("OPEN", "CLOSED", "OPEN").foreach { s =>
        val rec = new GenericData.Record(schema)
        rec.put("st", new GenericData.EnumSymbol(enumSchema, s))
        w.append(rec)
      }
    } finally w.close()

    val cat = new FixtureCatalog()
    cat.register(GlueTable("default", "avro_enum", Some(dir.getAbsolutePath),
      columns = Seq(ColumnDef("st", "string")), // canonical enum -> STRING mapping
      parameters = Map("classification" -> "avro")))
    val eng = new GlueTableEngine(spark, cat)
    val got = eng.query("SELECT st FROM glue.default.avro_enum")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("OPEN", "CLOSED", "OPEN"))
  }
}
