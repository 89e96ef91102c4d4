package graft

import graft.model._
import graft.prune.Extractors
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's glue-util unit layer (reference:
  * test/util.glue.test.ts:21-341): classification, projection
  * parsing, extractor shape, name mangling.
  */
class ModelSpec extends AnyFunSuite {

  private def tbl(params: Map[String, String] = Map.empty, keys: Seq[String] = Nil) =
    GlueTable("db", "t", Some("s3://b/p/"), keys.map(ColumnDef(_)), params)

  test("classifier: ICEBERG parameter wins") {
    assert(TableClassifier.classify(tbl(Map("table_type" -> "ICEBERG"))) == TableType.Iceberg)
    assert(TableClassifier.classify(tbl(Map("table_type" -> "iceberg"))) == TableType.Iceberg)
  }

  test("classifier: projection.enabled -> GlueProjected") {
    assert(TableClassifier.classify(tbl(Map("projection.enabled" -> "true"), Seq("dt"))) ==
      TableType.GlueProjected)
  }

  test("classifier: partition keys -> Hive; else Unpartitioned") {
    assert(TableClassifier.classify(tbl(keys = Seq("year"))) == TableType.Hive)
    assert(TableClassifier.classify(tbl()) == TableType.Unpartitioned)
  }

  test("projection parser: date with JSON range (reference test/util.glue.test.ts:38-61)") {
    val p = ProjectionParser.parse(Map(
      "projection.enabled" -> "true",
      "projection.dt.type" -> "date",
      "projection.dt.format" -> "yyyy-MM-dd",
      "projection.dt.range" -> "[\"2024-01-01\",\"2024-12-31\"]"))
    assert(p("dt") == ProjectionPattern("date", Some("yyyy-MM-dd"),
      Seq("2024-01-01", "2024-12-31"), Nil))
  }

  test("projection parser: comma-separated and JSON-number ranges") {
    assert(ProjectionParser.parseListValue("2020,2021,2022") == Seq("2020", "2021", "2022"))
    assert(ProjectionParser.parseListValue("[2020,2021,2022]") == Seq("2020", "2021", "2022"))
    assert(ProjectionParser.parseListValue("[\"books\",\"movies\"]") == Seq("books", "movies"))
  }

  test("date format to regex (reference src/util/glue.ts:177-193)") {
    assert(Extractors.convertDateFormatToRegex("yyyy-MM-dd") == raw"\d{4}-\d{2}-\d{2}")
    assert(Extractors.convertDateFormatToRegex("yyyy/MM/dd HH") == raw"\d{4}/\d{2}/\d{2} \d{2}")
  }

  test("injected projection throws (reference src/util/glue.ts:163-166)") {
    val meta = CachedTableMetadata(0L, TableType.GlueProjected,
      tbl(Map("projection.enabled" -> "true", "projection.id.type" -> "injected"), Seq("id")),
      projectionPatterns = Some(Map("id" -> ProjectionPattern("injected"))))
    val e = intercept[UnsupportedOperationException](Extractors.forKey(meta, "id"))
    assert(e.getMessage.contains("not supported yet"))
  }

  test("name mangling strips hyphens (reference src/sql-transformer.ts:283-293)") {
    assert(Naming.viewName("my-db", "my-table") == "GLUE__mydb_mytable")
    assert(Naming.filesVarName("mydb", "mytable") == "mydb_mytable_files")
    assert(Naming.gviewFilesVarName("a-b", "c") == "ab_c_gview_files")
  }
}
