package graft.catalog

import graft.model._

/** Catalog abstraction over "where do table definitions come from".
  *
  * The reference fetches them from AWS Glue (`GetTable` /
  * `GetPartitions`, reference: src/util/glue.ts:21-50, 105-134). In
  * this offline build the AWS SDK is unavailable, so the I/O goes
  * behind this trait: `FixtureCatalog` serves in-memory definitions
  * (mirroring the reference's mocked-SDK unit-test strategy,
  * reference: test/glue-table-cache.test.ts:118-146), and a real
  * `GlueCatalog` would implement the same trait with the AWS SDK.
  */
trait CatalogProvider {

  /** Fetch a table definition.
    * @throws NoSuchElementException "Table db.tbl not found" when the
    *         table does not exist (reference: src/util/glue.ts:30).
    */
  def getTable(database: String, table: String): GlueTable

  /** Partition list for Hive tables. A failure here is non-fatal in
    * the reference (→ empty metadata, reference:
    * test/util.glue.test.ts:100-114); implementations should return
    * empty rather than throw for "no partitions registered".
    */
  def getPartitions(database: String, table: String): Seq[PartitionInfo] = Nil
}

/** In-memory catalog for tests and the local-fixture harness. */
final class FixtureCatalog extends CatalogProvider {
  private val tables = scala.collection.concurrent.TrieMap.empty[(String, String), GlueTable]
  private val partitions = scala.collection.concurrent.TrieMap.empty[(String, String), Seq[PartitionInfo]]
  // Counts every getTable call so cache/single-flight behavior is testable
  // (mirrors the reference's mocked-SDK call-count assertions,
  // reference: test/glue-table-cache.test.ts:266-298).
  val fetchCount = new java.util.concurrent.atomic.AtomicInteger(0)

  def register(t: GlueTable, parts: Seq[PartitionInfo] = Nil): this.type = {
    tables.put((t.database, t.name), t)
    if (parts.nonEmpty) partitions.put((t.database, t.name), parts)
    this
  }

  override def getTable(database: String, table: String): GlueTable = {
    fetchCount.incrementAndGet()
    tables.getOrElse((database, table),
      throw new NoSuchElementException(s"Table $database.$table not found"))
  }

  override def getPartitions(database: String, table: String): Seq[PartitionInfo] =
    partitions.getOrElse((database, table), Nil)
}
