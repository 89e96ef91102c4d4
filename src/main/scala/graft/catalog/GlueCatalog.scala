package graft.catalog

import graft.model.{GlueTable, PartitionInfo}

/** AWS Glue-backed catalog — the production implementation slot for
  * [[CatalogProvider]] (reference: src/util/glue.ts:21-50, 105-134:
  * `GetTable` + paginated `GetPartitions`).
  *
  * The AWS SDK is not part of this offline build's jar set, so this
  * class documents the contract and fails fast; swapping in the SDK
  * implementation touches only this file:
  *  - `getTable` ⇒ `GlueClient.getTable(db, tbl)` mapped onto
  *    [[GlueTable]] (Location from StorageDescriptor; Parameters
  *    verbatim), "Table db.tbl not found" when absent.
  *  - `getPartitions` ⇒ paginated `getPartitions` (the reference
  *    forgets pagination — src/util/glue.ts:114 — we specify it),
  *    non-fatal on failure.
  * Retry/backoff/bail and caching live in the engine layer and apply
  * to any provider.
  */
final class GlueCatalog(region: String = "eu-west-1") extends CatalogProvider {
  private def unavailable =
    throw new UnsupportedOperationException(
      "AWS Glue SDK is not available in this offline build; " +
        "use FixtureCatalog or provide a CatalogProvider backed by the AWS SDK v2")

  override def getTable(database: String, table: String): GlueTable = unavailable
  override def getPartitions(database: String, table: String): Seq[PartitionInfo] = unavailable
}
