package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Narrow table-access seam (SURVEY.md §1.2).
  *
  * In this sandbox every table is a Parquet file under a scale-factor
  * directory; in production the same names resolve through a catalog
  * (Iceberg via `spark.sql.catalog.*` — no Iceberg runtime jar ships in
  * this zero-egress image, so the catalog path is exercised against the
  * built-in session catalog in TablesSpec). Keeping the seam narrow
  * means predicate pushdown / column pruning / partition pruning all
  * flow through `spark.read.parquet` (or the catalog) untouched.
  */
object Tables {

  /** Catalog-backed location: `catalog:<namespace>` resolves tables as
    * `spark.read.table("<namespace>.<name>")` — with an Iceberg catalog
    * configured (`spark.sql.catalog.ice=org.apache.iceberg.spark
    * .SparkCatalog`), `catalog:ice.db` reads Iceberg tables with no
    * engine change.
    */
  val CatalogPrefix = "catalog:"

  /** Read a named table from a scale-factor directory or a catalog
    * namespace.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (dir.startsWith(CatalogPrefix))
      spark.read.table(s"${dir.stripPrefix(CatalogPrefix)}.$name")
    else
      spark.read.parquet(s"$dir/$name.parquet")
}
