package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Narrow table-access seam (SURVEY.md §1.2).
  *
  * In this sandbox every table is a Parquet file under a scale-factor
  * directory; in production the same names resolve through an Iceberg
  * catalog (`spark.read.table("db.pages")`) — only this object changes.
  * Keeping the seam narrow means predicate pushdown / column pruning /
  * partition pruning all flow through `spark.read.parquet` (or the
  * catalog) untouched.
  */
object Tables {
  /** Read a named table from a scale-factor directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
