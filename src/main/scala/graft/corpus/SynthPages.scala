package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.Page

/** Deterministic `pages` table synthesized from the driver's `documents`
  * table (TESTDATA.md): each document is wrapped in a fixed HTML skeleton
  * (title + classed div + p), so the extraction kernel's output over the
  * body block is exactly the whitespace tokenization of `text` — which
  * makes the full kernel DuckDB-oracle-checkable.
  */
object SynthPages {

  def htmlOf(docId: Long, text: String): String =
    s"""<html><head><title>doc $docId</title></head>""" +
    s"""<body><div class="doc"><p>$text</p></div></body></html>"""

  def fromDocuments(spark: SparkSession, documents: DataFrame): Dataset[Page] = {
    import spark.implicits._
    // scan-parallelism floor (graft.spark.Scans): the downstream
    // extraction kernel is a narrow map over these pages, so a
    // single-split documents scan would run the whole HTML parse on
    // one task; no-op whenever the scan is already well-split
    graft.spark.Scans.spread(documents, col("doc_id")).select(
        concat(lit("doc://"), col("source"), lit("/"), col("doc_id")).as("url"),
        to_timestamp(lit("2024-01-01 00:00:00"))
          .plus(expr("make_interval(0, 0, 0, 0, 0, 0, doc_id)")).as("warc_ts"),
        col("doc_id"), col("text"), col("lang"))
      .map { r =>
        Page(
          url = r.getString(0),
          warc_ts = r.getTimestamp(1),
          html = htmlOf(r.getLong(2), r.getString(3))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          text = r.getString(3),
          lang = r.getString(4))
      }
  }
}
