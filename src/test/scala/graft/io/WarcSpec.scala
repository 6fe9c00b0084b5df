package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** WARC source: record framing, header parsing, HTTP head stripping,
  * response filtering, gzip member streams, and the pages projection
  * feeding the extraction kernel end-to-end.
  */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def record(tpe: String, uri: String, date: String,
      payload: Array[Byte]): Array[Byte] = {
    val head = s"WARC/1.0\r\nWARC-Type: $tpe\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"WARC-Date: $date\r\nContent-Length: ${payload.length}\r\n\r\n"
    head.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def httpResponse(html: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
      .getBytes("UTF-8")

  private val html1 = "<html><body><div class=\"doc\"><p>alpha beta</p></div></body></html>"
  private val html2 = "<html><body><p>gamma delta epsilon</p></body></html>"

  private def warcBytes: Array[Byte] =
    record("warcinfo", "", "2024-03-01T00:00:00Z",
        "software: test".getBytes("UTF-8")) ++
    record("request", "https://x.edu/a", "2024-03-01T10:00:00Z",
        "GET /a HTTP/1.1\r\n\r\n".getBytes("UTF-8")) ++
    record("response", "https://x.edu/a", "2024-03-01T10:00:00Z",
        httpResponse(html1)) ++
    record("response", "https://x.edu/b", "2024-03-02T11:30:00Z",
        httpResponse(html2))

  test("records: framing, headers, payload lengths") {
    val rs = Warc.records(
      new java.io.ByteArrayInputStream(warcBytes), gzipped = false).toSeq
    assert(rs.map(_.warcType) == Seq("warcinfo", "request", "response", "response"))
    assert(rs(2).targetUri.contains("https://x.edu/a"))
    assert(new String(Warc.httpBody(rs(2).payload), "UTF-8") == html1)
    // LF-only HTTP heads also strip
    assert(new String(Warc.httpBody(
      ("HTTP/1.1 200 OK\nX: y\n\nBODY").getBytes("UTF-8")), "UTF-8") == "BODY")
  }

  test("pages: response-only projection, date parsing, gzip; extraction runs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_test")
    java.nio.file.Files.write(dir.resolve("part-0.warc"), warcBytes)
    // gzipped variant of the same content in the same load path
    val gz = new java.io.ByteArrayOutputStream()
    val go = new java.util.zip.GZIPOutputStream(gz)
    go.write(warcBytes); go.close()
    java.nio.file.Files.write(dir.resolve("part-1.warc.gz"), gz.toByteArray)

    val pages = Warc.pages(spark, dir.toString + "/*").collect().sortBy(_.url)
    assert(pages.length == 4, "2 responses per file, request/warcinfo skipped")
    assert(pages.map(_.url).distinct.toSeq ==
      Seq("https://x.edu/a", "https://x.edu/b"))
    assert(pages.head.warc_ts ==
      java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T10:00:00Z")))
    assert(new String(pages.head.html, "UTF-8") == html1)

    // the WARC pages feed the real extraction kernel
    val sents = graft.spark.ExtractStage.sentences(spark,
      spark.createDataset(pages.toSeq.take(1)))
    val tkns = sents.collect().flatMap(_.tkns).toSeq
    assert(tkns == Seq("alpha", "beta"))

    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec)
      p.delete()
    }
    deleteRec(dir.toFile)
  }
}
