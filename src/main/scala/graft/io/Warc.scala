package graft.io

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.spark.Page

/** WARC source for Common-Crawl-style corpora: `WARC/1.0` record
  * parsing (headers + Content-Length payload), HTTP header stripping
  * for `response` records, and projection to the engine's `pages`
  * schema (url, warc_ts, html, text, lang).
  *
  * Parallelism model: one task per WARC file via Spark's `binaryFile`
  * source — exactly Common Crawl's layout (a crawl is ~64k independent
  * ~1 GB WARC files per segment), so a 100 TB crawl parallelizes to
  * ~64k narrow tasks with no shuffle. Records inside one file are
  * parsed streaming (gzip members decode transparently: Common Crawl
  * gzips per record, and `GZIPInputStream` reads concatenated members),
  * so memory per task is O(largest record), not O(file).
  */
object Warc {

  final case class Record(headers: Map[String, String], payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.get(name.toLowerCase(java.util.Locale.ROOT))
    def warcType: String = header("WARC-Type").getOrElse("")
    def targetUri: Option[String] = header("WARC-Target-URI")
    def date: Option[String] = header("WARC-Date")
  }

  /** Read one CRLF (or LF) terminated header line; None at EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    Some(sb.toString)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"WARC payload truncated at $off/$n")
      off += r
    }
    buf
  }

  /** Streaming record iterator over a (possibly gzipped) WARC stream. */
  def records(raw: InputStream, gzipped: Boolean): Iterator[Record] = {
    val in = new BufferedInputStream(
      if (gzipped) new GZIPInputStream(raw) else raw, 1 << 16)
    new Iterator[Record] {
      private var nextRec: Option[Record] = advance()

      private def advance(): Option[Record] = {
        // skip inter-record blank lines to the version line
        var line = readLine(in)
        while (line.exists(l => l.isEmpty)) line = readLine(in)
        line match {
          case None => None
          case Some(v) if v.startsWith("WARC/") =>
            val headers = Map.newBuilder[String, String]
            var h = readLine(in)
            while (h.exists(_.nonEmpty)) {
              val l = h.get
              val i = l.indexOf(':')
              if (i > 0) headers +=
                l.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT) ->
                  l.substring(i + 1).trim
              h = readLine(in)
            }
            val hm = headers.result()
            val len = hm.getOrElse("content-length", "0").toInt
            Some(Record(hm, readFully(in, len)))
          case Some(other) =>
            throw new IllegalArgumentException(
              s"not a WARC record boundary: '$other'")
        }
      }

      override def hasNext: Boolean = nextRec.isDefined
      override def next(): Record = {
        val r = nextRec.getOrElse(throw new NoSuchElementException)
        nextRec = advance()
        r
      }
    }
  }

  /** Strip the HTTP response head from a `response` record payload;
    * returns the body (the HTML bytes).
    */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    // find \r\n\r\n (or \n\n) separating HTTP headers from the body
    var i = 0
    while (i < payload.length) {
      if (payload(i) == '\n') {
        val atCrlfCrlf = i >= 3 && payload(i - 1) == '\r' &&
          payload(i - 2) == '\n' && payload(i - 3) == '\r'
        val atLfLf = i >= 1 && payload(i - 1) == '\n'
        if (atCrlfCrlf || atLfLf)
          return java.util.Arrays.copyOfRange(payload, i + 1, payload.length)
      }
      i += 1
    }
    payload // no HTTP head found: treat the whole payload as the body
  }

  /** WARC-Date (ISO-8601) to Timestamp; epoch on absence/parse failure
    * (a malformed date must not kill a 100 TB scan).
    */
  def parseDate(iso: Option[String]): java.sql.Timestamp =
    try java.sql.Timestamp.from(java.time.Instant.parse(iso.getOrElse("")))
    catch { case _: Throwable => new java.sql.Timestamp(0L) }

  /** `pages` table from WARC files: response records only, HTTP head
    * stripped, projected to the engine schema. `text`/`lang` stay empty
    * — they are products of the extraction pipeline, not the crawl.
    */
  def pages(spark: SparkSession, path: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (file, bytes) =>
        val gz = file.endsWith(".gz")
        records(new java.io.ByteArrayInputStream(bytes), gz)
          .filter(_.warcType == "response")
          .flatMap { r =>
            r.targetUri.map { uri =>
              Page(uri, parseDate(r.date), httpBody(r.payload), "", "")
            }
          }
      })
  }
}
