package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization as a native Catalyst expression — the hot-path
  * twin of [[graft.ops.Urls.canonicalize]]'s column composition. The
  * column version is the REFERENCE semantics (rule list in the Urls
  * scaladoc, pinned by the `doc_url_canonical` oracle), but it
  * evaluates the authority regex up to six times per row and its
  * higher-order param lambdas run interpreted; this expression makes
  * ONE pass over the string with zero regex evaluations, stays inside
  * whole-stage codegen, and is asserted byte-equal to the column
  * version over every edge case plus a component fuzz corpus
  * (UrlsSpec). Canonicalizing every url of a 10^12-page crawl is a
  * full-corpus pass — exactly the place the repo's native expressions
  * (simhash64, srp_sig, ...) exist for.
  *
  * NULL contract: NULL in -> NULL out, and a NON-null schemeless url
  * also canonicalizes to NULL (rule 8) — hence the custom codegen:
  * `defineCodeGen` would wrongly mark the result non-null for non-null
  * input.
  */
case class CanonicalUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canonical_url"

  override def nullSafeEval(input: Any): Any =
    CanonicalUrl.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      UTF8String ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.CanonicalUrl.canon(${c.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
}

object CanonicalUrl {

  /** Callable from generated code. */
  def canon(u: UTF8String): UTF8String = {
    if (u == null) return null
    val r = canonicalize(u.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  private def isSchemeStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isSchemeChar(c: Char): Boolean =
    isSchemeStart(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  // mirrors Spark's lower()/UTF8String.toLowerCase: byte-wise for
  // ASCII, java toLowerCase otherwise
  private def lower(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) {
      val out = new Array[Char](s.length)
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        out(j) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        j += 1
      }
      new String(out)
    } else s.toLowerCase
  }

  private def isTracking(p: String): Boolean =
    p.startsWith("utm_") || p == "fbclid" || p.startsWith("fbclid=") ||
      p == "gclid" || p.startsWith("gclid=")

  // array_sort on strings compares UTF8String bytes (unsigned),
  // NOT java's UTF-16 code units — they differ above the BMP
  private val utf8ByteOrder: java.util.Comparator[String] =
    (a: String, b: String) => {
      val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      var d = 0
      val n = math.min(ab.length, bb.length)
      while (d == 0 && i < n) {
        d = (ab(i) & 0xff) - (bb(i) & 0xff)
        i += 1
      }
      if (d != 0) d else ab.length - bb.length
    }

  /** One-pass replica of the rule list in `graft.ops.Urls` (see that
    * scaladoc); returns null for schemeless input.
    */
  def canonicalize(url: String): String = {
    // scheme: the anchored regex matches iff the prefix before the
    // FIRST "://" is a letter followed by scheme chars
    val sep = url.indexOf("://")
    if (sep <= 0) return null
    if (!isSchemeStart(url.charAt(0))) return null
    var i = 1
    while (i < sep) {
      if (!isSchemeChar(url.charAt(i))) return null
      i += 1
    }
    val scheme = lower(url.substring(0, sep))

    // authority: up to the first of / ? # (or end)
    var aEnd = sep + 3
    while (aEnd < url.length && url.charAt(aEnd) != '/' &&
      url.charAt(aEnd) != '?' && url.charAt(aEnd) != '#') aEnd += 1
    val authority = url.substring(sep + 3, aEnd)
    val hostPort = {
      val at = authority.lastIndexOf('@')
      if (at < 0) authority else authority.substring(at + 1)
    }
    val firstColon = hostPort.indexOf(':')
    val host = lower(if (firstColon < 0) hostPort
      else hostPort.substring(0, firstColon))
    val port = if (firstColon < 0) ""
      else hostPort.substring(hostPort.lastIndexOf(':') + 1)
    val portNorm =
      if (port.isEmpty || (scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443")) ""
      else ":" + port

    // path: from the authority end up to the first of ? # (or end)
    var pEnd = aEnd
    while (pEnd < url.length && url.charAt(pEnd) != '?' &&
      url.charAt(pEnd) != '#') pEnd += 1
    val rawPath = url.substring(aEnd, pEnd)
    val pathNorm = if (rawPath.isEmpty) "/" else rawPath

    // query: only when the first '?' precedes any '#'
    val qMark = url.indexOf('?')
    val hash = url.indexOf('#')
    val query =
      if (qMark < 0 || (hash >= 0 && hash < qMark)) ""
      else {
        val qEnd = url.indexOf('#', qMark + 1)
        url.substring(qMark + 1, if (qEnd < 0) url.length else qEnd)
      }
    val kept = query.split("&", -1)
      .filter(p => p.nonEmpty && !isTracking(p))
    java.util.Arrays.sort(kept, utf8ByteOrder)
    val queryNorm = if (kept.isEmpty) "" else "?" + kept.mkString("&")

    scheme + "://" + host + portNorm + pathNorm + queryNorm
  }
}
