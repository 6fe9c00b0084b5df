package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Robustness: the extraction kernel must terminate (and not throw)
  * on adversarial/garbage markup — unclosed quotes and tags, orphan
  * '&'/'<', deep nesting, long attributes.
  */
class FuzzSpec extends AnyFunSuite {

  val pieces: Array[String] = Array(
    "<div>", "</div>", "<p class=\"a b\">", "<br>", "<br/>", "</br>",
    "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
    "<!doctype html>", "<![CDATA[", "]]>", "<?php ?>", "</>", "<a href='",
    "'>", "\"", "'", "&amp;", "&#151;", "&bogus;", "&#x", "&", "<", ">",
    "text here ", "José Ørsted ", "名字 ", " ",
    "\n", "  ", "=", "<td>", "<table>", "</table>", "<a b=c d='e",
    "<a b=\"unclosed", "<x ", "y=z,,,  ", "/", "//>", "Dr. Smith, Ph.D. ")

  test("random garbage markup never crashes or hangs the kernel") {
    val rng = new Random(2026)
    for (trial <- 0 until 300) {
      val n = 1 + rng.nextInt(120)
      val html = (0 until n).map(_ => pieces(rng.nextInt(pieces.length))).mkString
      val t0 = System.nanoTime()
      val sents = Extractor.tokenize(html)
      assert((System.nanoTime() - t0) < 5e9, s"trial $trial too slow")
      sents.flatten.foreach { t =>
        assert(t.features.length == 13)
        assert(t.features.forall(_ != null))
      }
    }
  }

  test("moderately deep nesting works (stage guard handles the extreme)") {
    val html = "<div>" * 2000 + "x" + "</div>" * 2000
    val sents = Extractor.tokenize(html)
    assert(sents.flatten.map(_.tkn) == Seq("x"))
  }

  test("pathological attribute and quote spans terminate") {
    val big = "a" * 200000
    assert(Extractor.tokenize(s"<p x='$big'>y</p>").flatten.nonEmpty)
    Extractor.tokenize(s"<p x='unclosed $big>y") // must terminate
    assert(Extractor.tokenize("<p " + "a=b " * 5000 + ">z</p>")
      .flatten.map(_.tkn).contains("z"))
  }
}
