package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Real javax.imageio decode path: lossless PNG/BMP roundtrips with
  * closed-form pixel sums, error surfacing for corrupt/empty payloads,
  * and the distributed decodeImage kernel over a mixed media frame.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Closed-form sum of ((seed*31 + 7x + 13y) mod 256) over the image. */
  private def expectedSum(seed: Long, w: Int, h: Int): Long = {
    var s = 0L
    for (y <- 0 until h; x <- 0 until w)
      s += (seed * 31 + x * 7 + y * 13) % 256
    s
  }

  test("PNG roundtrip: dimensions, bands, format, exact pixel sum") {
    val bytes = Multimodal.syntheticImage(seed = 42L, w = 5, h = 4, "png")
    val d = Multimodal.decodeImageOne(7L, bytes)
    assert(d.status == "ok")
    assert(d.format == "png")
    assert((d.width, d.height, d.bands) == ((5, 4, 1)))
    assert(d.pixel_sum == expectedSum(42L, 5, 4))
  }

  test("BMP roundtrip: a second lossless JDK codec decodes exactly") {
    val bytes = Multimodal.syntheticImage(seed = 9L, w = 8, h = 3, "bmp")
    val d = Multimodal.decodeImageOne(1L, bytes)
    assert(d.status == "ok")
    assert(d.format == "bmp")
    assert((d.width, d.height, d.bands) == ((8, 3, 1)))
    assert(d.pixel_sum == expectedSum(9L, 8, 3))
  }

  test("corrupt, truncated, and empty payloads surface as error rows") {
    // not an image at all
    assert(Multimodal.decodeImageOne(1L, "not an image".getBytes).status == "error")
    // a real PNG truncated mid-stream: reader registered, read(0) fails
    val png = Multimodal.syntheticImage(3L, 6, 6, "png")
    assert(Multimodal.decodeImageOne(2L, png.take(20)).status == "error")
    // empty / null payloads
    assert(Multimodal.decodeImageOne(3L, Array.emptyByteArray).status == "error")
    assert(Multimodal.decodeImageOne(4L, null).status == "error")
  }

  test("decodeImage kernel: mixed good/broken media, one row each") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.syntheticImage(1L, 4, 4, "png")),
      (2L, Multimodal.syntheticImage(2L, 3, 7, "bmp")),
      (3L, "garbage".getBytes),
      (4L, Array.emptyByteArray))
    val media = rows.toDF("media_id", "media").repartition(3)
    val out = Multimodal.decodeImage(spark, media, batchSize = 2)
      .collect().map(d => d.media_id -> d).toMap
    assert(out.size == 4)
    assert(out(1L).status == "ok" && out(1L).format == "png" &&
      out(1L).pixel_sum == expectedSum(1L, 4, 4))
    assert(out(2L).status == "ok" && out(2L).format == "bmp" &&
      out(2L).pixel_sum == expectedSum(2L, 3, 7))
    assert(out(3L).status == "error" && out(4L).status == "error")
  }
}
