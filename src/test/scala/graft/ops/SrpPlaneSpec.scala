package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Regression gate for the SRP hyperplane generator: the unfinalized
  * FNV-1a planes were pairwise-correlated at exactly ±1 (one effective
  * hyperplane — bucket count saturated near 20 at any nBits, turning
  * the "bucketed" ANN path quadratic). These tests pin the two
  * properties the scale law actually needs: near-orthogonal plane
  * rows, and bucket occupancy that multiplies with nBits on spread
  * data.
  */
class SrpPlaneSpec extends AnyFunSuite {

  private def corr(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length
    val ma = a.sum / n; val mb = b.sum / n
    val cov = a.indices.map(i => (a(i) - ma) * (b(i) - mb)).sum
    val va = a.map(x => (x - ma) * (x - ma)).sum
    val vb = b.map(x => (x - mb) * (x - mb)).sum
    cov / math.sqrt(va * vb)
  }

  test("plane rows are pairwise near-orthogonal (the ±1-correlation bug stays dead)") {
    val p = Similarity.srpPlanes(12, 64)
    for (i <- p.indices; j <- (i + 1) until p.length) {
      val c = math.abs(corr(p(i), p(j)))
      assert(c < 0.5, f"planes $i,$j correlate at $c%.3f — generator degeneracy")
    }
    // components span both signs with roughly balanced mass
    val flat = p.flatten
    val pos = flat.count(_ > 0).toDouble / flat.length
    assert(pos > 0.35 && pos < 0.65, f"sign balance $pos%.3f")
  }

  test("bucket occupancy multiplies with nBits on spread vectors") {
    // 4096 deterministic pseudo-random vectors (splitmix stream)
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val vecs = (0 until 4096).map { id =>
      Array.tabulate(64)(d =>
        ((math.abs(mix(id.toLong * 64 + d)) % 1000) / 1000.0f - 0.5f)).toSeq
    }
    def occupancy(nBits: Int): Int =
      vecs.map(v => Similarity.srpSignature(v, nBits)).distinct.size
    val o4 = occupancy(4)
    val o8 = occupancy(8)
    // independent-ish bits: 4 bits fill most of 16 buckets; 8 bits
    // reach well beyond the ~20-bucket ceiling of the broken planes
    assert(o4 >= 12, s"4-bit occupancy $o4 of 16")
    assert(o8 >= 150, s"8-bit occupancy $o8 of 256 — saturation regression")
    // max bucket at 8 bits stays near uniform (16/bucket expected)
    val counts = vecs.groupBy(v => Similarity.srpSignature(v, 8))
      .values.map(_.size)
    assert(counts.max < 4096 / 16,
      s"hot bucket ${counts.max} of 4096 at 8 bits — occupancy not flat")
  }
}
