package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** NumPy-written golden for the .npy/.npz codec: the assets come from
  * `tools/gen_npy_golden.py` (np.savez_compressed +
  * np.lib.format.write_array), so the Scala reader is pinned to the
  * real producer's bytes — dtypes, C/Fortran order, compressed zip
  * members, and the v2.0 uint32 header — not to its own round-trip.
  */
class NpyGoldenSpec extends AnyFunSuite {

  private def resPath(name: String): String = {
    val url = getClass.getResource("/" + name)
    require(url != null, s"$name missing from test resources")
    new java.io.File(url.toURI).getAbsolutePath
  }

  private lazy val npz = Npy.readNpz(resPath("npy_golden.npz"))

  test("float32 C-order matrix reads exactly") {
    val a = npz("embeddings")
    assert(a.descr == "<f4" && !a.fortranOrder)
    assert(a.shape.toSeq == Seq(5, 3))
    val m = a.toMatrixF
    for (r <- 0 until 5; c <- 0 until 3)
      assert(m(r)(c) == (r * 3 + c) * 0.25f - 1.5f)
  }

  test("float64 FORTRAN-order matrix reads in logical row-major") {
    val a = npz("f8_fortran")
    assert(a.descr == "<f8" && a.fortranOrder)
    val m = a.toMatrixD
    for (r <- 0 until 3; c <- 0 until 4)
      assert(m(r)(c) == (r * 4 + c) * 0.125 - 1.0)
  }

  test("int64 / int32 / uint8 / bool members read exactly") {
    val v = npz("i8_vec").toVectorD
    for (i <- 0 until 7) assert(v(i) == math.pow(i, 3) - 50)
    val m = npz("i4_mat").toMatrixD
    for (r <- 0 until 2; c <- 0 until 3)
      assert(m(r)(c) == (r * 3 + c) * 1000 - 2500)
    val u = npz("u1_vec").toVectorD
    for (i <- 0 until 9) assert(u(i) == (i * 37) % 256)
    val b = npz("b1_vec").toVectorD
    for (i <- 0 until 5) assert(b(i) == i % 2)
  }

  test("v2.0 header (uint32 length) parses") {
    val in = new java.io.FileInputStream(resPath("npy_v2_golden.npy"))
    val a = try Npy.readNpy(in) finally in.close()
    assert(a.shape.toSeq == Seq(5, 3))
    assert(a.toMatrixF(4)(2) == 14 * 0.25f - 1.5f)
  }

  test("embeddingMatrix: reference vstack semantics — one zero OOV row below") {
    val m = Npy.embeddingMatrix(resPath("npy_golden.npz"), vocabSize = 5)
    assert(m.length == 6, "vocab rows + 1 OOV row")
    assert(m(5).forall(_ == 0f) && m(5).length == 3)
    assert(m(2)(1) == 7 * 0.25f - 1.5f)
    val e = intercept[IllegalArgumentException] {
      Npy.embeddingMatrix(resPath("npy_golden.npz"), vocabSize = 99)
    }
    assert(e.getMessage.contains("vocab size"))
    val e2 = intercept[IllegalArgumentException] {
      Npy.embeddingMatrix(resPath("npy_golden.npz"), key = "nope")
    }
    assert(e2.getMessage.contains("no 'nope' member"))
  }
}
