package graft.io

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** Pure-JVM reader for NumPy's public `.npy`/`.npz` container formats
  * (format spec: numpy/lib/format.py docstring, "NEP 1") — the codec
  * the reference's embedding path actually uses on disk:
  * `models/word_embeddings.py:24` does `np.load(glove_file)
  * ['embeddings']` on an `.npz`, and `models/model.py:32` points
  * `word2vec.npz` at the same loader. (Those blobs are absent from the
  * reference checkout — `.MISSING_LARGE_BLOBS` — so the importer is
  * pinned to a NumPy-written golden instead: NpyGoldenSpec.)
  *
  * Supported: v1.0/2.0/3.0 headers, little-endian `<f4 <f8 <i4 <i8`
  * and 1-byte `|i1 |u1 |b1`, C or Fortran order, 1-D and 2-D shapes.
  * That covers every array a word-embedding/weights blob contains;
  * anything else fails fast with the offending descr in the message.
  *
  * Scale note: model artifacts (vocab x dim matrices) load on the
  * DRIVER and broadcast — same bounded-model contract as the GloVe
  * text importer and the BiLSTM weights IO, never a per-row executor
  * path.
  */
object Npy {

  final case class NpyArray(
      descr: String,
      fortranOrder: Boolean,
      shape: Array[Int],
      data: ByteBuffer) {

    def elemCount: Long = shape.foldLeft(1L)(_ * _.toLong)

    private def elemSize: Int = descr.last match {
      case '1' => 1
      case '4' => 4
      case '8' => 8
      case c => throw new IllegalArgumentException(s"unsupported descr $descr")
    }

    /** Element at flat C-order index i, widened to Double. */
    private def get(i: Int): Double = descr match {
      case "<f4" => data.getFloat(i * 4).toDouble
      case "<f8" => data.getDouble(i * 8)
      case "<i4" => data.getInt(i * 4).toDouble
      case "<i8" => data.getLong(i * 8).toDouble
      case "|i1" | "|b1" => data.get(i).toDouble
      case "|u1" => (data.get(i) & 0xff).toDouble
      case d => throw new IllegalArgumentException(s"unsupported descr $d")
    }

    /** Logical (row, col) honoring fortran_order. */
    private def at(r: Int, c: Int, rows: Int, cols: Int): Double =
      if (fortranOrder) get(c * rows + r) else get(r * cols + c)

    def toMatrixF: Array[Array[Float]] = {
      require(shape.length == 2, s"need 2-D, got shape ${shape.mkString("x")}")
      val Array(rows, cols) = shape
      Array.tabulate(rows, cols)((r, c) => at(r, c, rows, cols).toFloat)
    }

    def toMatrixD: Array[Array[Double]] = {
      require(shape.length == 2, s"need 2-D, got shape ${shape.mkString("x")}")
      val Array(rows, cols) = shape
      Array.tabulate(rows, cols)((r, c) => at(r, c, rows, cols))
    }

    def toVectorD: Array[Double] = {
      require(shape.length == 1, s"need 1-D, got shape ${shape.mkString("x")}")
      Array.tabulate(shape(0))(get)
    }
  }

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  private val HeaderRe =
    ("""\{\s*'descr':\s*'([^']+)',\s*'fortran_order':\s*(True|False),""" +
      """\s*'shape':\s*\(([0-9,\s]*)\),?\s*\}\s*""").r

  /** Read one `.npy` stream fully (caller closes the stream). */
  def readNpy(in: InputStream): NpyArray = {
    val din = new DataInputStream(in)
    val magic = new Array[Byte](6)
    din.readFully(magic)
    require(java.util.Arrays.equals(magic, Magic), "not an NPY stream")
    val major = din.readUnsignedByte()
    din.readUnsignedByte() // minor
    val headerLen =
      if (major == 1) {
        val b0 = din.readUnsignedByte(); val b1 = din.readUnsignedByte()
        b0 | (b1 << 8) // uint16 LE
      } else { // v2.0/3.0: uint32 LE
        val b = new Array[Byte](4)
        din.readFully(b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
      }
    val hdr = new Array[Byte](headerLen)
    din.readFully(hdr)
    val header = new String(hdr, java.nio.charset.StandardCharsets.ISO_8859_1)
    val (descr, fortran, shape) = header match {
      case HeaderRe(d, f, s) =>
        val dims = s.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
        (d, f == "True", dims)
      case _ =>
        throw new IllegalArgumentException(s"unparseable NPY header: $header")
    }
    val elemSize = descr.last match {
      case '1' => 1
      case '4' => 4
      case '8' => 8
      case _ =>
        throw new IllegalArgumentException(s"unsupported descr $descr")
    }
    require(descr.head == '<' || descr.head == '|',
      s"big-endian arrays unsupported: $descr")
    val n = shape.foldLeft(1L)(_ * _.toLong) * elemSize
    require(n <= Int.MaxValue, s"array too large for one buffer: $n bytes")
    val payload = new Array[Byte](n.toInt)
    din.readFully(payload)
    NpyArray(descr, fortran,
      shape, ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN))
  }

  /** All members of an `.npz` (a plain zip of `<name>.npy` entries —
    * `np.savez`/`np.savez_compressed` both read fine: ZipFile handles
    * stored and deflated entries alike).
    */
  def readNpz(path: String): Map[String, NpyArray] = {
    val zf = new ZipFile(path)
    try {
      zf.entries.asScala.filter(_.getName.endsWith(".npy")).map { e =>
        val in = zf.getInputStream(e)
        try e.getName.stripSuffix(".npy") -> readNpy(in) finally in.close()
      }.toMap
    } finally zf.close()
  }

  /** The reference's exact embedding-load semantics
    * (`word_embeddings.py:24-26`): `npz[key]` is the vocab-ALIGNED
    * (vocabSize x dim) matrix, and one zero row is vstacked below it
    * as the OOV bucket (`index_table_from_file(num_oov_buckets=1)`
    * maps unknown words to index vocabSize). Plugs directly into the
    * scorers, like [[Glove.matrixFromTable]].
    */
  def embeddingMatrix(npzPath: String, key: String = "embeddings",
      vocabSize: Int = -1): Array[Array[Float]] = {
    val arrs = readNpz(npzPath)
    val a = arrs.getOrElse(key, throw new IllegalArgumentException(
      s"npz $npzPath has no '$key' member (has: ${arrs.keys.mkString(", ")})"))
    val m = a.toMatrixF
    require(vocabSize < 0 || m.length == vocabSize,
      s"embedding rows ${m.length} != vocab size $vocabSize")
    val dim = if (m.isEmpty) 0 else m(0).length
    m :+ new Array[Float](dim)
  }
}
