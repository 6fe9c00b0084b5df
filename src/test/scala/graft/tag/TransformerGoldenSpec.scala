package graft.tag

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Independent-implementation golden for the transformer-branch
  * kernels: `transformer_golden.json` is produced by
  * `tools/gen_transformer_golden.py`, a from-scratch NumPy pass over
  * the same public TF-1.x formulas (sinusoidal `pos_embeddings` with
  * elementwise masking, `normalize` layer norm, masked
  * `scaled_dot_product_attention`, self-projecting
  * `multihead_attention` with residual + norm). Two codebases sharing
  * no code agree to 1e-9 elementwise — the same trust chain as the
  * Bi-LSTM golden (the reference's own transformer branch is dead
  * code, so formula parity is the strongest available evidence).
  */
class TransformerGoldenSpec extends AnyFunSuite {

  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/transformer_golden.json")
    require(in != null, "transformer_golden.json missing from test resources")
    try new ObjectMapper().readTree(in) finally in.close()
  }

  private def d1(n: JsonNode): Array[Double] =
    n.elements.asScala.map(_.doubleValue).toArray
  private def d2(n: JsonNode): Array[Array[Double]] =
    n.elements.asScala.map(d1).toArray
  private def d3(n: JsonNode): Array[Array[Array[Double]]] =
    n.elements.asScala.map(d2).toArray

  private val gamma = d1(root.get("gamma"))
  private val beta = d1(root.get("beta"))
  private val dense = Attention.Dense(
    d2(root.get("dense_w")).map(_.map(_.toFloat)),
    d1(root.get("dense_b")).map(_.toFloat))
  private val seqs = d3(root.get("sequences"))

  private def assertClose(got: Array[Array[Double]],
      want: Array[Array[Double]], tol: Double = 1e-9): Unit = {
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.length == w.length)
      g.zip(w).foreach { case (a, b) =>
        assert(math.abs(a - b) <= tol, s"$a vs $b")
      }
    }
  }

  test("positional encoding table matches NumPy sin/cos formula") {
    assertClose(Transformer.posEncodingTable(12, 8),
      d2(root.get("pos_table_head")))
  }

  test("pos_embeddings: masked and unmasked lookups match") {
    val masked = d3(root.get("pos_embeddings"))
    val unmasked = d3(root.get("pos_embeddings_unmasked"))
    seqs.indices.foreach { i =>
      assertClose(Transformer.posEmbeddings(seqs(i), 2000, masking = true),
        masked(i))
      assertClose(Transformer.posEmbeddings(seqs(i), 2000, masking = false),
        unmasked(i))
    }
  }

  test("layer norm matches: epsilon inside the root, population moments") {
    val want = d3(root.get("layer_norm"))
    seqs.indices.foreach(i =>
      assertClose(Transformer.layerNorm(seqs(i), gamma, beta), want(i)))
  }

  test("scaled dot-product attention: key/query masks, causal variant, cross q/k/v") {
    val want = d3(root.get("sdpa"))
    val wantC = d3(root.get("sdpa_causal"))
    seqs.indices.foreach { i =>
      val x = seqs(i)
      assertClose(Transformer.scaledDotProductAttention(x, x, x), want(i))
      assertClose(
        Transformer.scaledDotProductAttention(x, x, x, causality = true),
        wantC(i))
    }
    // all-zero query row 3 of sequence 0 must come out all-zero
    assert(want(0)(3).forall(_ == 0.0))
    val xa = seqs(0); val xc = seqs(2)
    val vNarrow = xc.map(_.take(5))
    assertClose(Transformer.scaledDotProductAttention(xa, xc, vNarrow),
      d2(root.get("sdpa_cross")))
  }

  test("multi-head self-attention: Q=K=V projection, residual, layer norm") {
    val want = d3(root.get("mha"))
    val wantC = d3(root.get("mha_causal"))
    seqs.indices.foreach { i =>
      assertClose(
        Transformer.multiHeadAttention(seqs(i), dense, 2, gamma, beta),
        want(i))
      assertClose(
        Transformer.multiHeadAttention(seqs(i), dense, 2, gamma, beta,
          causality = true),
        wantC(i))
    }
  }
}
