package graft.tag

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Independent-implementation golden for W11: the committed
  * `bilstm_golden.json` was produced by `tools/gen_bilstm_golden.py`,
  * a from-scratch NumPy forward pass of the same public TF v1
  * semantics (LSTMCell i,j,f,o + forget_bias 1.0, conv1d 'same' +
  * max-pool, dense, `tf.contrib.crf.crf_decode`) over seeded-random
  * float32 weights and a 10-sentence fixture. Two codebases that share
  * no code agreeing to 1e-9 on every logit and exactly on every
  * decoded tag is the parity evidence a TF export would give — the
  * kernels can't tell whether the weights were trained (no TF ships in
  * this zero-egress image; see the generator's header).
  */
class BiLstmGoldenSpec extends AnyFunSuite {

  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/bilstm_golden.json")
    require(in != null, "bilstm_golden.json missing from test resources")
    try new ObjectMapper().readTree(in) finally in.close()
  }

  private def floats1(n: JsonNode): Array[Float] =
    n.elements.asScala.map(_.floatValue).toArray
  private def floats2(n: JsonNode): Array[Array[Float]] =
    n.elements.asScala.map(floats1).toArray
  private def floats3(n: JsonNode): Array[Array[Array[Float]]] =
    n.elements.asScala.map(floats2).toArray
  private def doubles2(n: JsonNode): Array[Array[Double]] =
    n.elements.asScala.map(_.elements.asScala.map(_.doubleValue).toArray).toArray
  private def strings(n: JsonNode): Seq[String] =
    n.elements.asScala.map(_.asText).toSeq
  private def vocab(n: JsonNode): Map[String, Int] =
    n.fields.asScala.map(e => e.getKey -> e.getValue.intValue).toMap

  private lazy val scorer = BiLstmCrfScorer(
    vocab = vocab(root.get("word_vocab")),
    wordEmb = floats2(root.get("word_emb")),
    charCnn = Some(BiLstm.CharCnnWeights(
      charVocab = vocab(root.get("char_vocab")).map { case (k, v) => k.head -> v },
      charEmb = floats2(root.get("char_emb")),
      kernel = floats3(root.get("cnn_kernel")),
      bias = floats1(root.get("cnn_bias")))),
    fw = BiLstm.CellWeights(floats2(root.get("fw_kernel")), floats1(root.get("fw_bias"))),
    bw = BiLstm.CellWeights(floats2(root.get("bw_kernel")), floats1(root.get("bw_bias"))),
    dense = floats2(root.get("dense")),
    denseBias = floats1(root.get("dense_bias")),
    transition = doubles2(root.get("transition")))

  test("golden: per-token logits match the NumPy stack to 1e-9") {
    val sents = root.get("sentences").elements.asScala.toSeq
    val golden = root.get("logits").elements.asScala.toSeq
    var maxDiff = 0.0
    sents.zip(golden).foreach { case (s, gl) =>
      val logits = scorer.logitsOf(strings(s))
      val expected = doubles2(gl)
      assert(logits.length == expected.length)
      logits.zip(expected).foreach { case (row, erow) =>
        row.zip(erow).foreach { case (a, b) =>
          maxDiff = math.max(maxDiff, math.abs(a - b))
        }
      }
    }
    assert(maxDiff < 1e-9, s"max logit divergence $maxDiff")
  }

  test("golden: decoded tag paths are byte-identical to the NumPy viterbi") {
    val sents = root.get("sentences").elements.asScala.toSeq
    val tags = root.get("tags").elements.asScala.toSeq
    sents.zip(tags).foreach { case (s, tg) =>
      val toks = strings(s)
      val expected = tg.elements.asScala.map(_.intValue).toSeq
      assert(scorer.decode(toks).toSeq == expected, s"sentence $toks")
    }
    // the fixture exercises real path structure, not a constant tag
    val all = tags.flatMap(_.elements.asScala.map(_.intValue)).toSet
    assert(all == Set(0, 1, 2))
  }

  test("golden: char-LSTM word reprs match the NumPy final-state concat") {
    val cl = BiLstm.CharLstmWeights(
      charVocab = vocab(root.get("char_vocab")).map { case (k, v) => k.head -> v },
      charEmb = floats2(root.get("char_emb")),
      fw = BiLstm.CellWeights(floats2(root.get("cl_fw_kernel")), floats1(root.get("cl_fw_bias"))),
      bw = BiLstm.CellWeights(floats2(root.get("cl_bw_kernel")), floats1(root.get("cl_bw_bias"))))
    val words = strings(root.get("cl_words"))
    val reprs = floats2(root.get("cl_reprs"))
    words.zip(reprs).foreach { case (w, er) =>
      val r = cl.repr(w)
      r.zip(er).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6f, s"word $w: $a vs $b")
      }
    }
  }
}
