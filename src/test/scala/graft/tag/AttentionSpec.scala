package graft.tag

import org.scalatest.funsuite.AnyFunSuite

/** Attention / char-LSTM / html-representation ablation kernels:
  * hand-computed single-head fixture, multi-head agreement with a naive
  * per-head loop, exact-match attention semantics, final-state char-LSTM
  * reps, html+css representation layout.
  */
class AttentionSpec extends AnyFunSuite {

  private def identityDense(n: Int) = Attention.Dense(
    Array.tabulate(n, n)((i, j) => if (i == j) 1.0f else 0.0f),
    new Array[Float](n))

  test("single-head attention matches the hand-computed fixture") {
    // identity projections, dim 2, scale sqrt(2)
    val q = Array(Array(1.0, 0.0))
    val k = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val v = Array(Array(10.0, 0.0), Array(0.0, 10.0))
    val got = Attention.multiHead(q, k, v,
      identityDense(2), Some(identityDense(2)), identityDense(2), 1)
    // scores = [1/sqrt2, 0]; softmax = [e^s/(e^s+1), 1/(e^s+1)]
    val s = 1.0 / math.sqrt(2.0)
    val a0 = math.exp(s) / (math.exp(s) + 1.0)
    val a1 = 1.0 / (math.exp(s) + 1.0)
    assert(math.abs(got(0)(0) - 10 * a0) < 1e-12)
    assert(math.abs(got(0)(1) - 10 * a1) < 1e-12)
  }

  test("multi-head split agrees with a naive per-head computation") {
    val rng = new scala.util.Random(99)
    val t = 5; val dim = 8; val heads = 2
    def mat(r: Int, c: Int) = Array.fill(r, c)((rng.nextDouble() - 0.5).toFloat)
    val wq = Attention.Dense(mat(dim, dim), Array.fill(dim)(rng.nextFloat() - 0.5f))
    val wv = Attention.Dense(mat(dim, dim), Array.fill(dim)(rng.nextFloat() - 0.5f))
    val x = Array.fill(t, dim)(rng.nextDouble() * 2 - 1)
    // queries_eq_keys = true (wk = None) like multihead_attention
    val got = Attention.multiHead(x, x, x, wq, None, wv, heads)

    // naive: split AFTER projecting, one head at a time
    val qp = wq(x); val vp = wv(x)
    val dh = dim / heads
    for (h <- 0 until heads; ti <- 0 until t) {
      val scores = (0 until t).map { tj =>
        (0 until dh).map(d => qp(ti)(h * dh + d) * qp(tj)(h * dh + d)).sum /
          math.sqrt(dh.toDouble)
      }.toArray
      val mx = scores.max
      val es = scores.map(s => math.exp(s - mx))
      val sm = es.map(_ / es.sum)
      for (d <- 0 until dh) {
        val want = (0 until t).map(tj => sm(tj) * vp(tj)(h * dh + d)).sum
        assert(math.abs(got(ti)(h * dh + d) - want) < 1e-9,
          s"head $h t $ti d $d")
      }
    }
  }

  test("exact-match attention averages equal-key values + residual add") {
    // exact_attention's residual lines are LIVE in the reference
    // (attention.py:181-184, residual='add' at model.py:223): the raw
    // value vector of the query's own position is added back.
    val q = Array(Array(1.0, 2.0), Array(9.0, 9.0), Array(3.0, 4.0))
    val k = Array(Array(1.0, 2.0), Array(1.0, 2.0), Array(3.0, 4.0))
    val v = Array(Array(6.0), Array(12.0), Array(300.0))
    val got = Attention.exactAttention(q, k, v, identityDense(1))
    // q0 matches k0,k1: scores [1,1,0] -> softmax [e,e,1]/(2e+1)
    val e = math.exp(1.0)
    val a = e / (2 * e + 1); val b = 1.0 / (2 * e + 1)
    assert(math.abs(got(0)(0) - (a * 6 + a * 12 + b * 300 + 6.0)) < 1e-10)
    // q1 matches nothing: uniform average, + its own value v(1)=12
    assert(math.abs(got(1)(0) - ((6.0 + 12.0 + 300.0) / 3 + 12.0)) < 1e-10)
    // q2 matches k2: scores [0,0,1] -> softmax [1,1,e]/(2+e), + v(2)=300
    assert(math.abs(got(2)(0) -
      ((6.0 + 12.0 + 300.0 * e) / (2 + e) + 300.0)) < 1e-10)
    // the residual pairs query i with values(i): unequal lengths must
    // fail loudly, not silently truncate (the reference's
    // `outputs += values` requires T_q == T_v)
    assertThrows[IllegalArgumentException] {
      Attention.exactAttention(q.take(2), k, v, identityDense(1))
    }
  }

  test("char-LSTM repr takes FINAL states, not per-step outputs") {
    val rng = new scala.util.Random(7)
    def cell(in: Int, u: Int) = BiLstm.CellWeights(
      Array.fill(in + u, 4 * u)((rng.nextDouble() - 0.5).toFloat),
      Array.fill(4 * u)((rng.nextDouble() - 0.5).toFloat))
    val emb = Array(Array(0.5f, -0.2f), Array(-1.0f, 0.3f), Array(0.0f, 0.0f))
    val vocab = Map('a' -> 0, 'b' -> 1)
    val fw = cell(2, 3); val bw = cell(2, 3)
    val got = Attention.charLstmRepr(vocab, emb, fw, bw, "aba")
    val xs = "aba".toCharArray.map(c => emb(vocab(c)))
    val expF = BiLstm.run(fw, xs).last
    val expB = BiLstm.run(bw, xs.reverse).last
    assert(got.length == 6)
    for (j <- 0 until 3) {
      assert(math.abs(got(j) - expF(j)) < 1e-6)
      assert(math.abs(got(3 + j) - expB(j)) < 1e-6)
    }
    // empty word -> zero vector (reference pads to zero state)
    assert(Attention.charLstmRepr(vocab, emb, fw, bw, "").forall(_ == 0.0f))
  }

  test("html repr: 2 ancestor-tag embeddings flattened ++ mean css char emb") {
    val htmlVocab = Map("div" -> 0, "body" -> 1)
    val htmlEmb = Array(Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array(0.0f, 0.0f))
    val charVocab = Map('a' -> 0, 'b' -> 1)
    val charEmb = Array(Array(2.0f), Array(4.0f), Array(0.0f))
    val got = Attention.htmlRepr(htmlVocab, htmlEmb, charVocab, charEmb,
      "div.body", "ab")
    assert(got.toSeq == Seq(1.0f, 2.0f, 3.0f, 4.0f, 3.0f)) // mean(2,4)=3
    // OOV tag -> last (zero) row; unknown css char -> OOV char row
    val oov = Attention.htmlRepr(htmlVocab, htmlEmb, charVocab, charEmb,
      "span.td", "z")
    assert(oov.toSeq == Seq(0.0f, 0.0f, 0.0f, 0.0f, 0.0f))
  }
}
