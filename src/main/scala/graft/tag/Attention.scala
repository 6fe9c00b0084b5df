package graft.tag

/** Attention kernels and HTML/CSS representations — the paper's ablation
  * variants around the Bi-LSTM-CRF core, inference semantics only
  * (dropout = identity). Masking/normalize lines are commented out in
  * `models/attention.py` and are therefore NOT applied here either. The
  * residual differs between the two kernels IN the reference: commented
  * out in `attention()` (:146-149) but LIVE in `exact_attention()`
  * (:181-184), and `html_attention` (model.py:196,223) calls the latter
  * with the default `residual='add'` — so [[Attention.exactAttention]]
  * adds the raw values back while [[Attention.multiHead]] does not.
  *
  *  - [[Attention.multiHead]]: `attention()` (models/attention.py:100-151)
  *    — Q/K/V dense projections, feature-axis head split, scaled
  *    dot-product scores (scale = sqrt(headDim), the split tensor's last
  *    dim), softmax over keys, per-head weighted sum, head concat.
  *  - [[Attention.exactAttention]]: `exact_attention()` (:152-187) —
  *    scores are 1 where the full query/key vectors are equal else 0
  *    (`exact_match`, :121-130), softmax, weighted sum of dense(values),
  *    plus the residual add of the raw values.
  *  - [[Attention.charLstmRepr]]: `lstm_char_representations()`
  *    (models/char_representations.py:34-52) — Bi-LSTM over the word's
  *    char embeddings, concat of the FINAL hidden states (not per-step
  *    outputs).
  *  - [[Attention.htmlRepr]]: `get_soft_html_representations()`
  *    (models/html_embeddings.py:47-72) — embeddings of the 2 ancestor
  *    html tags (flattened) ++ the mean char embedding of the css class.
  */
object Attention {

  /** tf.layers.dense: y = x . w + b, weights [in][out]. */
  final case class Dense(w: Array[Array[Float]], b: Array[Float]) {
    def out: Int = b.length
    def apply(x: Array[Double]): Array[Double] = {
      val y = new Array[Double](b.length)
      var o = 0
      while (o < b.length) { y(o) = b(o); o += 1 }
      var i = 0
      while (i < x.length) {
        val v = x(i)
        if (v != 0.0) {
          val row = w(i)
          var o2 = 0
          while (o2 < b.length) { y(o2) += v * row(o2); o2 += 1 }
        }
        i += 1
      }
      y
    }
    def apply(xs: Array[Array[Double]]): Array[Array[Double]] = xs.map(apply)
  }

  def softmaxInPlace(x: Array[Double]): Unit = {
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < x.length) { if (x(i) > mx) mx = x(i); i += 1 }
    var sum = 0.0
    i = 0
    while (i < x.length) { x(i) = math.exp(x(i) - mx); sum += x(i); i += 1 }
    i = 0
    while (i < x.length) { x(i) /= sum; i += 1 }
  }

  /** Multi-head scaled dot-product attention over one sequence.
    *
    * @param wk None reproduces `queries_eq_keys=True` (K = Q).
    * @return [T_q x valueDim] context vectors (head concat).
    */
  def multiHead(queries: Array[Array[Double]], keys: Array[Array[Double]],
      values: Array[Array[Double]], wq: Dense, wk: Option[Dense], wv: Dense,
      numHeads: Int): Array[Array[Double]] = {
    val q = wq(queries)
    val k = wk.map(_(keys)).getOrElse(wq(keys))
    val v = wv(values)
    val aDim = wq.out
    val vDim = wv.out
    require(aDim % numHeads == 0 && vDim % numHeads == 0,
      s"dims ($aDim, $vDim) must split into $numHeads heads")
    val dq = aDim / numHeads
    val dv = vDim / numHeads
    val scale = math.sqrt(dq.toDouble)
    val tq = queries.length
    val tk = keys.length
    val out = Array.fill(tq)(new Array[Double](vDim))
    var h = 0
    while (h < numHeads) {
      val qOff = h * dq
      val vOff = h * dv
      var ti = 0
      while (ti < tq) {
        val scores = new Array[Double](tk)
        var tj = 0
        while (tj < tk) {
          var s = 0.0
          var d = 0
          while (d < dq) { s += q(ti)(qOff + d) * k(tj)(qOff + d); d += 1 }
          scores(tj) = s / scale
          tj += 1
        }
        softmaxInPlace(scores)
        tj = 0
        while (tj < tk) {
          val a = scores(tj)
          var d = 0
          while (d < dv) { out(ti)(vOff + d) += a * v(tj)(vOff + d); d += 1 }
          tj += 1
        }
        ti += 1
      }
      h += 1
    }
    out
  }

  /** Exact-match attention: score(q, k) = 1 when the raw vectors are
    * element-wise equal else 0, softmax over keys, weighted sum of
    * dense(values), then the RESIDUAL ADD of the raw values —
    * `exact_attention`'s residual lines are live in the reference
    * (models/attention.py:181-184, called with the default
    * `residual='add'` from model.py:223), unlike `attention()`'s which
    * are commented out. The dense projection maps values to their own
    * dimensionality in the reference (`output_size = values.shape[2]`),
    * which the residual requires; query index i adds values(i), so the
    * query count must not exceed the value count (they are the same
    * per-token sequence at the call site).
    */
  def exactAttention(queries: Array[Array[Double]], keys: Array[Array[Double]],
      values: Array[Array[Double]], wv: Dense): Array[Array[Double]] = {
    require(values.isEmpty || wv.out == values(0).length,
      s"residual add needs dense(out=${wv.out}) == values dim ${values(0).length}")
    require(queries.length == values.length,
      "residual add (outputs += values) needs equal sequence lengths; " +
        "a shorter query sequence would silently compute a truncated, " +
        "nonstandard result")
    val v = wv(values)
    queries.zipWithIndex.map { case (qv, qi) =>
      val scores = keys.map(kv =>
        if (java.util.Arrays.equals(qv, kv)) 1.0 else 0.0)
      softmaxInPlace(scores)
      val o = values(qi).clone()
      var tj = 0
      while (tj < keys.length) {
        val a = scores(tj)
        var d = 0
        while (d < o.length) { o(d) += a * v(tj)(d); d += 1 }
        tj += 1
      }
      o
    }
  }

  /** Char-LSTM word representation: Bi-LSTM over char embeddings, concat
    * of the final fw/bw hidden states (the reference takes `output_fw[1]`
    * — the final h — not the per-step outputs).
    */
  def charLstmRepr(charVocab: Map[Char, Int], charEmb: Array[Array[Float]],
      fw: BiLstm.CellWeights, bw: BiLstm.CellWeights,
      word: String): Array[Float] = {
    val u = fw.units
    val out = new Array[Float](2 * u)
    if (word.isEmpty) return out
    val xs = word.toCharArray.map(c =>
      charEmb(charVocab.getOrElse(c, charEmb.length - 1)))
    val hf = BiLstm.run(fw, xs).last
    val hb = BiLstm.run(bw, xs.reverse).last
    var j = 0
    while (j < u) {
      out(j) = hf(j).toFloat
      out(u + j) = hb(j).toFloat
      j += 1
    }
    out
  }

  /** Soft HTML representation of one token: the embeddings of its two
    * ancestor html tags (parent, second parent — the engine's html_ctx
    * feature split on '.') flattened, concatenated with the MEAN char
    * embedding of its css class string.
    */
  def htmlRepr(htmlVocab: Map[String, Int], htmlEmb: Array[Array[Float]],
      charVocab: Map[Char, Int], charEmb: Array[Array[Float]],
      htmlCtx: String, cssClass: String): Array[Float] = {
    val dot = htmlCtx.indexOf('.')
    val (p1, p2) =
      if (dot < 0) (htmlCtx, "") else (htmlCtx.substring(0, dot), htmlCtx.substring(dot + 1))
    val e1 = htmlEmb(htmlVocab.getOrElse(p1, htmlEmb.length - 1))
    val e2 = htmlEmb(htmlVocab.getOrElse(p2, htmlEmb.length - 1))
    val cd = if (charEmb.isEmpty) 0 else charEmb(0).length
    val css = new Array[Float](cd)
    if (cssClass.nonEmpty && cd > 0) {
      var i = 0
      while (i < cssClass.length) {
        val e = charEmb(charVocab.getOrElse(cssClass.charAt(i), charEmb.length - 1))
        var d = 0
        while (d < cd) { css(d) += e(d); d += 1 }
        i += 1
      }
      var d = 0
      while (d < cd) { css(d) /= cssClass.length; d += 1 }
    }
    e1 ++ e2 ++ css
  }
}
