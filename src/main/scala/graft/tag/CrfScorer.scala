package graft.tag

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.spark.SentenceRow

/** Log-domain Viterbi over per-token label logits with a 3x3 transition
  * matrix — the decode used by the reference's CRF / Bi-LSTM-CRF heads
  * (`tf.contrib.crf.crf_decode`, models/model.py:76-82), re-expressed as
  * the same batched, broadcast-weights kernel as the HMM (SURVEY §2.5
  * W5/W6: probability ⊙ becomes log-domain +).
  *
  * Training stays offline (the reference trains in TF); the engine
  * scores with imported weights. [[LinearScorer]] is the weight-import
  * seam: an embedding lookup + dense layer producing per-token logits
  * (the Bi-LSTM forward pass plugs in behind the same interface,
  * SURVEY §2.5 W11).
  */
object CrfScorer {

  /** crf_decode semantics: maximize sum of unary logits + pairwise
    * transitions; first-max tie-breaking like the TF implementation.
    */
  def viterbiDecode(logits: Array[Array[Double]],
      transition: Array[Array[Double]]): Array[Int] = {
    val n = logits.length
    if (n == 0) return Array.empty
    val numTags = logits(0).length
    val delta = Array.ofDim[Double](n, numTags)
    val ptr = Array.ofDim[Int](n, numTags)
    var t = 0
    while (t < numTags) { delta(0)(t) = logits(0)(t); t += 1 }
    var i = 1
    while (i < n) {
      var cur = 0
      while (cur < numTags) {
        var best = Double.NegativeInfinity
        var bestPrev = 0
        var prev = 0
        while (prev < numTags) {
          val s = delta(i - 1)(prev) + transition(prev)(cur)
          if (s > best) { best = s; bestPrev = prev }
          prev += 1
        }
        delta(i)(cur) = best + logits(i)(cur)
        ptr(i)(cur) = bestPrev
        cur += 1
      }
      i += 1
    }
    var bestLast = 0
    var bestScore = delta(n - 1)(0)
    t = 1
    while (t < numTags) {
      if (delta(n - 1)(t) > bestScore) { bestScore = delta(n - 1)(t); bestLast = t }
      t += 1
    }
    val out = new Array[Int](n)
    out(n - 1) = bestLast
    i = n - 1
    while (i > 0) { out(i - 1) = ptr(i)(out(i)); i -= 1 }
    out
  }

  /** Path score for tests: sum of unary logits + transitions. */
  def pathScore(logits: Array[Array[Double]],
      transition: Array[Array[Double]], labels: Seq[Int]): Double = {
    var s = 0.0
    labels.indices.foreach { i =>
      s += logits(i)(labels(i))
      if (i > 0) s += transition(labels(i - 1))(labels(i))
    }
    s
  }
}

/** Minimal imported-weights scorer: word embedding lookup (broadcast
  * matrix, OOV id = vocab size) + dense layer to per-label logits.
  * Stands in for the Bi-LSTM forward pass with the same data contract:
  * broadcast weights, per-partition batched scoring, no shuffle.
  */
final case class LinearScorer(
    vocab: Map[String, Int],
    embeddings: Array[Array[Float]], // [vocab+1][d], last row = OOV
    dense: Array[Array[Double]], // [d][numLabels]
    bias: Array[Double]) extends Serializable {

  def logitsOf(tokens: Seq[String]): Array[Array[Double]] = {
    val numLabels = bias.length
    tokens.map { t =>
      val id = vocab.getOrElse(t, embeddings.length - 1)
      val e = embeddings(id)
      val out = bias.clone()
      var d = 0
      while (d < e.length) {
        val v = e(d)
        var l = 0
        while (l < numLabels) { out(l) += v * dense(d)(l); l += 1 }
        d += 1
      }
      out
    }.toArray
  }
}

object CrfTagger {
  /** Distributed decode: broadcast scorer weights + transition, narrow
    * per-partition scoring (north star: "batched, broadcast-weights
    * scoring UDF over typed Datasets").
    */
  def predict(spark: SparkSession, scorer: LinearScorer,
      transition: Array[Array[Double]],
      sents: Dataset[SentenceRow]): Dataset[(SentenceRow, Seq[Int])] = {
    import spark.implicits._
    val bs = spark.sparkContext.broadcast(scorer)
    val bt = spark.sparkContext.broadcast(transition)
    sents.mapPartitions { it =>
      val s = bs.value
      val t = bt.value
      it.map { sent =>
        (sent, CrfScorer.viterbiDecode(s.logitsOf(sent.tkns), t).toSeq)
      }
    }
  }
}
