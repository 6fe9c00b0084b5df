package graft.tag

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.spark.SentenceRow

/** Best-F1 early stopping (SURVEY §2.4 A8; `models/estimator.py:137-139`):
  * the reference's training driver evaluates dev F1 after every epoch,
  * keeps the best-scoring model, and stops once `patience` consecutive
  * epochs fail to improve it. The comparison is a driver-side scalar —
  * each epoch's distributed work is one decode + one span-metrics
  * aggregation; only (f1, epoch) state lives on the driver.
  *
  * The engine's in-cluster training protocol is HMM self-training
  * (`models/hmm.py:247-258`, [[Hmm.selfTrain]]); [[selfTrainBestF1]]
  * closes the loop the way the reference's estimator does around TF
  * epochs. [[run]] is the protocol itself, generic over the step/eval
  * pair, so a future imported-weights fine-tune loop reuses it.
  */
object EarlyStopping {

  final case class Trace[M](best: M, bestF1: Double, bestEpoch: Int,
      history: Seq[Double])

  /** Run `step` up to `maxEpochs` times; after each epoch score the
    * stepped model with `eval` (higher is better) and keep the max.
    * Stops early once `patience` consecutive epochs fail to beat the
    * best (strict improvement, like the reference's `f1 > best_f1`).
    * Epoch 0 is the initial model's score — the reference never
    * returns a model worse than its starting point.
    */
  def run[M](init: M, step: M => M, eval: M => Double,
      maxEpochs: Int, patience: Int): Trace[M] = {
    require(maxEpochs >= 0 && patience >= 1, "maxEpochs >= 0, patience >= 1")
    var best = init
    var bestF1 = eval(init)
    var bestEpoch = 0
    val history = Seq.newBuilder[Double]
    history += bestF1
    var epoch = 1
    var cur = init
    var sinceBest = 0
    while (epoch <= maxEpochs && sinceBest < patience) {
      cur = step(cur)
      val f1 = eval(cur)
      history += f1
      if (f1 > bestF1) {
        best = cur; bestF1 = f1; bestEpoch = epoch; sinceBest = 0
      } else sinceBest += 1
      epoch += 1
    }
    Trace(best, bestF1, bestEpoch, history.result())
  }

  /** Self-training with best-F1 early stopping: iterate
    * [[Hmm.selfTrain]] over `unlabeled`, score each round's model on
    * the labeled `dev` split (span F1 via the shuffle-free
    * [[graft.metrics.SpanMetrics.agg]] Aggregator), return the
    * best-dev model. `dev` and `unlabeled` are re-decoded every epoch
    * with broadcast weights — no state accumulates on the executors.
    */
  def selfTrainBestF1(spark: SparkSession, init: HmmModel,
      unlabeled: Dataset[SentenceRow], dev: Dataset[SentenceRow],
      maxEpochs: Int = 5, patience: Int = 2,
      minCount: Long = 1L): Trace[HmmModel] = {
    import spark.implicits._
    val devF1: HmmModel => Double = { m =>
      val pairs = Hmm.predict(spark, m, dev)
        .map { case (s, tags) => (tags.map(Hmm.Labels(_)), s.bio) }
      graft.metrics.SpanMetrics.evaluate(spark, pairs).f1
    }
    run[HmmModel](init, Hmm.selfTrain(spark, _, unlabeled, minCount),
      devF1, maxEpochs, patience)
  }
}
