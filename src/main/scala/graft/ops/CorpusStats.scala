package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-card statistics over a corpus column — the summary every
  * training-data release ships (doc counts, token totals, length
  * quantiles).
  *
  * The quantiles are EXACT, computed distributively: range-repartition
  * the values, collect one row-count scalar per partition (the same
  * prefix-sum shape as [[Packing]]), turn each requested probability
  * into the two neighboring GLOBAL ranks (`r = p * (n-1)`, the
  * linear-interpolation definition both Spark's `percentile` and
  * DuckDB's `quantile_cont` use — which is what makes this
  * oracle-able), and fetch just those ranked values with one narrow
  * pass (each partition knows its global index range; at most
  * 2 * |probs| scalars return to the driver). `approx_percentile`
  * would be the sketch answer at 10^12 rows, but its t-digest output
  * is engine-specific and cannot be cross-checked exactly; this path
  * is both scalable (no partition ever holds more than its share, the
  * driver never sees data) and bit-comparable.
  *
  * NOTE: like [[Packing.chunkAssignments]], calling these EXECUTES
  * Spark jobs immediately — not lazily-composable plans.
  */
object CorpusStats {

  /** Exact linear-interpolated quantiles of `valueCol` (NULLs ignored,
    * like any SQL aggregate). Returns prob -> value; empty input
    * yields an empty map.
    */
  def exactQuantiles(spark: SparkSession, df: DataFrame, valueCol: String,
      probs: Seq[Double]): Map[Double, Double] = {
    import spark.implicits._
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0, 1]: $probs")
    val sorted = df
      .filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("v"))
      .repartitionByRange(col("v"))
      .sortWithinPartitions("v")
      .as[Double]
    val rdd = sorted.rdd
    val partCounts: Array[Long] = rdd
      .mapPartitions(it => Iterator(it.size.toLong)).collect()
    val n = partCounts.sum
    if (n == 0) return Map.empty
    val starts: Array[Long] = partCounts.scanLeft(0L)(_ + _).dropRight(1)
    // global ranks whose values interpolation needs
    val wanted: Set[Long] = probs.flatMap { p =>
      val r = p * (n - 1)
      Seq(math.floor(r).toLong, math.ceil(r).toLong)
    }.toSet
    val bcStarts = spark.sparkContext.broadcast(starts)
    val bcCounts = spark.sparkContext.broadcast(partCounts)
    val bcWanted = spark.sparkContext.broadcast(wanted)
    val hits: Map[Long, Double] = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var idx = bcStarts.value(i)
        val want = bcWanted.value
        val emitted = it.flatMap { v =>
          val out = if (want.contains(idx)) Iterator((idx, v)) else Iterator.empty
          idx += 1
          out
        }
        // same fail-fast as Packing: a between-jobs recomputation over
        // nondeterministic lineage would silently shift every rank
        emitted ++ {
          require(idx - bcStarts.value(i) == bcCounts.value(i),
            s"CorpusStats: partition $i row count changed between the " +
              "count and fetch jobs — input lineage is nondeterministic")
          Iterator.empty
        }
      }
      .collect().toMap
    probs.map { p =>
      val r = p * (n - 1)
      val lo = hits(math.floor(r).toLong)
      val hi = hits(math.ceil(r).toLong)
      val frac = r - math.floor(r)
      p -> (lo + (hi - lo) * frac)
    }.toMap
  }

  /** One-row dataset card over a per-doc token-count column:
    * (n_docs, total_tokens, min_tokens, p50_tokens, p90_tokens,
    * max_tokens).
    */
  def tokenCard(spark: SparkSession, docs: DataFrame,
      tokenCol: String = "n_tokens"): DataFrame = {
    val q = exactQuantiles(spark, docs, tokenCol, Seq(0.5, 0.9))
    docs.agg(
      count(col(tokenCol)).as("n_docs"),
      sum(col(tokenCol)).cast("long").as("total_tokens"),
      min(col(tokenCol)).cast("long").as("min_tokens"),
      max(col(tokenCol)).cast("long").as("max_tokens"))
      .withColumn("p50_tokens", lit(q.getOrElse(0.5, Double.NaN)))
      .withColumn("p90_tokens", lit(q.getOrElse(0.9, Double.NaN)))
  }
}
