package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-length sequence packing for LLM pretraining — the
  * concat-and-chunk regime every trainer feeds on: the corpus is ONE
  * deterministic token stream (documents concatenated in doc_id
  * order), cut into sequences of exactly `seqLen` tokens; a document
  * crossing a boundary SPLITS across the two sequences. The output
  * maps each document to the sequences it lands in.
  *
  * Scale design: the global cumulative token offset is a DISTRIBUTED
  * PREFIX SUM — range-repartition by doc_id (partition i holds
  * strictly smaller ids than partition i+1), one token-total scalar
  * per partition collected to the driver, exclusive prefix offsets
  * broadcast back, then a narrow second pass emits each doc's chunk
  * rows from its now-known global offset. `Window.orderBy` with no
  * partitionBy — the classic way to write a global cumsum — funnels
  * the whole corpus through ONE task and is exactly what this avoids.
  * Cost: one range shuffle + one O(partitions) driver array.
  *
  * Determinism: output depends only on (doc_id, token count) — not on
  * partitioning, parallelism, or input order (asserted in PackingSpec).
  *
  * @param seqLen   tokens per training sequence (> 0)
  * @param tokenCol per-doc token count column (rows with <= 0 tokens
  *                 contribute nothing to the stream and emit no row)
  * @return (doc_id, seq_id, tok_from, tok_to): doc `doc_id`'s tokens
  *         [tok_from, tok_to) (doc-relative, exclusive end) belong to
  *         training sequence `seq_id`. Per doc, the spans partition
  *         [0, n_tokens); per sequence except the last, spans sum to
  *         exactly seqLen.
  */
object Packing {

  def chunkAssignments(spark: SparkSession, docs: DataFrame, seqLen: Long,
      tokenCol: String = "n_tokens", idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    require(seqLen > 0, s"seqLen must be positive (got $seqLen)")
    val sorted = docs
      .select(col(idCol).cast("long").as("id"), col(tokenCol).cast("long").as("n"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .as[(Long, Long)]
    val rdd = sorted.rdd
    // phase 1: one Long per partition back to the driver — the only
    // non-narrow data movement besides the range shuffle itself
    val partTotals: Array[Long] = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach { case (_, n) => if (n > 0) s += n }
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val prefix: Array[Long] = partTotals.scanLeft(0L)(_ + _).dropRight(1)
    val bc = spark.sparkContext.broadcast(prefix)
    // phase 2: narrow — each partition starts at its exclusive prefix
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var off = bc.value(i)
      it.flatMap { case (id, n) =>
        if (n <= 0) Iterator.empty
        else {
          val start = off
          off += n
          val first = start / seqLen
          val last = (start + n - 1) / seqLen
          (first to last).iterator.map { s =>
            val cs = math.max(start, s * seqLen)
            val ce = math.min(start + n, (s + 1) * seqLen)
            (id, s, cs - start, ce - start)
          }
        }
      }
    }
    spark.createDataFrame(rows).toDF("doc_id", "seq_id", "tok_from", "tok_to")
  }
}
