package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GloVe text-format importer (S7) — the engine-side equivalent of the
  * reference's embedding prep: `RNE Dataset.ipynb` cell 4 streams the
  * 840B GloVe text file, keeps only lines whose word is in the dataset
  * vocabulary, and saves the aligned matrix that
  * `models/word_embeddings.py:19-29` then row-stacks with one zero OOV
  * row and looks up by vocab index.
  *
  * The text scan is distributed (spark.read.text over a file that at
  * 840B-token scale is ~2 GB x shards), the vocab rides in as a
  * broadcast set, and only the filtered rows (vocab-bounded) are
  * collected — the full embedding file never reaches the driver.
  */
object Glove {

  /** One GloVe text line: `word v1 v2 ... vd` (space-separated). Returns
    * None for malformed/wrong-dimension lines (the 840B file has a few
    * multi-token keys; the reference's split(' ') keeps dim-mismatched
    * lines out of the vocab filter the same way).
    */
  def parseLine(line: String, dim: Int): Option[(String, Array[Float])] = {
    val parts = line.split(" ", -1)
    if (parts.length != dim + 1) None
    else try Some((parts(0), {
      val v = new Array[Float](dim)
      var i = 0
      while (i < dim) { v(i) = parts(i + 1).toFloat; i += 1 }
      v
    })) catch { case _: NumberFormatException => None }
  }

  /** Vocab-filtered embedding table as a DataFrame (word, embedding) —
    * write it to parquet once and re-read per run instead of re-scanning
    * the text file.
    */
  def toTable(spark: SparkSession, glovePath: String,
      vocab: Seq[String], dim: Int): DataFrame = {
    import spark.implicits._
    val bVocab = spark.sparkContext.broadcast(vocab.toSet)
    val d = dim
    spark.read.textFile(glovePath)
      .flatMap(l => parseLine(l, d))
      .filter(r => bVocab.value.contains(r._1))
      .toDF("word", "embedding")
  }

  /** Aligned (vocabIndex, matrix) in reference layout: row i = embedding
    * of vocab(i) (zeros when the word is missing from the file, like the
    * notebook's zero-initialized matrix), final extra row = the OOV
    * zeros that `word_embeddings.py:26` vstacks. Plugs directly into
    * [[graft.tag.LinearScorer]] / [[graft.tag.BiLstmCrfScorer]].
    */
  def loadMatrix(spark: SparkSession, glovePath: String,
      vocab: Seq[String], dim: Int): (Map[String, Int], Array[Array[Float]]) =
    matrixFromTable(toTable(spark, glovePath, vocab, dim), vocab, dim)

  /** Embedding table (from [[toTable]] or re-read from parquet) to the
    * aligned matrix: row i = vocab(i)'s embedding (zeros when missing),
    * extra final row = the OOV zeros.
    */
  def matrixFromTable(table: DataFrame, vocab: Seq[String],
      dim: Int): (Map[String, Int], Array[Array[Float]]) = {
    val found = table.select(col("word"), col("embedding")).collect()
      .map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Float]](1).toArray)
      .toMap
    val index = vocab.zipWithIndex.toMap
    val matrix = Array.tabulate(vocab.length + 1) { i =>
      if (i < vocab.length) found.getOrElse(vocab(i), new Array[Float](dim))
      else new Array[Float](dim)
    }
    (index, matrix)
  }
}
