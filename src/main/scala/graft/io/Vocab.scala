package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vocabulary extraction + term-per-line codec (SURVEY §2.1 S6, §2.4
  * A2): term -> contiguous id, OOV id = size (the reference's
  * `index_table_from_file` with one OOV bucket).
  */
object Vocab {

  /** Distinct terms of a column with counts, ordered by (count desc,
    * term) for deterministic ids.
    */
  def build(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column).as("term"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))

  /** Load a reference vocab file (term per line, id = line index). */
  def loadFile(path: String): Map[String, Int] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().zipWithIndex.toMap
    finally src.close()
  }

  /** Lookup with OOV bucket = size (reference semantics). */
  def indexOf(vocab: Map[String, Int], term: String): Int =
    vocab.getOrElse(term, vocab.size)
}
