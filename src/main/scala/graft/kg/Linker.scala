package graft.kg

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor

/** Entity-linking candidate generation (SURVEY §2.3 J4, north star:
  * "MinHash-LSH blocking + broadcast alias-dictionary scoring").
  *
  * Names are normalized with the reference accent-folding, shingled into
  * character 3-grams, MinHash-bucketed, and candidate pairs come from the
  * LSH `approxSimilarityJoin` — a bounded shuffle keyed by band hashes
  * (never the full cross product). A broadcast alias dictionary links
  * known aliases directly (hash semi-join against a broadcast map — no
  * shuffle at all for the dictionary path).
  */
object Linker {

  /** Reference-semantics normalization: lower + strip + accent fold. */
  def normalize(name: String): String = Extractor.removeAccents(name)

  /** Character 3-gram shingles of a normalized name (space-padded). */
  def shingles(norm: String): Seq[String] = {
    val padded = " " + norm + " "
    if (padded.length < 3) Seq(padded)
    else (0 to padded.length - 3).map(i => padded.substring(i, i + 3)).distinct
  }

  /** Distinct names with support counts — the linking working set is the
    * name vocabulary (much smaller than the mention stream).
    */
  def nameVocab(spark: SparkSession, triples: Dataset[graft.spark.Triple]): DataFrame =
    triples.groupBy(col("obj").as("name"))
      .agg(count(lit(1)).as("support"))

  private val normUdf = udf((s: String) => normalize(s))
  private val shinglesUdf = udf((s: String) => shingles(s))

  /** LSH candidate pairs (nameA < nameB) with Jaccard distance below
    * `maxDistance`. numHashTables trades recall vs shuffle width.
    */
  def candidatePairs(spark: SparkSession, names: DataFrame,
      maxDistance: Double = 0.5, numHashTables: Int = 5,
      numFeatures: Int = 1 << 18): DataFrame = {
    val prepared = names
      .withColumn("norm", normUdf(col("name")))
      .withColumn("grams", shinglesUdf(col("norm")))
      .filter(size(col("grams")) > 0)

    val tf = new HashingTF().setInputCol("grams").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
    val feat = tf.transform(prepared)

    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42)
    val model = lsh.fit(feat)

    model.approxSimilarityJoin(feat, feat, maxDistance, "dist")
      .filter(col("datasetA.name") < col("datasetB.name"))
      .select(
        col("datasetA.name").as("name_a"),
        col("datasetB.name").as("name_b"),
        col("dist"))
  }

  /** Direct links via a broadcast alias dictionary: alias-normal-form ->
    * canonical name. Pure map lookup inside the executors (broadcast
    * hash semi-join).
    */
  def aliasLinks(spark: SparkSession, names: DataFrame,
      aliasDict: Broadcast[Map[String, String]]): DataFrame = {
    val lookup = udf((norm: String) => aliasDict.value.get(norm))
    names
      .withColumn("norm", normUdf(col("name")))
      .withColumn("canonical", lookup(col("norm")))
      .filter(col("canonical").isNotNull && col("canonical") =!= col("name"))
      .select(
        least(col("name"), col("canonical")).as("name_a"),
        greatest(col("name"), col("canonical")).as("name_b"),
        lit(0.0).as("dist"))
  }

  /** Exact-normal-form links: names whose normalization collides are the
    * same entity (accent/case variants). Chain-paired via `lead()` over
    * a (norm, name) sort — sorted-adjacent neighbors connect the whole
    * variant group for the downstream connected components exactly like
    * a star pairing would, but with NO `collect_list` row: a degenerate
    * normal form shared by millions of names streams through the
    * spillable external sort (O(n) pairs, O(1) state per row) instead
    * of materializing one unbounded aggregation row. Same discipline as
    * `Dedup.boundedBucketPairs`'s hot-bucket branch.
    */
  def exactNormLinks(spark: SparkSession, names: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("norm").orderBy("name")
    names
      .withColumn("norm", normUdf(col("name")))
      .withColumn("next_name", lead(col("name"), 1).over(w))
      .filter(col("next_name").isNotNull)
      .select(
        least(col("name"), col("next_name")).as("name_a"),
        greatest(col("name"), col("next_name")).as("name_b"),
        lit(0.0).as("dist"))
  }
}
