package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *  - Brute force: block-nested-loop join with the PROBE side broadcast
  *    (queries are small; the corpus side streams — no corpus shuffle),
  *    dot/cosine computed with codegen'd `zip_with`/`aggregate` higher-
  *    order functions, top-k by ranking window.
  *  - Scale path: signed-random-projection LSH — `nBits` deterministic
  *    hyperplanes bucket the corpus; probes only join their own bucket
  *    (+ optional multi-probe neighbors), bounding the pair count.
  */
object Similarity {

  /** Dot product of two float arrays as double, left-to-right (codegen
    * higher-order functions, no UDF).
    */
  def dotCol(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normCol(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  /** Brute-force top-k by dot product: corpus x broadcast(probes). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      metric: (Column, Column) => Column = dotCol): DataFrame = {
    val joined = corpus.as("c")
      .join(broadcast(probes.as("p")),
        col("c.vec_id") =!= col("p.vec_id"))
      .select(
        col("p.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        metric(col("p.embedding"), col("c.embedding")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    joined.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (bit, dim). */
  private def planeComponent(bit: Int, dim: Int): Double = {
    val h = graft.functions.Fnv1a64.hashString(s"srp:$bit:$dim")
    // map to (-1, 1)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Signed-random-projection bucket id (nBits-bit signature). */
  def srpSignature(vec: Seq[Float], nBits: Int): Int = {
    var sig = 0
    var b = 0
    while (b < nBits) {
      var s = 0.0
      var d = 0
      while (d < vec.length) {
        s += vec(d) * planeComponent(b, d)
        d += 1
      }
      if (s > 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** LSH-bucketed top-k: corpus bucketed once by SRP signature; each
    * probe joins only its bucket. Recall grows with fewer bits /
    * multi-probe; the shuffle is bounded by bucket sizes.
    */
  def lshTopK(spark: SparkSession, corpus: DataFrame, probes: DataFrame,
      k: Int, nBits: Int = 8): DataFrame = {
    import spark.implicits._
    val sigUdf = udf((v: Seq[Float]) => srpSignature(v, nBits))
    val cb = corpus.withColumn("bucket", sigUdf(col("embedding")))
    val pb = probes.withColumn("bucket", sigUdf(col("embedding")))
    val joined = cb.as("c").join(broadcast(pb.as("p")),
        col("c.bucket") === col("p.bucket") &&
        col("c.vec_id") =!= col("p.vec_id"))
      .select(
        col("p.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        dotCol(col("p.embedding"), col("c.embedding")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    joined.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
