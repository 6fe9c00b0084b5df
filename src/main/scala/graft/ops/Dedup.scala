package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fnv1a64

/** Deduplication family for large-scale training-data pipelines: exact
  * (content-hash groupBy), word-set Jaccard, MinHash+LSH near-dup
  * (shingle -> minhash -> band -> bucket join), and SimHash. Every
  * variant is one or two bounded shuffles; nothing ever builds the full
  * cross product.
  */
object Dedup {

  /** Exact dedup on a content digest: one shuffle on the digest. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("copies"))

  /** Word-set Jaccard similarity between explicit candidate pairs. */
  def jaccard(a: Column, b: Column): Column = {
    val sa = array_distinct(split(a, " "))
    val sb = array_distinct(split(b, " "))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  // --- MinHash + LSH ----------------------------------------------------

  /** Word w-shingles of a text (distinct, hashed to longs). */
  def shingleHashes(text: String, w: Int): Array[Long] = {
    val words = text.split(" ")
    if (words.length < w) Array(Fnv1a64.hashString(text))
    else (0 to words.length - w).iterator
      .map(i => Fnv1a64.hashString(words.slice(i, i + w).mkString(" ")))
      .toArray.distinct
  }

  /** k-permutation minhash signature via the (a*x+b) universal-hash
    * trick — deterministic seeds.
    */
  def minhashSignature(shingles: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var p = 0
    while (p < k) {
      val a = 0x9e3779b97f4a7c15L * (2 * p + 1)
      val b = 0xbf58476d1ce4e5b9L * (p + 1)
      var i = 0
      var mn = Long.MaxValue
      while (i < shingles.length) {
        val h = a * shingles(i) + b
        if (h < mn) mn = h
        i += 1
      }
      sig(p) = mn
      p += 1
    }
    sig
  }

  /** Near-duplicate candidate pairs via banded MinHash LSH:
    * shingle -> k-minhash -> b bands of r rows -> groupBy band key ->
    * within-bucket pairs -> Jaccard-verified. The shuffle is keyed by
    * (band index, band hash); hot buckets are bounded by `maxBucket`
    * (skipped + counted rather than exploding quadratically).
    */
  def minhashLshPairs(spark: SparkSession, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      w: Int = 3, bands: Int = 16, rows: Int = 4,
      minJaccard: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    import spark.implicits._
    val k = bands * rows
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
    // Texts never enter the band shuffle: the banded stream is
    // (id, band, bandkey) — 3 numeric columns — so the LSH exchange
    // moves ~24 bytes x bands per document instead of `bands` full
    // copies of every text (the difference between a bounded shuffle
    // and re-shuffling the corpus 16x at 100 TB).
    val sigs = base.as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, minhashSignature(shingleHashes(text, w), k))
      })
      .toDF("id", "sig")

    val banded = sigs.select(col("id"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> hash(slice(sig, b * $rows + 1, $rows)))")))
      .toDF("id", "band", "bandkey")

    val buckets = banded
      .groupBy("band", "bandkey")
      .agg(collect_list(col("id")).as("members"))
      .filter(size(col("members")).between(2, maxBucket))

    val candidates = buckets.select(explode(expr(
      """flatten(transform(members, (m, i) ->
        |  transform(slice(members, i + 2, size(members) - i - 1), o ->
        |    struct(least(m, o) as id_a, greatest(m, o) as id_b))))""".stripMargin))
      .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .dropDuplicates("id_a", "id_b")

    // Jaccard-verify by joining the candidate ids back to the texts:
    // near-dup candidates are a vanishing fraction of the corpus, so
    // these are two hash joins on an 8-byte key (AQE broadcasts the
    // candidate side when it is small enough).
    candidates
      .join(base.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      // duplicate ids in `docs` would fan a candidate pair out to one
      // row per (text_a, text_b) combination; keep one representative
      // per id pair like the pre-join formulation did
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  // --- embedding-cosine near-dup -----------------------------------------

  /** Near-duplicate pairs by embedding cosine: SRP-LSH buckets bound the
    * candidate set; norms precomputed per row; in-bucket verification is
    * bounded by `maxBucket` (clustered corpora can drop most vectors
    * into a handful of buckets — a production run splits hot buckets
    * with more bits / multiprobe instead of going quadratic).
    */
  def embeddingCosinePairs(spark: SparkSession, embeddings: DataFrame,
      minCosine: Double, nBits: Int = 6, maxBucket: Int = 500): DataFrame = {
    import org.apache.spark.sql.functions.udf
    val sigUdf = udf((v: Seq[Float]) => Similarity.srpSignature(v, nBits))
    val b = embeddings.select(col("vec_id").cast("long").as("id"),
        col("embedding"))
      .withColumn("bucket", sigUdf(col("embedding")))
      .withColumn("norm", Similarity.normCol(col("embedding")))
    val buckets = b.groupBy("bucket")
      .agg(collect_list(struct(col("id"), col("embedding"), col("norm")))
        .as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    graft.functions.GraftFunctions.register(spark)
    buckets.select(explode(expr(
      """flatten(transform(members, (m, i) ->
        |  transform(slice(members, i + 2, size(members) - i - 1), o ->
        |    struct(least(m.id, o.id) as id_a, greatest(m.id, o.id) as id_b,
        |      dot_f32(m.embedding, o.embedding)
        |        / (m.norm * o.norm) as cosine))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.cosine"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cosine") >= minCosine)
  }

  // --- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over word hashes (deterministic). */
  def simhash(text: String): Long = {
    val acc = new Array[Int](64)
    text.split(" ").foreach { wrd =>
      val h = Fnv1a64.hashString(wrd)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** SimHash near-dup pairs: bucket by rotated 16-bit prefixes (4
    * rotations cover any hamming distance <= 3 in at least one bucket
    * for 16-bit blocks), verify hamming <= maxHamming.
    */
  def simhashPairs(spark: SparkSession, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val hashed = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, simhash(t)) }
      .toDF("id", "simhash")
    val blocked = hashed.select(col("id"), col("simhash"),
      explode(expr("transform(sequence(0, 3), b -> " +
        "struct(b as blk, shiftright(simhash, b * 16) & 65535 as key))")).as("e"))
      .select(col("id"), col("simhash"), col("e.blk"), col("e.key"))
    val joined = blocked.as("x").join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    joined
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
