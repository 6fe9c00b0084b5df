package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fnv1a64

/** Deduplication family for large-scale training-data pipelines: exact
  * (content-hash groupBy), word-set Jaccard, MinHash+LSH near-dup
  * (shingle -> minhash -> band -> bucket join), and SimHash. Every
  * variant is one or two bounded shuffles; nothing ever builds the full
  * cross product.
  *
  * Hot buckets (boilerplate-heavy corpora concentrate mass in a few
  * band keys) are neither exploded quadratically nor silently dropped:
  * buckets over `maxBucket` switch from all-pairs to CHAIN pairing —
  * members sorted by a content key, each member paired with its next
  * `hotChain` neighbors. That bounds the work at O(n*hotChain) per
  * bucket and keeps the bucket CONNECTED for transitive
  * connected-component dedup. Recall guarantees inside a hot bucket:
  * BYTE-IDENTICAL documents share the content key and sort adjacent,
  * so exact-copy pairs always survive; merely near-identical pairs
  * sort at unrelated positions (the key is an avalanche hash of the
  * full signature) and are found only with ~hotChain/bucket
  * probability — which is why every function reports
  * (buckets, hot_buckets, max_bucket) through an [[Observation]]: a
  * non-zero hot_buckets count is the signal to split the key space
  * (more bands / more bits) rather than trust hot-bucket recall.
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

  /** Per-pair slice length for the bucket expansion: all remaining
    * members when the bucket is within `maxBucket`, else the next
    * `hotChain` members of the sorted bucket (chain pairing).
    */
  private def sliceLenSql(arr: String, maxBucket: Int, hotChain: Int): String =
    s"IF(size($arr) <= $maxBucket, size($arr) - i - 1, " +
      s"least($hotChain, size($arr) - i - 1))"

  /** Attach the hot-bucket observation to a buckets frame. */
  private def observed(buckets: DataFrame, maxBucket: Int,
      metrics: Option[Observation]): DataFrame = metrics match {
    case None => buckets
    case Some(obs) => buckets.observe(obs,
      count(lit(1)).as("buckets"),
      sum(when(size(col("members")) > maxBucket, 1L).otherwise(0L))
        .as("hot_buckets"),
      max(size(col("members"))).as("max_bucket"))
  }

  /** Distinct word n-grams of a text as a column. Texts shorter than n
    * fall back to the whole text, mirroring [[shingleHashes]].
    *
    * Built by shift-and-zip — gram i = w(i) ++ w(i+1) ++ ... — NOT by
    * `transform(sequence(...), i -> slice(w, i, n))`: higher-order
    * functions evaluate expressions referenced inside the lambda once
    * PER ELEMENT, so the slice formulation re-split the text ~len
    * times per row (the same trap as the removed aggregate(zip_with)
    * dot product). Here every `w` reference sits outside the lambdas
    * and evaluates once per row; zip_with's null padding marks the
    * truncated tail grams, which are filtered.
    */
  def ngramSet(text: Column, n: Int): Column = {
    val w = split(text, " ")
    val grams = (1 until n).foldLeft(w) { (acc, k) =>
      zip_with(acc, slice(w, lit(k + 1), size(w)),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(w) < n, array(text))
      .otherwise(array_distinct(filter(grams, g => g.isNotNull)))
  }

  /** Word n-gram Jaccard similarity between explicit candidate pairs —
    * the exact verify metric behind the MinHash estimate.
    */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = ngramSet(a, n)
    val sb = ngramSet(b, n)
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  // --- MinHash + LSH ----------------------------------------------------

  /** Word w-shingles of a text (distinct, hashed to longs) — the
    * native `minhash_sig` expression's kernel, re-exported for direct
    * use and tests.
    */
  def shingleHashes(text: String, w: Int): Array[Long] =
    graft.functions.MinhashSig.shingles(text, w)

  /** k-permutation minhash signature (see [[shingleHashes]]). */
  def minhashSignature(shingles: Array[Long], k: Int): Array[Long] =
    graft.functions.MinhashSig.signature(shingles, k)

  /** Near-duplicate candidate pairs via banded MinHash LSH:
    * shingle -> k-minhash -> b bands of r rows -> groupBy band key ->
    * within-bucket pairs -> Jaccard-verified. The shuffle is keyed by
    * (band index, band hash); buckets over `maxBucket` switch to chain
    * pairing on the full-signature hash (byte-identical docs adjacent;
    * see the class doc for what hot-bucket recall does and does not
    * guarantee), so a hot key is bounded AND still connected.
    */
  def minhashLshPairs(spark: SparkSession, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      w: Int = 3, bands: Int = 16, rows: Int = 4,
      minJaccard: Double = 0.7, maxBucket: Int = 1000, hotChain: Int = 4,
      metrics: Option[Observation] = None): DataFrame = {
    import spark.implicits._
    val k = bands * rows
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
    // Texts never enter the band shuffle: the banded stream is
    // (id, sighash, band, bandkey) — 4 numeric columns — so the LSH
    // exchange moves ~32 bytes x bands per document instead of `bands`
    // full copies of every text (the difference between a bounded
    // shuffle and re-shuffling the corpus 16x at 100 TB). Signatures
    // come from the native codegen `minhash_sig` expression: no row
    // deserialization into a typed Dataset for the hash stage.
    graft.functions.GraftFunctions.register(spark)
    val sigs = base.select(col("id"),
      call_function("minhash_sig", col("text"), lit(w), lit(k)).as("sig"))

    val banded = sigs.select(col("id"), hash(col("sig")).as("sighash"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> hash(slice(sig, b * $rows + 1, $rows)))")))
      .toDF("id", "sighash", "band", "bandkey")

    val buckets = observed(banded
      .groupBy("band", "bandkey")
      .agg(array_sort(collect_list(struct(col("sighash"), col("id"))))
        .as("members"))
      .filter(size(col("members")) >= 2), maxBucket, metrics)

    // sort by (sighash, id): in a hot bucket, byte-identical documents
    // share a sighash and sort adjacent, so chain pairing still finds
    // every exact-duplicate pair
    val candidates = buckets.select(explode(expr(
      s"""flatten(transform(members, (m, i) ->
        |  transform(slice(members, i + 2,
        |      ${sliceLenSql("members", maxBucket, hotChain)}),
        |    o -> struct(least(m.id, o.id) as id_a,
        |                greatest(m.id, o.id) as id_b))))""".stripMargin))
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
    * candidate set; norms precomputed per row. Buckets over `maxBucket`
    * chain-pair on the embedding hash (exact copies sort adjacent), so
    * clustered corpora stay bounded without losing exact-duplicate
    * recall — see the class doc.
    */
  def embeddingCosinePairs(spark: SparkSession, embeddings: DataFrame,
      minCosine: Double, nBits: Int = 6, maxBucket: Int = 500,
      hotChain: Int = 4, metrics: Option[Observation] = None): DataFrame = {
    import org.apache.spark.sql.functions.udf
    val sigUdf = udf((v: Seq[Float]) => Similarity.srpSignature(v, nBits))
    val b = embeddings.select(col("vec_id").cast("long").as("id"),
        col("embedding"))
      .withColumn("bucket", sigUdf(col("embedding")))
      .withColumn("norm", Similarity.normCol(col("embedding")))
    val buckets = observed(b.groupBy("bucket")
      .agg(array_sort(collect_list(struct(hash(col("embedding")).as("ekey"),
          col("id"), col("embedding"), col("norm"))))
        .as("members"))
      .filter(size(col("members")) >= 2), maxBucket, metrics)
    graft.functions.GraftFunctions.register(spark)
    buckets.select(explode(expr(
      s"""flatten(transform(members, (m, i) ->
        |  transform(slice(members, i + 2,
        |      ${sliceLenSql("members", maxBucket, hotChain)}),
        |    o -> struct(least(m.id, o.id) as id_a, greatest(m.id, o.id) as id_b,
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
    * for 16-bit blocks), verify hamming <= maxHamming. The in-bucket
    * expansion is bounded like the MinHash path: buckets over
    * `maxBucket` chain-pair on the full simhash (nearby hashes sort
    * adjacent), so one degenerate 16-bit key (e.g. a corpus of empty or
    * template-identical texts) costs O(n*hotChain), not O(n^2).
    */
  def simhashPairs(spark: SparkSession, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      maxHamming: Int = 3, maxBucket: Int = 1000, hotChain: Int = 4,
      metrics: Option[Observation] = None): DataFrame = {
    import spark.implicits._
    // native codegen simhash: the hash stays inside the whole-stage
    // generated loop over the scan — no row deserialization, no
    // String.split, no per-row array allocations (the Dataset-map
    // formulation paid all three)
    graft.functions.GraftFunctions.register(spark)
    val hashed = docs.select(col(idCol).cast("long").as("id"),
      call_function("simhash64", col(textCol)).as("simhash"))
    val blocked = hashed.select(col("id"), col("simhash"),
      explode(expr("transform(sequence(0, 3), b -> " +
        "struct(b as blk, shiftright(simhash, b * 16) & 65535 as key))")).as("e"))
      .select(col("id"), col("simhash"), col("e.blk"), col("e.key"))
    val buckets = observed(blocked
      .groupBy("blk", "key")
      .agg(array_sort(collect_list(struct(col("simhash"), col("id"))))
        .as("members"))
      .filter(size(col("members")) >= 2), maxBucket, metrics)
    val pairs = buckets.select(explode(expr(
      s"""flatten(transform(members, (m, i) ->
        |  transform(slice(members, i + 2,
        |      ${sliceLenSql("members", maxBucket, hotChain)}),
        |    o -> struct(least(m.id, o.id) as id_a, greatest(m.id, o.id) as id_b,
        |                m.simhash as sh_a, o.simhash as sh_b))))""".stripMargin))
      .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.sh_a"), col("p.sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
