package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only phase isolation bench (guide §1.4): times sub-phases of the
  * expensive suite queries through the noop sink so the computation is
  * measured without the bench's full-materialization sink or the
  * query's outer orderBy. NOT part of the driver contract — Bench.scala
  * is the frozen measurement surface; numbers from here are cited in
  * OPTIMIZATION_r08.md as isolation evidence only.
  *
  * Usage: sbt "runMain graft.BenchExtra [phase ...]"
  *   (no args = all phases; SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in
  *   Bench)
  */
object BenchExtra {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String): DataFrame = graft.io.Tables.table(spark, sfDir, name)

    // each phase: () => Unit that fully materializes its computation
    val phases: Seq[(String, () => Unit)] = Seq(
      "docs_scan" -> (() => noop(t("documents"))),
      "canon_names" -> (() => {
        noop(t("documents")
          .select(explode(split(col("text"), " ")).as("name"))
          .filter(length(col("name")) > 0)
          .groupBy("name").agg(count(lit(1)).as("support")))
      }),
      "canon_full" -> (() => noop(SparkEntry.queries("kg_canonicalize")(spark, sfDir))),
      "mh_pairs_1x" -> (() => {
        val d = t("documents").select("doc_id", "text")
        noop(graft.ops.Dedup.minhashLshPairs(spark, d, minJaccard = 0.7))
      }),
      "mh_pairs_3x" -> (() => {
        val d = t("documents").select("doc_id", "text")
        val p1 = d.select((col("doc_id") + lit(1099511627776L)).as("doc_id"), col("text"))
        val p2 = d.select((col("doc_id") + lit(2199023255552L)).as("doc_id"), col("text"))
        noop(graft.ops.Dedup.minhashLshPairs(spark,
          d.unionByName(p1).unionByName(p2), minJaccard = 0.7)
          .filter(col("id_b") === col("id_a") + lit(1099511627776L)))
      }),
      "clusters_full" -> (() => noop(SparkEntry.queries("doc_dedup_clusters")(spark, sfDir))),
      "lloyd_fit2" -> (() => {
        val e = t("embeddings").select("vec_id", "embedding")
        graft.ops.Similarity.fitQuantizerLloyd(spark, e, nlist = 8, iters = 2)
        ()
      }),
      "lloyd_fit2_union" -> (() => {
        val e = t("embeddings").select("vec_id", "embedding")
        val planted = e.select((col("vec_id") + lit(1099511627776L)).as("vec_id"),
          col("embedding"))
        graft.ops.Similarity.fitQuantizerLloyd(spark, e.unionByName(planted),
          nlist = 8, iters = 2)
        ()
      }),
      "sem_pairs_only" -> (() => {
        // semanticDedup's pair stage without the CC/keeper tail:
        // fit + unit-normalize + within-cell join at tau
        val e = t("embeddings").select("vec_id", "embedding")
        val planted = e.select((col("vec_id") + lit(1099511627776L)).as("vec_id"),
          col("embedding"))
        val corpus = e.unionByName(planted)
        val bc = graft.ops.Similarity.fitQuantizerLloyd(spark, corpus,
          nlist = 16, iters = 2)
        val centroidsLit = typedlit(bc.value.map(_.toSeq).toSeq)
        val nrm = graft.ops.Similarity.normCol(col("embedding"))
        val safe = when(nrm > 0, nrm).otherwise(lit(1.0))
        val unit = corpus.filter(col("embedding").isNotNull)
          .select(col("vec_id").cast("long").as("id"),
            zip_with(col("embedding"),
              array_repeat(safe, size(col("embedding"))),
              (x, n) => (x / n).cast("float")).as("e"),
            call_function("ivf_cell", col("embedding"), centroidsLit).as("cell"))
        val a = unit.select(col("cell"), col("id").as("id_a"), col("e").as("e_a"))
        val b = unit.select(col("cell"), col("id").as("id_b"), col("e").as("e_b"))
        noop(a.join(b, "cell")
          .filter(col("id_a") < col("id_b") &&
            graft.ops.Similarity.dotCol(col("e_a"), col("e_b")) >= 0.75)
          .select("id_a", "id_b"))
      }),
      "self_top1_full" -> (() => noop(SparkEntry.queries("ann_self_top1")(spark, sfDir))),
      "self_exh_full" -> (() => noop(SparkEntry.queries("ann_self_exhaustive_topk")(spark, sfDir))),
      "sem_dedup_full" -> (() => noop(SparkEntry.queries("dedup_semantic")(spark, sfDir))),
      "entity_pr_full" -> (() => noop(SparkEntry.queries("kg_entity_pagerank")(spark, sfDir))),
      "entity_pr_triples" -> (() => {
        val varied = t("documents").select(
          col("doc_id"), col("source"), col("lang"),
          expr("""array_join(transform(split(text, ' '), (t, i) ->
            CASE WHEN i % 31 = 5 THEN 'zzjohn'
                 WHEN i % 31 = 6 THEN 'zzdoe'
                 WHEN i % 31 = 20 THEN 'zzann'
                 ELSE t END), ' ')""").as("text"))
        val pages = graft.corpus.SynthPages.fromDocuments(spark, varied)
        val sents = graft.spark.ExtractStage.sentences(spark, pages,
          targetNamesFn = Some((_: String) => Seq("zzjohn zzdoe", "zzann")))
        val mentions = graft.kg.Triples.goldMentions(spark, sents)
        noop(graft.kg.Triples.fromMentions(spark, mentions).toDF())
      }),
      "gazetteer_full" -> (() => noop(SparkEntry.queries("kg_gazetteer")(spark, sfDir))),
      "stream_files_full" -> (() => noop(SparkEntry.queries("stream_first_seen_files")(spark, sfDir))),
      "stream_mem_full" -> (() => noop(SparkEntry.queries("stream_first_seen")(spark, sfDir))),
      "substr_full" -> (() => noop(SparkEntry.queries("doc_substring_dedup")(spark, sfDir))),
      "mm_resize_full" -> (() => noop(SparkEntry.queries("mm_resize_real")(spark, sfDir)))
    )
    // job census: how much of a phase is scheduled-job count vs data —
    // the per-job floor dominates toy-scale queries (guide §1: know
    // where the time goes before touching anything)
    val jobCount = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
      })
    val want = args.toSet
    val sel = if (want.isEmpty) phases else phases.filter(p => want(p._1))
    val out = sel.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"extra:$name")
      def once(): (Double, Long) = {
        val j0 = jobCount.get()
        val t0 = System.nanoTime()
        fn()
        ((System.nanoTime() - t0) / 1e9, jobCount.get() - j0)
      }
      val (s1, j1) = once(); val (s2, j2) = once()
      spark.sparkContext.setJobDescription(null)
      f""""$name":{"sec":[${s1}%.3f,${s2}%.3f],"jobs":[$j1,$j2]}"""
    }
    println("EXTRA " + out.mkString("{", ",", "}"))
    spark.stop()
  }
}
