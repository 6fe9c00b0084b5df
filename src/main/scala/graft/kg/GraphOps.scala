package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** Graph analytics over the materialized KG edge tables — the query
  * layer a knowledge-graph construction pipeline feeds (north star:
  * "materializing node/edge Iceberg tables"; these operators consume
  * them). The reference repo stops at triple emission; ranking /
  * degree / reachability over the built graph is the standard next
  * query a KG serves, so it is implemented here as first-class
  * DataFrame operators with explicit shuffle accounting.
  *
  * All three operators take a generic `(src, dst)` edge DataFrame —
  * canonical entity edges from [[Canonicalize.canonicalEdges]], the
  * token co-occurrence graph from [[GraphOps.bigramEdges]] (the
  * TextRank shape, Mihalcea & Tarau 2004), or any edge table.
  *
  * Determinism contract (the same one `SparkEntry.dsum` uses): every
  * floating-point SUM in [[pagerank]] runs through exact DECIMAL
  * aggregation, so partial-aggregation order — which changes with
  * partition count — cannot change the result. PageRank here is
  * bit-reproducible across cluster sizes (the N vs 4N identical-output
  * evidence in BASELINE.md rests on exactly this property).
  */
object GraphOps {

  /** Directed token co-occurrence edges (w_i -> w_{i+1}) with counts.
    * Shift-and-zip (`zip_with(w, slice(w, 2, n))`) builds the pairs
    * without a posexplode self-join; the only shuffle is the final
    * (src, dst) groupBy. zip_with pads the shorter side with NULL, so
    * the trailing (last_token, NULL) pair is filtered before explode —
    * single-token and empty docs contribute no edges.
    */
  def bigramEdges(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = split(col(textCol), " ")
    val pairs = filter(
      zip_with(w, slice(w, lit(2), size(w)),
        (a, b) => struct(a.as("src"), b.as("dst"))),
      p => p.getField("dst").isNotNull)
    docs
      .select(explode(pairs).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("weight"))
  }

  /** Per-node out/in degree over the DISTINCT edge set (edges are
    * assumed deduplicated per (src, dst), as [[bigramEdges]] emits).
    * Two map-side-combinable groupBys + one full outer merge on node —
    * no row ever carries more than (node, long), so the shuffle is a
    * few bytes per node regardless of corpus size.
    */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Fixed-iteration PageRank as iterative DataFrame joins:
    *
    *   pr_0(v)   = 1/N
    *   pr_t+1(v) = round((1-d)/N + d * S_t(v), scale)
    *   S_t(v)    = Σ_{u→v} decimal(round(pr_t(u)/outdeg(u), scale))
    *
    * Dangling mass (nodes with no out-edges) is NOT redistributed —
    * total rank leaks by the dangling fraction per iteration. That is
    * a deliberate, documented semantics choice: it keeps each
    * iteration a single contribution join + one aggregation, and the
    * oracle replicates it exactly.
    *
    * Scale shape (per iteration): the edge⋈rank join shuffles only the
    * rank side — `eo` is repartitioned on src ONCE and cached, and
    * InMemoryRelation preserves that HashPartitioning, so Catalyst
    * reuses it across all iterations. The contribution aggregation
    * shuffles (dst, decimal) pairs — map-side combinable, a few bytes
    * per edge partition per reducer. Hot dst nodes (celebrity
    * entities) are exactly the partial-aggregation case: each map task
    * pre-sums its contributions, so a 10^8-in-degree node receives one
    * row per map task, not per edge. For iteration counts beyond ~10,
    * pass `checkpointEvery` to cut the growing lineage with an eager
    * localCheckpoint.
    *
    * Determinism: contributions are rounded to `scale` decimal places
    * (an IEEE double op, identical everywhere), then summed as
    * DECIMAL(38,15) — exact, order-independent — so the result is
    * bit-identical at any parallelism. DuckDB replicates the same
    * arithmetic; `kg_pagerank` is hash-oracled.
    *
    * `seeds` switches to PERSONALIZED PageRank (topic-sensitive
    * salience — "entities important relative to THESE"): the reset
    * mass (1-d) concentrates uniformly on the seed set instead of
    * spreading 1/N everywhere, and the walk starts from the seeds.
    * Same arithmetic contract; `kg_ppr` is hash-oracled.
    *
    * `weighted = true` splits each node's outgoing rank proportionally
    * to the LONG `weight` edge column instead of uniformly (the
    * TextRank formulation — co-occurrence counts as transition mass):
    * contribution = round(rank * w / Σw_out, scale), with Σw_out an
    * exact long sum. Same determinism; `kg_pagerank_weighted` is
    * hash-oracled.
    */
  def pagerank(spark: SparkSession, edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85, scale: Int = 12,
      checkpointEvery: Int = Int.MaxValue,
      seeds: Option[Seq[String]] = None,
      weighted: Boolean = false): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct()
      .repartition(col("node"))
      .cache()
    val n = nodes.count()
    val outdeg =
      if (weighted) edges.groupBy("src").agg(sum(col("weight")).as("outdeg"))
      else edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // edge ⋈ outdeg once, up front; cached partitioned on src so each
    // iteration's rank join reuses the partitioning (rank side shuffles,
    // edges do not).
    val eCols = if (weighted) Seq("src", "dst", "weight") else Seq("src", "dst")
    val eo = edges.select(eCols.map(col): _*).join(outdeg, "src")
      .repartition(col("src"))
      .cache()
    val (base, init) = seeds match {
      case None =>
        (lit((1.0 - damping) / n), lit(1.0 / n))
      case Some(s) =>
        require(s.nonEmpty, "personalized pagerank needs ≥1 seed")
        val inSeed = col("node").isin(s.distinct: _*)
        val nS = s.distinct.size
        (when(inSeed, lit((1.0 - damping) / nS)).otherwise(lit(0.0)),
          when(inSeed, lit(1.0 / nS)).otherwise(lit(0.0)))
    }
    var pr = nodes.select(col("node"), init.as("rank"))
    for (i <- 1 to iters) {
      val share =
        if (weighted) col("rank") * col("weight") / col("outdeg")
        else col("rank") / col("outdeg")
      val contrib = eo.join(pr, eo("src") === pr("node"))
        .select(col("dst"),
          round(share, scale).cast(DecimalType(38, 15)).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          round(base + lit(damping) *
            coalesce(col("s").cast("double"), lit(0.0)), scale).as("rank"))
      if (i % checkpointEvery == 0) pr = pr.localCheckpoint(true)
    }
    // materialize the final ranks (one (node, double) row per node),
    // then free the iteration caches — without this every pagerank
    // call pins its edge⋈outdeg table in executor memory for the life
    // of the session
    val out = pr.localCheckpoint(true)
    nodes.unpersist(blocking = false)
    eo.unpersist(blocking = false)
    out
  }

  /** Triangle count per node over the UNDIRECTED simple graph induced
    * by the edge list (direction and weight dropped, self-loops
    * removed). Classic compact-forward: orient every undirected edge
    * from the lower-(degree, node) endpoint to the higher one — each
    * triangle then has exactly ONE wedge of two out-edges at its
    * lowest vertex, so one wedge self-join + one edge-membership
    * semi-join counts each triangle once. The degree ordering is the
    * scale lever: a hub's edges all point INTO it, so the wedge join
    * fans out on low-degree vertices only — a 10^6-degree celebrity
    * node contributes ZERO wedges instead of 10^12.
    */
  def triangles(spark: SparkSession, edges: DataFrame): DataFrame = {
    // undirected simple edges as canonical (lo, hi) pairs
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient u->v iff (deg, name) of u < (deg, name) of v
    val du = deg.select(col("node").as("u"), col("deg").as("du"))
    val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
    val oriented = und.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    // wedges at the lowest-ordered vertex; close them against the
    // oriented edge set
    val w1 = oriented.select(col("s"), col("t").as("x"))
    val w2 = oriented.select(col("s"), col("t").as("y"))
    val wedges = w1.join(w2, "s").filter(col("x") < col("y"))
    val closed = wedges.join(
      oriented.select(col("s").as("x"), col("t").as("y"))
        .unionByName(oriented.select(col("t").as("x"), col("s").as("y"))),
      Seq("x", "y"), "left_semi")
    // per-node counts: each closed wedge (s, x, y) is one triangle on
    // all three vertices
    closed.select(explode(array(col("s"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-iteration single-source shortest paths (Bellman-Ford /
    * min-plus relaxation, the Pregel textbook shape) over weighted
    * edges (src, dst, weight:long). `iters` relaxation rounds bound
    * the path length — distances to nodes further than `iters` hops
    * are not final (documented; run V-1 rounds for the full
    * fixed point). Each round is one frontierless relaxation:
    * dist ⋈ edges on src (the rank-join shape of [[pagerank]], same
    * exchange-reuse caching applies upstream), then a min-merge on
    * dst. All-long arithmetic — exact, order-independent, oracled by
    * unrolled SQL.
    */
  def shortestPaths(spark: SparkSession, edges: DataFrame, source: String,
      iters: Int): DataFrame = {
    import spark.implicits._
    var dist = Seq(source).toDF("node").select(col("node"),
      lit(0L).as("dist"))
    for (_ <- 1 to iters) {
      val relaxed = edges.join(dist, edges("src") === dist("node"))
        .select(col("dst").as("node"),
          (col("dist") + col("weight")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
    }
    dist
  }

  /** Synchronous label-propagation community detection (Raghavan et
    * al. 2007, the deterministic variant) over the UNDIRECTED graph:
    * every node starts in its own community (label = own name); each
    * round it adopts the most frequent label among its neighbors,
    * breaking frequency ties by SMALLEST label — the determinism
    * device that makes the synchronous schedule reproducible and
    * SQL-replicable (classic LPA breaks ties randomly; any fixed
    * total order gives the same convergence guarantees).
    *
    * Scale shape per round: one join of the (node, label) table
    * against the undirected edge list (shuffles the label side — the
    * same rank-join shape as [[pagerank]]), one map-side-combinable
    * (node, label) count, and one per-node argmax window over ≤
    * distinct-neighbor-labels rows. All string/long ops — exact at any
    * parallelism; `kg_communities` is hash-oracled via unrolled SQL.
    */
  def labelPropagation(spark: SparkSession, edges: DataFrame,
      rounds: Int): DataFrame = {
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    val both = und.select(col("u").as("nbr"), col("v").as("node"))
      .unionByName(und.select(col("v").as("nbr"), col("u").as("node")))
      .cache()
    var labels = both.select(col("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      val counts = both.join(labels.withColumnRenamed("node", "nbr"), "nbr")
        .groupBy("node", "label").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("node")
        .orderBy(col("cnt").desc, col("label").asc)
      labels = counts
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("node"), col("label"))
    }
    val out = labels.localCheckpoint(true)
    both.unpersist(blocking = false)
    out
  }

  /** Minimum-distance BFS from `seeds`, out to `hops` edge hops.
    * Returns (node, dist) for every node reachable within `hops`
    * (seeds at dist 0). Frontier-only expansion: iteration h joins
    * edges against ONLY the dist=h-1 frontier (not the whole visited
    * set), then a min-merge collapses revisits — the same
    * frontier/visited split every distributed BFS uses, so work per
    * iteration is O(frontier ⋈ edges), not O(visited ⋈ edges).
    */
  def nhop(spark: SparkSession, edges: DataFrame, seeds: Seq[String],
      hops: Int): DataFrame = {
    import spark.implicits._
    var dist = seeds.toDF("node").distinct()
      .select(col("node"), lit(0).as("dist"))
    for (h <- 1 to hops) {
      val frontier = dist.filter(col("dist") === (h - 1))
      val next = edges.join(frontier, edges("src") === frontier("node"))
        .select(col("dst").as("node"), lit(h).as("dist"))
      dist = dist.union(next)
        .groupBy("node").agg(min(col("dist")).as("dist"))
    }
    dist
  }
}
