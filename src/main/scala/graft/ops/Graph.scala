package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph scoring — the crawl-curation signal family: PageRank-style
  * centrality over an edge table, the score CommonCrawl-derived pipelines
  * use to weight domains/URLs before sampling (harmonic/PageRank
  * centrality is the standard "is this a reputable page" prior, cf. the
  * CC-Net / RefinedWeb curation stacks). Complements the dedup module's
  * connected components ([[graft.pipeline.Dedup.duplicateClusters]]):
  * components answer "which nodes are the same thing", centrality answers
  * "which nodes matter".
  *
  * Arithmetic is FIXED-POINT (long micro-units, integer division): every
  * iteration is integer-exact, so the result is bit-identical across
  * partitionings, engines, and runs — no float-sum order anywhere. The
  * cost is floor-loss per division (rank mass shrinks by < 1 unit per
  * edge per iteration — a scoring signal, not a probability
  * distribution; documented, deterministic, and identical in the DuckDB
  * oracle's unrolled spelling).
  *
  * Scale shape per iteration: one equi-join edges⋈ranks on src (both
  * sides hash-partitioned on the join key; ranks is |V| rows, edges |E|),
  * one hash aggregate on dst (map-side combinable long sums), one 1-row
  * dangling-mass aggregate broadcast back, and a left join onto the node
  * table. No cross product, no window, no driver data path; lineage is
  * cut per iteration with `localCheckpoint` exactly like the
  * connected-components loop.
  */
object Graph {

  /** Fixed-point PageRank. `edges` is a directed `(src, dst)` table
    * (longs, self-loops allowed, duplicates contribute multiplicity);
    * returns `(node, rank)` where rank is in SCALE=10^12 fixed-point
    * units (Σ rank ≈ SCALE up to floor loss).
    *
    * Per iteration, with integer division throughout:
    * {{{
    *   contrib(dst) = Σ_{(s,dst)∈E} rank(s) div outdeg(s)
    *   dangShare    = (Σ_{outdeg(s)=0} rank(s)) div N
    *   rank'(v)     = (15·(SCALE div N) + 85·(contrib(v) + dangShare)) div 100
    * }}}
    * i.e. damping 0.85 expressed as the exact rational 85/100.
    *
    * `checkpointEvery` bounds lineage depth: within a window the
    * iterations stay LAZY — one final job executes the whole chain with
    * ReuseExchange deduplicating the identical static subtrees (the
    * checkpointed edge table's exchange) — measured slightly faster than
    * checkpointing every round (8.4 vs 9.8 s warm at sf0.1 pre-subset).
    * Past the window, a `localCheckpoint` cuts the
    * (per-iteration-doubling) logical-plan growth, exactly like the CC
    * loop. */
  def pageRank(edges: DataFrame, iters: Int = 5,
               scale: Long = 1000000000000L,
               checkpointEvery: Int = 6): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val div = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      call_function("div", a, b)
    // The edge table is materialized once (localCheckpoint) and then
    // hash-joined per iteration — a slim 2-long-column shuffle per round,
    // the standard Spark PageRank cost. Exchange-ELIMINATION spellings
    // were measured and rejected at this scale: a persisted
    // repartition(src) table does satisfy the join's distribution
    // (GraphSpec pins that premise — it is the co-location lever a
    // cluster deployment gets from a bucketed edge table,
    // ops.Bucketing), but at bench scale the planner then prefers a
    // sort-based join whose per-iteration sort costs MORE than the slim
    // hash shuffle it saves (12.1 s vs 5.5 s warm at sf0.1); and a
    // checkpointed LogicalRDD reports UnknownPartitioning, so
    // checkpoint-after-repartition buys nothing.
    //
    // Round-14 re-test of the full co-location spelling (VERDICT item 1)
    // — persist(repartition(parallelism, src)) so the InMemoryRelation
    // REPORTS hashpartitioning + SHUFFLE_HASH hints so the join stays
    // sort-free — measured WORSE in every regime on this host and was
    // reverted (numbers in OPTIMIZATION_r14.md, plans in plans/r14/):
    //   · sf0.1, default broadcast threshold: 6.3 vs 5.8 s (hints
    //     suppress the planner's broadcast: forced-SHJ spellings hit
    //     10–22 s, and persisting the live lineage 36–88 s driver-side);
    //   · sf1eq (~510k nodes, 4M edges), default threshold: ~equal;
    //   · sf1eq with the broadcast threshold forced to 1 KB (the true
    //     past-broadcast regime a 100 TB graph lives in): plain unhinted
    //     SMJ 13.4 s vs the persist+SHJ route 35–38 s — the per-superstep
    //     SMJ sort of the slim 2-long edge row is CHEAPER here than
    //     5 supersteps of InMemoryTableScan decompression + forced hash
    //     builds. The no-op "after" plan is the measured optimum of the
    //     spellings tried; at genuine cluster scale the lever remains a
    //     BUCKETED edge table (ops.Bucketing) whose scan reports the
    //     partitioning without an in-memory cache in the loop.
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    // |V| is a 1-row driver bound (like the CC loop's convergence probe)
    // and the rank table carries each node's STATIC out-degree from the
    // start — no per-iteration rank⋈outdeg join
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge table")
    val base = scale / n

    var r = nodes.join(outdeg, Seq("node"), "left")
      .select(col("node"), lit(base).as("rank"), col("deg"))
      .repartition(col("node"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val contribs = e.join(r.where(col("deg").isNotNull),
          e("src") === r("node"))
        .select(col("dst"), div(col("rank"), col("deg")).as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
      val dang = r.where(col("deg").isNull)
        .agg(coalesce(sum("rank"), lit(0L)).as("dm"))
      val next = r.select(col("node"), col("deg"))
        .join(contribs, r("node") === contribs("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          div(lit(15L) * lit(base) +
            lit(85L) * (coalesce(col("contrib"), lit(0L)) +
              div(col("dm"), lit(n))),
            lit(100L)).as("rank"),
          col("deg"))
      it += 1
      r = if (it % checkpointEvery == 0 && it < iters) next.localCheckpoint()
          else next
    }
    r.select(col("node"), col("rank"))
  }

  /** Personalized (topic-sensitive) PageRank: the restart mass teleports
    * to a SEED set instead of uniformly — "rank every page by proximity
    * to these trusted/topical pages", the crawl-prioritization and
    * TrustRank-style spam-demotion variant. Same fixed-point integer
    * arithmetic, same per-iteration shape as [[pageRank]]; the only
    * changes are the restart vector (`scale div |S|` on seeds, 0
    * elsewhere) and the dangling mass, which returns to the seeds (the
    * standard PPR convention — lost mass re-enters through the teleport
    * distribution). Seeds outside the edge table still hold restart mass
    * (they are added to the node set); seed membership rides the rank
    * table as a static flag, so no per-iteration seed join exists.
    * Returns `(node, rank)`, bit-identical across partitionings and
    * engines. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int = 5,
                           scale: Long = 1000000000000L,
                           checkpointEvery: Int = 6): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val div = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      call_function("div", a, b)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .localCheckpoint()
    val sd = seeds.select(col("node").cast("long").as("node")).distinct()
      .localCheckpoint()
    val sCount = sd.count()
    require(sCount > 0, "personalizedPageRank needs a non-empty seed set")
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .unionByName(sd)
      .distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val sBase = scale / sCount

    val seedBase = when(col("is_seed"), lit(sBase)).otherwise(lit(0L))
    var r = nodes.join(outdeg, Seq("node"), "left")
      .join(sd.withColumn("is_seed", lit(true)), Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .select(col("node"), seedBase.as("rank"), col("deg"), col("is_seed"))
      .repartition(col("node"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val contribs = e.join(r.where(col("deg").isNotNull),
          e("src") === r("node"))
        .select(col("dst"), div(col("rank"), col("deg")).as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
      val dang = r.where(col("deg").isNull)
        .agg(coalesce(sum("rank"), lit(0L)).as("dm"))
      val next = r.select(col("node"), col("deg"), col("is_seed"))
        .join(contribs, r("node") === contribs("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          div(lit(15L) * seedBase +
            lit(85L) * (coalesce(col("contrib"), lit(0L)) +
              when(col("is_seed"), div(col("dm"), lit(sCount)))
                .otherwise(lit(0L))),
            lit(100L)).as("rank"),
          col("deg"), col("is_seed"))
      it += 1
      r = if (it % checkpointEvery == 0 && it < iters) next.localCheckpoint()
          else next
    }
    r.select(col("node"), col("rank"))
  }

  /** Exact per-node triangle counts on an undirected graph — the local
    * clustering signal: for a duplicate-pair graph, triangle-rich nodes
    * sit in coherent near-dup families (safe to collapse) while
    * triangle-free high-degree nodes are hub artifacts of the blocking
    * (boilerplate shingles, LSH band collisions) that SHOULDN'T merge —
    * the standard spam/community diagnostic on similarity graphs.
    *
    * `edges` is any-orientation `(src, dst)`; duplicates and self-loops
    * are cleaned. `nodes` optionally fixes the output domain (isolated
    * nodes get 0); default = nodes appearing in edges.
    *
    * Scale shape (Suri & Vassilvitskii, WWW'11): orient each edge toward
    * its higher-(degree, id) endpoint — every triangle then has exactly
    * one pivot with two out-edges, and the wedge join's volume is
    * Σ_v outdeg(v)² = O(|E|^1.5) on ANY graph (each outdeg ≤ √(2|E|)),
    * immune to the power-law hub blowup a naive adjacency self-join hits
    * (a hub of degree d would otherwise contribute d² wedges; oriented,
    * a hub RECEIVES edges and contributes none). Three hash joins + one
    * aggregate, no window, nothing driver-side. */
  def triangleCounts(edges: DataFrame,
                     nodes: Option[DataFrame] = None): DataFrame = {
    // canonical simple edge set, consumed 4× (degrees, orientation, wedge
    // closing join) — cut the lineage once
    val e = cleanUV(edges).localCheckpoint()
    triangleCountsClean(e, degreesOf(e).localCheckpoint(), nodes)
  }

  /** Canonical simple `(u, v)` edge set (u < v, no self-loops, distinct)
    * — the cleaning pass every undirected-graph operator here shares. */
  private def cleanUV(edges: DataFrame): DataFrame =
    edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** Degrees of a cleaned `(u, v)` edge table. */
  private def degreesOf(e: DataFrame): DataFrame =
    e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** [[triangleCounts]] body over an ALREADY cleaned+materialized edge
    * table and its (materialized) degree table — the seam that lets
    * [[clusteringCoefficients]] share one clean+distinct+degree pass
    * instead of re-running both (the degree table is referenced three
    * times below, the edge table twice more; both arrive as leaves). */
  private def triangleCountsClean(e: DataFrame, deg: DataFrame,
                                  nodes: Option[DataFrame]): DataFrame = {
    // (deg, id) total order: strictly more edges, or same degree + higher id
    val ew = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = ew.select(
      when(uFirst, col("u")).otherwise(col("v")).as("p"),
      when(uFirst, col("v")).otherwise(col("u")).as("q"),
      when(uFirst, col("dv")).otherwise(col("du")).as("dq"))
    // wedges at the pivot, each unordered out-pair once (by the same
    // (deg, id) order), closed iff (x, y) is an edge
    val o1 = oriented.select(col("p"), col("q").as("x"), col("dq").as("dx"))
    val o2 = oriented.select(col("p"), col("q").as("y"), col("dq").as("dy"))
    val wedges = o1.join(o2,
      Seq("p")).where(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val tris = wedges.join(e,
      least(col("x"), col("y")) === col("u") &&
        greatest(col("x"), col("y")) === col("v"))
      .select(col("p"), col("x"), col("y"))
    val perNode = tris
      .select(explode(array(col("p"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val domain = nodes.getOrElse(deg.select("node"))
    domain.join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Local clustering coefficient per node: `2·T(v) / (deg(v)·(deg(v)−1))`
    * — triangles from [[triangleCounts]], degrees re-derived from the same
    * cleaned edge set, the division left as the ONE IEEE operation on
    * integer-exact numerator/denominator (the repo's exactness
    * convention). Degree-1 and isolated nodes get coefficient 0. The
    * per-node "is this neighborhood a coherent community or a hub
    * artifact" score; emits `(node, deg, triangles, coeff)`. */
  def clusteringCoefficients(edges: DataFrame,
                             nodes: Option[DataFrame] = None): DataFrame = {
    // one clean+distinct pass and one degree aggregation, shared with the
    // triangle pass through the materialized seam (previously the triangle
    // call re-cleaned the already-cleaned edges and re-derived degrees —
    // a full extra distinct exchange + explode+agg over the edge set)
    val e = cleanUV(edges).localCheckpoint()
    val deg = degreesOf(e).localCheckpoint()
    val tri = triangleCountsClean(e, deg, nodes)
    tri.join(deg, Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"),
        col("triangles"),
        when(coalesce(col("deg"), lit(0L)) >= 2,
          (col("triangles") * 2).cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .otherwise(lit(0.0)).as("coeff"))
  }

  /** k-core via iterative peeling: repeatedly drop nodes with degree < k
    * until the fixpoint — the maximal subgraph where every node keeps ≥ k
    * neighbors. The cohesion filter degree alone can't express (a hub
    * touching a thousand degree-1 leaves has huge degree and an empty
    * 2-core): dense duplicate families, link farms, and genuinely
    * interlinked communities survive; stars and tendrils peel away. Emits
    * `(node, deg)` for core members, `deg` = degree WITHIN the core.
    *
    * Exact and deterministic: peeling is confluent (the k-core is unique
    * regardless of removal order), every round is integer counting — no
    * float anywhere — so the result is partition- and engine-invariant.
    *
    * Scale shape per round: one explode + map-side-combinable count
    * (shuffle ∝ E), two left-semi joins of the edge table against the
    * survivor set (hash joins on the endpoint; the survivor side is |V|
    * rows and usually broadcasts). Rounds = cascade depth, NOT diameter —
    * real graphs peel in a handful of rounds; lineage is cut per round
    * like the CC/PageRank loops, and non-convergence within `maxRounds`
    * fails loudly rather than returning a half-peeled set. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var e = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var nEdges = e.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      // materialize the survivor set once per round: it feeds BOTH
      // semi-joins, and lazily the explode+agg subtree would execute
      // twice (the u- and v-aliased broadcast subtrees differ textually,
      // so ReuseExchange cannot dedup them). |V|-bounded rows. Measured
      // 12.1 → 8.9 s at sf1eq (4M-edge co-occurrence graph), ~2.0 vs
      // 2.4 s control-corrected at sf0.1.
      val keep = deg.where(col("deg") >= k).select("node").localCheckpoint()
      val next = e
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint()
      val m = next.count()
      // peeling only removes edges, so an unchanged count IS the fixpoint
      if (m == nEdges) converged = true
      else { e = next; nEdges = m; rounds += 1 }
      if (nEdges == 0L) converged = true // empty core: nothing left to peel
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore(k=$k) did not reach the fixpoint in $maxRounds rounds " +
          "(pathologically deep cascade) — raise maxRounds")
    e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .where(col("deg") >= k)
  }

  /** HITS hubs & authorities (Kleinberg's mutual recursion) — the
    * centrality that separates the two ROLES a node plays on a directed
    * graph: a good hub points at good authorities, a good authority is
    * pointed at by good hubs. On the order→supplier bipartite graph this
    * reads "orders that span reputable suppliers" / "suppliers reached by
    * broad orders"; on a crawl link graph it is the classic
    * directory-vs-content split PageRank's single score conflates.
    *
    * Same fixed-point discipline as [[pageRank]]: scores live in integer
    * `scale` units, each half-step L1-normalizes (Σ = scale, up to floor
    * loss) via widen-to-decimal multiply + integral division — a long
    * `raw·scale` would overflow at crawl-scale edge counts, decimal(38,0)
    * holds to 10^38; the division is `div` (truncation toward zero,
    * matching DuckDB `//` on HUGEINT) — so every score is bit-identical
    * across partitionings and engines, and the DuckDB oracle replays the
    * full recursion. Duplicate edges contribute multiplicity, as in
    * [[pageRank]]; nodes with no in-edges get authority 0, no out-edges
    * hub 0 (scores are diagnostics, not distributions over iterations).
    *
    * Per iteration: two slim equi-joins (edges⋈scores) + two
    * map-side-combinable long hash aggregates + two 1-row broadcast
    * normalizer aggregates — shuffle ∝ |E| + |V|, no window, nothing
    * data-sized on the driver; the score table is `localCheckpoint`ed per
    * iteration, the PageRank/CC lineage-cut rule. */
  def hits(edges: DataFrame, iters: Int = 3,
           scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val div = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      call_function("div", a, b)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .localCheckpoint()
    require(e.limit(1).count() > 0, "hits needs a non-empty edge table")
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .repartition(col("node"))
      .localCheckpoint()

    // one L1-normalized half-step: raw_score(node) = Σ over matching
    // edges of the counterpart score, rescaled so Σ = scale exactly
    // (floor loss aside). `raw·scale` rides decimal(38,0).
    def halfStep(score: DataFrame, scoreCol: String, edgeKey: String,
                 groupKey: String, outCol: String): DataFrame = {
      val raw = e.join(score, e(edgeKey) === score("node"))
        .groupBy(e(groupKey).as("node"))
        .agg(sum(col(scoreCol)).as("raw"))
      val tot = raw.agg(sum(col("raw")).as("tot"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          div(coalesce(col("raw"), lit(0L)).cast("decimal(38,0)") *
            lit(scale), col("tot")).as(outCol))
    }

    var h = nodes.select(col("node"), lit(scale).as("hub"))
    var a: DataFrame = null
    var it = 0
    while (it < iters) {
      a = halfStep(h, "hub", "src", "dst", "auth").localCheckpoint()
      h = halfStep(a, "auth", "dst", "src", "hub").localCheckpoint()
      it += 1
    }
    h.join(a, "node")
      .select(col("node"), col("hub"), col("auth").as("authority"))
  }
}
