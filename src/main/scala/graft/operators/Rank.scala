package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph rank scoring — PageRank over an edge list, the
  * graph-quality signal web-corpus curation uses to weight documents
  * (CommonCrawl publishes exactly this family of centrality scores;
  * rank-weighted sampling is the standard consumer). Complements the
  * connected-components family in [[Dedup]]: CC answers "which docs
  * are the same", rank answers "which docs matter".
  *
  * Classic unnormalized form: rank₀ = 1 and
  * rankₜ₊₁(v) = (1−d) + d·Σ_{u→v} rankₜ(u)/outdeg(u).
  * Dangling nodes (no out-edges) receive rank but contribute no mass
  * onward — their mass vanishes rather than being redistributed, the
  * common simplification; callers who need the stochastic variant
  * renormalize the result.
  *
  * Scale shape: everything edge-sized stays put. The bare (src, dst)
  * edge list is cached ONCE, columnar-compressed with disk fallback
  * (an earlier revision localCheckpointed edges joined with their
  * out-degrees — ~5 GB of deserialized rows for a 55M-edge graph,
  * which OOM'd a 16 GB heap at 100×; the columnar cache of two long
  * columns is ~10× smaller and spills instead of dying). Per
  * iteration the NODE-sized side does all the moving: contribution
  * pr/outdeg is computed on the rank vector (one node×node join),
  * broadcast when the node count allows, and hash-joined into the
  * cached edges — the edge table is never sorted and never shuffled,
  * and the map-side partial agg reduces the join output to ≤ nodes
  * rows per task before the one real exchange (keyed by dst). A left
  * join back onto the node spine keeps zero-inlink nodes at their
  * (1−d) base. Past `maxBroadcastNodes` (or with it set to 0) the
  * contribution join falls back to a shuffle join — the
  * 1000-executor/billion-node regime where a broadcast build would
  * not fit. Every superseded round's checkpoint blocks are freed
  * eagerly (the r4 lesson — see [[graft.Blocks]]); the RETURNED frame
  * still reads its final checkpoint, which the caller releases via
  * Blocks.freeAll once consumed.
  */
object Rank {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.75,
               maxBroadcastNodes: Long = 4000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0.0 && damping < 1.0, s"damping out of (0,1): $damping")
    // dense-graph auto-route (r16): a hub/dense edge table is degree-
    // capped before the iteration — the r15 sweep proved the uncapped
    // per-round working set is pool-bound (357 GB spill at ANY
    // partition count on the 1.17B-edge bipartite graph); see
    // GraphRoute for the detection rule, the approximation contract
    // (scores become exact scores OF the capped subgraph), and the
    // loud opt-out (spark.graft.graph.denseRoute=direct)
    val e = GraphRoute.routeDense(
      edges.select(col(srcCol).cast("long").as("src"),
                   col(dstCol).cast("long").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      "pageRank")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    // dangling nodes (no out-edges) are absent here, so the inner
    // contribution join drops them — they receive mass but pass none
    val deg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).localCheckpoint()
    val nNodes = nodes.count()
    var ranks = nodes.select(col("node"), lit(1.0).as("pr")).localCheckpoint()
    for (_ <- 0 until iters) {
      val contrib0 = ranks
        .join(deg, col("node") === col("src"))
        .select(col("src"), (col("pr") / col("outdeg")).as("w"))
      val contrib = if (maxBroadcastNodes > 0 && nNodes <= maxBroadcastNodes)
        broadcast(contrib0) else contrib0
      val mass = e.join(contrib, "src")
        .groupBy(col("dst")).agg(sum(col("w")).as("in_mass"))
      val next = nodes
        .join(mass, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) +
           lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("pr"))
        .localCheckpoint()
      graft.Blocks.freeCheckpoint(ranks)
      ranks = next
    }
    // the final round is itself checkpointed, so the spine, degrees,
    // and cached edges are no longer reachable — free them now rather
    // than leaving them for the caller's Blocks.freeAll
    graft.Blocks.freeCheckpoint(nodes)
    graft.Blocks.freeCheckpoint(deg)
    e.unpersist(false)
    ranks
  }

  /** Personalized PageRank (random walk with restart — Jeh & Widom
    * 2003's topic-sensitive form): teleportation returns to a SEED set
    * instead of the uniform base, so rank measures proximity to the
    * seeds rather than global importance. This is the standard
    * seeded-quality-propagation tool for corpus curation: plant a
    * small trusted set (curated domains, verified docs) and harvest
    * the pages the link structure pulls toward them — the global
    * [[pageRank]] cannot express "near the good stuff", only
    * "popular".
    *
    * rank₀(v) = seed(v);
    * rankₜ₊₁(v) = (1−d)·seed(v) + d·Σ_{u→v} rankₜ(u)/outdeg(u).
    * Unnormalized like [[pageRank]] (callers renormalize if they need
    * a distribution); non-seed nodes unreachable from any seed stay
    * at exactly 0.0.
    *
    * Scale shape: identical to [[pageRank]] — edges cached bare and
    * never re-shuffled, the node-sized rank vector does all the
    * moving, contribution join broadcast under `maxBroadcastNodes`.
    * The seed indicator is computed ONCE onto the checkpointed node
    * spine (a node-keyed left semi probe), so per-round cost is
    * unchanged: the restart term is a per-row multiply on the spine
    * join that closes each iteration. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iters: Int = 3, damping: Double = 0.75,
                           maxBroadcastNodes: Long = 4000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0.0 && damping < 1.0, s"damping out of (0,1): $damping")
    val e = GraphRoute.routeDense(  // see pageRank's routing note
      edges.select(col(srcCol).cast("long").as("src"),
                   col(dstCol).cast("long").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      "personalizedPageRank")
    val s = seeds.select(col(seedCol).cast("long").as("node")).distinct()
    // the spine carries the indicator for the whole loop: seed
    // membership is consulted every round (restart term), so resolve
    // the join once and checkpoint the two-column result
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .join(s.withColumn("seed", lit(1.0)), Seq("node"), "left")
      .select(col("node"), coalesce(col("seed"), lit(0.0)).as("seed"))
      .localCheckpoint()
    val deg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).localCheckpoint()
    val nNodes = nodes.count()
    var ranks = nodes.select(col("node"), col("seed").as("pr")).localCheckpoint()
    for (_ <- 0 until iters) {
      val contrib0 = ranks
        .join(deg, col("node") === col("src"))
        .select(col("src"), (col("pr") / col("outdeg")).as("w"))
      val contrib = if (maxBroadcastNodes > 0 && nNodes <= maxBroadcastNodes)
        broadcast(contrib0) else contrib0
      val mass = e.join(contrib, "src")
        .groupBy(col("dst")).agg(sum(col("w")).as("in_mass"))
      val next = nodes
        .join(mass, col("node") === col("dst"), "left")
        .select(col("node"), col("seed"),
          (lit(1.0 - damping) * col("seed") +
           lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("pr"))
        .localCheckpoint()
      graft.Blocks.freeCheckpoint(ranks)
      ranks = next
    }
    graft.Blocks.freeCheckpoint(nodes)
    graft.Blocks.freeCheckpoint(deg)
    e.unpersist(false)
    ranks.select(col("node"), col("pr"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) in the UNNORMALIZED
    * integer form: auth₀ = hub₀ = 1; per round
    * authₜ₊₁(v) = Σ_{u→v} hubₜ(u), then
    * hubₜ₊₁(u) = Σ_{u→v} authₜ₊₁(v) — the textbook update order, with
    * the per-round L2 normalization DROPPED. Normalizing divides by a
    * float norm whose accumulation order is engine-dependent, so the
    * classic form cannot be gated bit-exactly; the unnormalized
    * iteration is order-isomorphic to it (normalization rescales both
    * vectors uniformly — the RANKING each round is identical), keeps
    * every intermediate an exact integer, and bounds growth by
    * deg_max² per round — far inside long range at any realistic
    * round budget over a kNN-bounded graph. Callers who need unit
    * vectors normalize once at the end.
    *
    * What it adds over [[pageRank]]: directionality split. A page
    * that LINKS well (hub) and a page that IS linked well (authority)
    * are different quality signals on a crawl graph; PageRank blends
    * them into one stationary score.
    *
    * Scale shape: the [[pageRank]] discipline — edges cached bare and
    * never re-shuffled; two node-sized vector joins + two node-keyed
    * aggs per round; spine left-joins keep degree-0 sides at 0. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 3,
           maxBroadcastNodes: Long = 4000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = GraphRoute.routeDense(  // see pageRank's routing note
      edges.select(col(srcCol).cast("long").as("src"),
                   col(dstCol).cast("long").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      "hits")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val nNodes = nodes.count()
    def bcast(df: DataFrame): DataFrame =
      if (maxBroadcastNodes > 0 && nNodes <= maxBroadcastNodes) broadcast(df)
      else df
    var scores = nodes.select(col("node"), lit(1L).as("auth"),
                              lit(1L).as("hub")).localCheckpoint()
    for (_ <- 0 until iters) {
      val inMass = e.join(
          bcast(scores.select(col("node").as("src"), col("hub"))), "src")
        .groupBy(col("dst")).agg(sum(col("hub")).as("a"))
      val auth = nodes.join(inMass, col("node") === col("dst"), "left")
        .select(col("node"), coalesce(col("a"), lit(0L)).as("auth"))
        .localCheckpoint()
      val outMass = e.join(
          bcast(auth.select(col("node").as("dst"), col("auth").as("na"))),
          "dst")
        .groupBy(col("src")).agg(sum(col("na")).as("h"))
      val next = auth.join(outMass, col("node") === col("src"), "left")
        .select(col("node"), col("auth"),
                coalesce(col("h"), lit(0L)).as("hub"))
        .localCheckpoint()
      graft.Blocks.freeCheckpoint(scores)
      graft.Blocks.freeCheckpoint(auth)
      scores = next
    }
    graft.Blocks.freeCheckpoint(nodes)
    e.unpersist(false)
    scores
  }

  /** Synchronous label propagation communities (Raghavan et al. 2007)
    * over an undirected pair graph: labels start as node ids; each
    * round every node takes the most frequent label among its
    * neighbors, ties to the SMALLEST label — which makes the
    * synchronous schedule fully deterministic (the usual async
    * random-order LPA is not), so the gate can unroll rounds in SQL
    * exactly (the pagerank_sound discipline, integer labels instead
    * of dyadic doubles). Complements components (row 45: connectivity
    * = one community) and PageRank (row 52: importance, not
    * grouping): LPA splits DENSE regions inside a connected graph —
    * boilerplate rings vs topical clusters.
    *
    * Scale shape per round: one edge⋈labels equi-join + two
    * aggregations on the SAME dst key (Exchange reuse — the argmax
    * rides the count's partitioning); labels are node-sized, edges
    * cached bare and never re-shuffled (the pageRank lesson);
    * superseded label rounds free their checkpoint blocks eagerly.
    * Measured at 100× (27M pairs, 500k nodes): broadcast form 34.6 s;
    * the co-located fallback (edges hash-partitioned on src once,
    * shuffle-hash label build per round) 24.4 s, zero spill — so past
    * the broadcast bound the fallback does not merely survive, it
    * wins; `maxBroadcastNodes` is a knob, not a cliff. */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
                       iters: Int = 3,
                       maxBroadcastNodes: Long = 4000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e0 = pairs
      .select(explode(array(
        struct(col(aCol).cast("long").as("src"),
               col(bCol).cast("long").as("dst")),
        struct(col(bCol).cast("long").as("src"),
               col(aCol).cast("long").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e0.select(col("src").as("node")).distinct().localCheckpoint()
    val nNodes = nodes.count()
    val useBroadcast = maxBroadcastNodes > 0 && nNodes <= maxBroadcastNodes
    // Beyond the broadcast bound (billion-node regime, or forced with
    // maxBroadcastNodes=0) the per-round label join must not re-exchange
    // the edge table: hash-partition the cached edges on `src` ONCE at
    // build time, so each round EnsureRequirements shuffles only the
    // node-sized label stream to the edges' existing partitioning —
    // previously the fallback re-shuffled 3.2 GB of edges per iteration
    // and spilled. The one-time repartition replaces (not stacks on)
    // the unpartitioned cache.
    val e = if (useBroadcast) e0 else {
      val ep = e0.repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ep.count() // materialize from the old cache before dropping it
      e0.unpersist(false)
      ep
    }
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      // labels are node-sized: broadcast them into the edge join (the
      // pageRank contribution lesson) so the cached edge table never
      // re-shuffles — measured at 100× on the 27M-pair graph: the
      // shuffle-join form moved 3.2 GB and spilled 3.2 GB over three
      // rounds; the broadcast form shuffles only the (dst, label)
      // partial-agg stream. Past the broadcast bound the label side is
      // hinted shuffle-hash: labels build the per-partition hash table
      // (node-sized/partitions) and the pre-partitioned edges stream
      // through with no per-round sort.
      val lab0 = labels.select(col("node").as("src"), col("label"))
      val lab = if (useBroadcast) broadcast(lab0)
                else lab0.hint("shuffle_hash")
      val counts = e.join(lab, "src")
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
      val winner = counts.groupBy(col("dst"))
        .agg(min_by(col("label"), struct((-col("c")).as("nc"),
                                         col("label"))).as("nl"))
      val next = nodes
        .join(winner, col("node") === col("dst"), "left")
        .select(col("node"),
                coalesce(col("nl"), col("node")).as("label"))
        .localCheckpoint()
      graft.Blocks.freeCheckpoint(labels)
      labels = next
    }
    graft.Blocks.freeCheckpoint(nodes)
    e.unpersist(false)
    labels
  }
}

