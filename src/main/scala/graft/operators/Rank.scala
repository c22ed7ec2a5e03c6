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
  * Scale shape: the edge table joins its out-degrees ONCE and is
  * localCheckpointed (static across iterations); each iteration is
  * then one equi-join of the rank vector with the degree-annotated
  * edges on src plus one partial-agg sum keyed by dst, and a left
  * join back onto the node spine so zero-inlink nodes keep their
  * (1−d) base. Two shuffles per iteration, O(edges) rows moved, no
  * per-node state on the driver. Every superseded round's checkpoint
  * blocks are freed eagerly (the r4 lesson — see [[graft.Blocks]]);
  * the RETURNED frame still reads its final checkpoint, which the
  * caller releases via Blocks.freeAll once consumed.
  */
object Rank {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.75): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0.0 && damping < 1.0, s"damping out of (0,1): $damping")
    val e = edges.select(col(srcCol).cast("long").as("src"),
                         col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val withDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    var ranks = nodes.select(col("node"), lit(1.0).as("pr")).localCheckpoint()
    for (_ <- 0 until iters) {
      val mass = ranks
        .join(withDeg, col("node") === col("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      val next = nodes
        .join(mass, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) +
           lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("pr"))
        .localCheckpoint()
      graft.Blocks.freeCheckpoint(ranks)
      ranks = next
    }
    // the final round is itself checkpointed, so the spine and the
    // degree-annotated edges are no longer reachable — free them now
    // rather than leaving them for the caller's Blocks.freeAll
    graft.Blocks.freeCheckpoint(nodes)
    graft.Blocks.freeCheckpoint(withDeg)
    ranks
  }
}
