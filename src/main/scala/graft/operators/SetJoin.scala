package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join by prefix filtering (the
  * AllPairs/PPJoin family — Bayardo et al. 2007, Xiao et al. 2008,
  * public): all document pairs with token-set Jaccard ≥ τ, with
  * EXACT recall. The guarantee MinHash-LSH (Dedup) cannot give:
  * LSH recall is probabilistic (a pair can miss every band), the
  * prefix filter is lossless — order each doc's tokens by ascending
  * global document frequency (rarest first) and keep the first
  * |s| − ⌈τ·|s|⌉ + 1 as its prefix; any pair with J ≥ τ MUST share a
  * prefix token, so the candidate join on prefix tokens misses
  * nothing, and one exact intersection per candidate finishes the
  * job. Use LSH when approximate recall at massive scale is fine;
  * use this when the dedup SLA says "every pair above τ".
  *
  * Scale shape: token df agg (one shuffle), per-doc rank window (one
  * shuffle on doc id), candidate equi-join keyed by PREFIX token —
  * rare tokens by construction, so block sizes are df-bounded exactly
  * like the containment join's rarest-probe discipline — then one
  * array_intersect per distinct candidate pair. Collapse exact-dup
  * docs first at corpus scale (the standing LSH rule).
  *
  * τ is a rational tauNum/tauDen so every filter compare is exact
  * integer cross-multiplication; the emitted jaccard is ONE division
  * of exact operands. */
object SetJoin {

  def prefixJaccardSelfJoin(docs: DataFrame, idCol: String, textCol: String,
                            tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum < tauDen,
            s"tau must be in (0,1): $tauNum/$tauDen")
    val toks = docs.select(col(idCol).as("id"),
        explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .localCheckpoint(true) // feeds df agg, sizes, rank join, verify
    val dfc = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val sz = toks.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))
    // prefix length |s| − ⌈τ|s|⌉ + 1, via ⌈a/b⌉ = (a + b − 1) div b
    val prefLen = col("sz") -
      floor((col("sz") * tauNum + tauDen - 1) / tauDen) + 1
    val prefix = toks.join(dfc, "tok").join(sz, "id")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= prefLen)
      .select(col("id"), col("tok"), col("sz"))
    // length filter rides the candidate join (PPJoin): J ≥ τ forces
    // τ·|a| ≤ |b| ≤ |a|/τ, so size-mismatched pairs die before the
    // distinct ever sees them
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
        col("b.sz") * tauDen >= col("a.sz") * tauNum &&
        col("a.sz") * tauDen >= col("b.sz") * tauNum)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
              col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .distinct() // close pairs share several prefix tokens; verify once
    // the verify stage is COMPUTE-bound per row (an array intersect),
    // not byte-bound — AQE's size-based post-shuffle coalesce sees a
    // few MB of candidate pairs and serializes what is really the
    // expensive stage (measured at 100×: 101 s wall at ~1.4× average
    // parallelism). An explicit numPartitions pins the spread; AQE
    // never coalesces a user-specified count.
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val spread = cand.repartition(parts, col("doc_a"), col("doc_b"))
    val arrs = toks.groupBy(col("id"))
      .agg(sort_array(collect_set(col("tok"))).as("toks"))
    spread
      .join(arrs.select(col("id").as("doc_a"), col("toks").as("ta")), "doc_a")
      .join(arrs.select(col("id").as("doc_b"), col("toks").as("tb")), "doc_b")
      // r19 batch 3 (guide §1.2 step 2): ta/tb are sort_array'd
      // collect_set outputs, so the distinct-intersection size is a
      // zero-allocation merge walk — value-identical to
      // size(array_intersect(ta, tb)) on sorted inputs (ExpressionSpec
      // pins it), minus the per-pair hash set + materialized
      // intersection array the built-in pays only to be size()'d.
      .withColumn("inter",
        graft.functions.GraftFunctions.sortedIntersectCount(
          col("ta"), col("tb")).cast("long"))
      .where(col("inter") * tauDen >=
        (col("sz_a") + col("sz_b") - col("inter")) * tauNum)
      .select(col("doc_a"), col("doc_b"), col("inter"),
              col("sz_a"), col("sz_b"),
              (col("inter").cast("double") /
                (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
                .as("jaccard"))
  }
}
