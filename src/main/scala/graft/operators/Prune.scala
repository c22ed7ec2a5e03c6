package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scan pruning for joins whose probe side is enormous.
  *
  * Reference shape: the staging MERGE joins the full warehouse table
  * against one day's changes (`postgresql/db-setup/setup.sql` staging
  * swap; `mnt/dags/02fetch_from_data_lake.py` loads then joins) — at
  * 100 TB the fact-side scan-and-shuffle dominates, while the build
  * side is comparatively tiny.
  */
object Prune {

  private final val ViewName = "__graft_bloom_semi_dim"

  /** Semi join with an explicit bloom-filter prune on the fact side —
    * the same shape Spark's internal runtime-filter rewrite injects,
    * made deterministic and tunable. One small aggregate builds a
    * bloom sketch over the dim keys (a few MB at any dim size that
    * fits a broadcast); `might_contain` drops ~(1-fpp) of
    * non-matching fact rows AT THE SCAN STAGE, before any exchange;
    * the exact semi join afterwards removes the bloom's false
    * positives. Bloom filters have no false negatives, so the result
    * is bit-identical to `fact SEMI JOIN dim` — only the volume
    * entering the shuffle changes.
    *
    * The sketch rides a scalar subquery: Catalyst requires
    * `might_contain`'s bloom argument to be foldable or a subquery (a
    * column from a joined one-row frame is rejected at analysis), and
    * the subquery executes once, shipping only the sketch bytes with
    * the plan — the dim never broadcasts row-wise. Sizing:
    * m = -n·ln(p)/ln²2 bits for `expectedKeys`=n at false-positive
    * rate `fpp` (default 3% ⇒ ~7.3 bits/key; 10⁹ keys ≈ 0.9 GB, so
    * past ~10⁸ keys prefer a plain shuffled semi join — the sketch
    * stops being "a few MB").
    *
    * Binding note: the subquery resolves through a transient temp view
    * dropped as soon as analysis captures the plan — the returned
    * frame stays valid (analysis is eager), and session catalog state
    * is untouched on exit. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    expectedKeys: Long = 1000000L,
                    fpp: Double = 0.03): DataFrame = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1,
            s"bloomSemiJoin: need expectedKeys > 0 and fpp in (0,1)")
    graft.functions.GraftFunctions.register(fact.sparkSession)
    val bits = math.max(64L, math.ceil(
      -expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val keys = dim.select(col(dimKey)).where(col(dimKey).isNotNull)
    keys.createOrReplaceTempView(ViewName)
    val pruned =
      try fact.where(expr(
        s"""graft_might_contain(
           |  (SELECT graft_bloom_agg($dimKey, ${expectedKeys}L, ${bits}L)
           |   FROM $ViewName), $factKey)""".stripMargin))
      finally fact.sparkSession.catalog.dropTempView(ViewName)
    pruned.as("f").join(keys.as("d"),
      col(s"f.$factKey") === col(s"d.$dimKey"), "left_semi")
  }
}
