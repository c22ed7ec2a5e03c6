package graft.operators

import java.util.concurrent.atomic.AtomicLong

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

  // one view per invocation: a fixed name made two concurrent callers
  // on the same session race createOrReplaceTempView/dropTempView —
  // worst case one call's sketch silently built from the OTHER call's
  // dim keys, pruning rows the exact join can never resurrect
  private val viewSeq = new AtomicLong(0)

  /** Bloom sizing: m = -n·ln(p)/ln²2 bits for n keys at fp rate p. */
  private def bitsFor(expectedKeys: Long, fpp: Double): Long =
    math.max(64L, math.ceil(
      -expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong)

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
    * rate `fpp` (default 3% ⇒ ~7.3 bits/key). `expectedKeys = 0`
    * (the default) self-sizes with one cheap COUNT over the dim keys
    * at call time — a caller's 100× under-guess would silently raise
    * the real fpp and with it the scan volume, and the dim is small
    * by contract so the count is noise.
    *
    * Spark clamps the sketch to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default
    * 64M bits ≈ 8 MB ≈ 9M keys at 3%): past that the aggregate keeps
    * the requested fpp ONLY if the conf is raised, so rather than let
    * selectivity silently degrade this method refuses and tells the
    * caller — either raise the conf or use a plain shuffled semi join
    * (past ~10⁸ keys the sketch stops being "a few MB" anyway).
    *
    * Binding note: the subquery resolves through a transient temp view
    * (unique name per call — safe under concurrent callers) dropped as
    * soon as analysis captures the plan — the returned frame stays
    * valid (analysis is eager), and session catalog state is untouched
    * on exit. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    expectedKeys: Long = 0L,
                    fpp: Double = 0.03): DataFrame = {
    require(expectedKeys >= 0 && fpp > 0 && fpp < 1,
            s"bloomSemiJoin: need expectedKeys >= 0 (0 = auto) and fpp in (0,1)")
    graft.functions.GraftFunctions.register(fact.sparkSession)
    val keys = dim.select(col(dimKey)).where(col(dimKey).isNotNull)
    val nKeys = if (expectedKeys > 0) expectedKeys else math.max(1L, keys.count())
    val bits = bitsFor(nKeys, fpp)
    val maxBits = fact.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(bits <= maxBits,
      s"bloomSemiJoin: $nKeys keys at fpp=$fpp need $bits bloom bits but " +
      s"spark.sql.optimizer.runtime.bloomFilter.maxNumBits=$maxBits would " +
      "silently clamp the sketch (worse real fpp, scan pruning stops " +
      "helping). Raise the conf, accept a larger fpp, or use a plain " +
      "shuffled semi join.")
    // BloomFilterAggregate ALSO clamps numItems to maxNumItems (default
    // 4M): for key counts between maxNumItems and what maxBits admits,
    // the sketch would pass the bits guard yet get a hash-function
    // count sized for fewer items — silently worse real fpp, the exact
    // degradation this method refuses (r6 advice).
    val maxItems = fact.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    require(nKeys <= maxItems,
      s"bloomSemiJoin: $nKeys keys exceed " +
      s"spark.sql.optimizer.runtime.bloomFilter.maxNumItems=$maxItems — the " +
      "aggregate would clamp numItems and mis-size its hash-function count " +
      "(worse real fpp). Raise the conf or use a plain shuffled semi join.")
    val view = s"__graft_bloom_semi_dim_${viewSeq.incrementAndGet()}"
    keys.createOrReplaceTempView(view)
    // backtick the interpolated identifiers: a key column named with a
    // space/hyphen/reserved word must parse as one identifier here just
    // as it resolves through col() elsewhere in the operator family
    val pruned =
      try fact.where(expr(
        s"""graft_might_contain(
           |  (SELECT graft_bloom_agg(`$dimKey`, ${nKeys}L, ${bits}L)
           |   FROM $view), `$factKey`)""".stripMargin))
      finally fact.sparkSession.catalog.dropTempView(view)
    pruned.as("f").join(keys.as("d"),
      col(s"f.`$factKey`") === col(s"d.`$dimKey`"), "left_semi")
  }
}
