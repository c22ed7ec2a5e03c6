package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/splitting for training-data
  * pipelines. Everything keys off `md5(key)` — stable across runs,
  * partitionings, cluster sizes, AND engines (the DuckDB oracle
  * reproduces the exact assignment), unlike `rand()` or Spark's
  * `sample()` whose draws depend on partition layout.
  *
  * Scale: pure per-row projections — no shuffle, no state; the filter
  * form pushes through scans like any predicate.
  */
object Sampling {

  /** 0..15 bucket from the last hex nibble of md5(key-as-string). */
  def bucket16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 32, 1), 16, 10).cast("int")

  /** 0..255 bucket from the last hex byte — finer-grained fractions. */
  def bucket256(key: Column): Column =
    conv(substring(md5(key.cast("string")), 31, 2), 16, 10).cast("int")

  /** train/val/test assignment: 12/2/2 sixteenths (75/12.5/12.5%). */
  def splitLabel(key: Column): Column = {
    val b = bucket16(key)
    when(b < 12, "train").when(b < 14, "val").otherwise("test")
  }

  /** Keep ~fraction of rows, deterministically by key hash. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(bucket256(key) < (fraction * 256).round)

  /** 0..65535 bucket from the last 4 hex chars — fine-grained
    * deterministic rates for [[sampleMixture]]. */
  def bucket65536(key: Column): Column =
    conv(substring(md5(key.cast("string")), 29, 4), 16, 10).cast("long")

  /** Weighted k-sample WITHOUT replacement per group — priority
    * sampling (Duffield, Lund & Thorup, JACM 2007): each row draws a
    * priority q = w/u with u uniform on (0,1] and the k highest
    * priorities per group are kept, together with the
    * Horvitz-Thompson adjusted weight ŵ = max(w, τ) (τ = the
    * (k+1)-th priority), which makes any kept-subset weighted sum an
    * UNBIASED estimator of the group total — the property a curation
    * pipeline needs when it trains on the sample but reports
    * corpus-level statistics. Chosen over Efraimidis-Spirakis A-ES
    * deliberately: A-ES keys are u^(1/w) (a transcendental whose
    * last-bit rounding is libm-dependent), while q = w·65537/(b+1)
    * is ONE exact product (w ≤ 2^36 keeps it under 2^53) and ONE
    * IEEE-correctly-rounded division — bit-identical in any IEEE-754
    * engine, so the kept SET is engine-portable (DuckDB gate
    * hash-exact). u comes from the row id's md5 bucket
    * ((b+1)/65537), so the draw is a pure function of the id: stable
    * across runs, partitionings, and cluster sizes. Exact (u, w)
    * collisions tie-break on id in both engines.
    *
    * Scale: one hash-partition window per group (sort of the largest
    * group — fine to billions of rows; the 100 TB swap, same shape
    * as quality_filter's, is an approx-quantile τ per group
    * broadcast back as a plain filter, trading exact-k for a
    * shuffle-free scan). */
  def prioritySample(df: DataFrame, groupCol: String, idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val b1 = bucket65536(col(idCol)) + lit(1L)
    val wDbl = col(weightCol).cast("double")
    val rankW = Window.partitionBy(col(groupCol))
      .orderBy(col("q").desc, col(idCol))
    val groupW = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn("q", wDbl * lit(65537.0) / b1.cast("double"))
      .withColumn("rk", row_number().over(rankW))
      .withColumn("tau", max(when(col("rk") === k + 1, col("q"))).over(groupW))
      .where(col("rk") <= k)
      .withColumn("est_w",
        when(col("tau").isNull, wDbl).otherwise(greatest(wDbl, col("tau"))))
      .drop("q", "rk", "tau")
  }

  /** Stratified deterministic downsample to a target source mixture —
    * the rebalancing step a training-data pipeline runs after
    * profiling (`source_mixture` reports the current mix; this
    * produces the corpus at the DESIRED mix). `weights` gives integer
    * relative weights per source; sources not listed are dropped.
    * A weighted source ABSENT from the data is ignored (it
    * contributes no count row): the mix balances among the sources
    * actually present rather than collapsing the kept set to zero.
    * The achievable total is bounded by the scarcest PRESENT source
    * (N = min over s of n_s·W/w_s, W = Σw): each source keeps
    * ~w_s·N/W docs via an md5-bucket threshold, so the kept set is a
    * pure function of the ids — stable across runs, partitionings and
    * engines, and the per-source keep rates are integer-exact
    * (t_s = ⌊w_s·N·65536 / (W·n_s)⌋, all BIGINT — no float rounding
    * for the oracle to disagree on; the driver gate recomputes the
    * exact kept set in DuckDB).
    *
    * Scale: one partial-agg groupBy for the per-source counts (source
    * cardinality is tiny), thresholds broadcast back, and the filter
    * itself is a per-row projection — no window, no per-source
    * single-reducer sort, no shuffle of the corpus. Counts are exact;
    * the kept count per source is binomial around the target (±√n —
    * the price of avoiding a corpus-wide rank at 100 TB). */
  def sampleMixture(df: DataFrame, sourceCol: String, idCol: String,
                    weights: Map[String, Int]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive integers per kept source")
    val wTot = weights.values.sum
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_s"))
      .withColumn("w_s", element_at(typedLit(weights), col(sourceCol)))
      .where(col("w_s").isNotNull)
    val nMax = counts.agg(min(expr(s"n_s * $wTot DIV w_s")).as("n_max"))
    val thresholds = counts.crossJoin(nMax)
      .select(col(sourceCol),
              expr(s"w_s * n_max * 65536 DIV ($wTot * n_s)").as("t_s"))
    df.join(broadcast(thresholds), sourceCol)
      .where(bucket65536(col(idCol)) < col("t_s"))
      .drop("t_s")
  }

  /** Token-budget mixture cut: keep each source's documents — in the
    * deterministic md5(id) order, so the kept set is a reproducible
    * pseudo-random sample, not a quality-ordered skim — until the
    * running TOKEN total would exceed `budget`. Token budgets, not doc
    * counts, are the unit training-data mixtures are actually specified
    * in (a source of long documents hits its share with far fewer
    * docs). A document is kept iff the cumulative tokens INCLUDING it
    * fit the budget; later docs are dropped even if a smaller one
    * would still fit (first-fit would break prefix monotonicity and
    * with it engine-portable reproducibility).
    *
    * Scale: ONE window shuffle keyed by source (the #36a per-source
    * cap shape, with a running sum instead of row_number). Skewed
    * giant sources sort within their partition only; there is no
    * global sort and no driver state. */
  def capTokensPerSource(df: DataFrame, sourceCol: String, idCol: String,
                         tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__cum_tokens", sum(col(tokenCol)).over(w))
      .where(col("__cum_tokens") <= budget)
      .drop("__cum_tokens")
  }

  /** EXACT stratified train/val/test split: within every stratum,
    * rank rows by md5(id) (a reproducible pseudo-random order) and cut
    * at integer-arithmetic thresholds — ⌊n·trainPct/100⌋ rows train,
    * the next ⌊n·(trainPct+valPct)/100⌋−⌊n·trainPct/100⌋ rows val,
    * the rest test. Exact per-stratum counts, unlike the binomial
    * hash-threshold split (#36) whose per-stratum counts wobble ±√n —
    * the variant evaluation protocols need when a stratum is small
    * (a rare language must not lose its whole val slice to sampling
    * noise). All-integer thresholds: no float rounding for an engine
    * to disagree on.
    *
    * Scale: one window shuffle keyed by the stratum (rank and count
    * share the exchange); no global sort, no driver state. */
  def stratifiedSplit(df: DataFrame, strataCol: String, idCol: String,
                      trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad percentages: train=$trainPct val=$valPct")
    import org.apache.spark.sql.expressions.Window
    val rankW = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val allW = Window.partitionBy(col(strataCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn("__rn", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(allW))
      .withColumn("split",
        when(col("__rn") <= expr(s"__n * $trainPct DIV 100"), "train")
          .when(col("__rn") <= expr(s"__n * ${trainPct + valPct} DIV 100"), "val")
          .otherwise("test"))
      .drop("__rn", "__n")
  }
}
