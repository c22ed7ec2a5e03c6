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
}
