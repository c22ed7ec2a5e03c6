package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** DSIR-style data selection via hashed n-gram importance weights
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): fit bag-of-hashed-ngram distributions
  * for a TARGET slice (the domain you want more of) and the RAW
  * corpus, score every document by its importance log-ratio
  * Σ_grams (ln p̂_target(bucket) − ln p̂_raw(bucket)), and keep the
  * top-scoring documents — the published, cheap alternative to a
  * learned quality classifier for domain-matching a 100 TB crawl.
  *
  * Decomposed for exactness the way the repo's other float-path
  * operators are: [[fit]] emits exact integer bucket counts (driver
  * oracle hash-exact), [[score]] is gated with a PLANTED exact-integer
  * ratio table (driver oracle hash-exact — sums of small ints in
  * doubles are order-free), and the real ln-smoothed end-to-end
  * ([[logRatios]] + [[score]] + top-n) is rows-only by nature: ln is
  * libm-dependent in the last bit, so its doubles are deterministic
  * per engine but not engine-portable. DsirSpec gates the real path's
  * semantics (target-slice docs outscore the rest; repartition
  * stability).
  *
  * Scale shape: [[fit]] is one explode → partial-agg shuffle that
  * collapses map-side to ≤ buckets·tasks rows (buckets defaults to
  * 256 — the paper's 10k works identically); [[score]] embeds the
  * bucket→ratio table as a 256-double plan literal and runs as a
  * per-row HOF fold in array order — ZERO exchange at any corpus
  * size; selection is orderBy+limit (TakeOrdered map-side heads, no
  * global sort). Nothing here shuffles the corpus.
  */
object Dsir {

  val DefaultBuckets = 256

  /** Normalized unigram+bigram array for a text column. Bigrams via
    * two aligned slices (zip_with pads mismatched lengths with null,
    * so both sides are cut to size-1). Single-token docs contribute
    * just their unigram. */
  private[graft] def grams(textCol: Column): Column = {
    val toks = split(TextFunctions.normalize(textCol), " ")
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))
    concat(toks, bigrams)
  }

  /** Stable hash bucket for a gram: last EIGHT hex chars of md5 (a
    * 32-bit value) mod `buckets` — engine-portable (the DuckDB twin
    * replicates it via strpos digit folds), same family as
    * Sampling.bucket65536. Eight digits, not two: a 2-hex window
    * caps the entropy at 256, silently collapsing any buckets > 256
    * and skewing non-divisors of 256; 32 bits supports the paper's
    * 10k buckets with negligible modulo bias. For buckets = 256 the
    * result is bit-identical to the historical 2-hex formula
    * (256 = 16², so mod 256 sees only the last two digits). */
  private[graft] def bucket(g: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    (conv(substring(md5(g), 25, 8), 16, 10).cast("long") % buckets).cast("int")
  }

  /** Exact hashed-gram bucket counts for the target slice and the raw
    * corpus in ONE pass: (bucket, n_target, n_raw) with n_raw counting
    * every doc and n_target the rows where `targetFlag` holds (the
    * paper's raw distribution includes the target — a ratio, not a
    * partition). Only observed buckets appear (counts are exact
    * integers; absent means zero). */
  def fit(docs: DataFrame, textCol: String, targetFlag: Column,
          buckets: Int = DefaultBuckets): DataFrame =
    docs.select(targetFlag.as("flag"), explode(grams(col(textCol))).as("g"))
      .select(col("flag"), bucket(col("g"), buckets).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("flag"), 1L).otherwise(0L)).as("n_target"),
           count(lit(1)).as("n_raw"))

  /** Add-one-smoothed importance log-ratios per bucket, computed on
    * the driver from [[fit]]'s output (bounded: `buckets` rows — the
    * centroid-literal precedent). lr_b = ln((t_b+1)/(T+B)) −
    * ln((r_b+1)/(R+B)). */
  def logRatios(fitted: DataFrame, buckets: Int = DefaultBuckets): Array[Double] = {
    val rows = fitted.select("bucket", "n_target", "n_raw")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val t = rows.map(_._2).sum.toDouble
    val r = rows.map(_._3).sum.toDouble
    val out = Array.fill(buckets)(
      math.log(1.0 / (t + buckets)) - math.log(1.0 / (r + buckets)))
    for ((b, nt, nr) <- rows)
      out(b) = math.log((nt + 1.0) / (t + buckets)) -
               math.log((nr + 1.0) / (r + buckets))
    out
  }

  /** Per-document importance score: fold the gram-bucket stream
    * against a bucket→ratio literal, in array order (deterministic
    * per engine). Zero exchange — pure scan work. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            ratios: Array[Double]): DataFrame = {
    val lrArr = typedLit(ratios.toSeq)
    docs.select(col(idCol),
      aggregate(
        transform(grams(col(textCol)), g => bucket(g, ratios.length)),
        lit(0.0),
        (acc, b) => acc + element_at(lrArr, b + lit(1))).as("score"))
  }

  /** End-to-end selection: fit on `targetFlag`, score everything,
    * keep the global top `n` by (score desc, id) — TakeOrdered
    * map-side heads, no global sort. */
  def select(docs: DataFrame, idCol: String, textCol: String,
             targetFlag: Column, n: Int,
             buckets: Int = DefaultBuckets): DataFrame = {
    val ratios = logRatios(fit(docs, textCol, targetFlag, buckets), buckets)
    score(docs, idCol, textCol, ratios)
      .orderBy(col("score").desc, col(idCol)).limit(n)
  }
}
