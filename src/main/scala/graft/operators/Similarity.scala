package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute force is the correctness baseline: broadcast the (small) query
  * set against the corpus — the corpus never shuffles, cosine runs
  * scan-side, and only the per-query top-k heads move. The scale path
  * buckets the corpus with sign-LSH (Dedup.withBucket) so each query
  * probes one bucket (~corpus/2^m vectors) instead of everything;
  * recall is tunable via m and multi-probe.
  */
object Similarity {

  /** Exact top-k neighbors per query by cosine (ties broken by
    * neighbor id — value-total, deterministic). Queries are broadcast;
    * expect |queries| << |corpus|. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
                                     col("embedding").as("qvec")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
                          col("embedding").as("cvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.crossJoin(c)
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cos"))
  }

  /** Bucketed ANN: banded sign-LSH (OR over bands) — each query scores
    * only candidates sharing at least one band value, ~|corpus| /
    * 2^rows per band instead of everything. Same output shape as
    * bruteForceTopK; recall < 1 by design, tunable via bands/rows. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bands: Int = 4, rows: Int = 5, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val qb = Dedup.bandedBuckets(queries, "vec_id", "embedding", bands, rows, dim)
      .select(col("id").as("query_id"), col("band_idx"), col("band_val"))
    val cb = Dedup.bandedBuckets(corpus, "vec_id", "embedding", bands, rows, dim)
      .select(col("id").as("neighbor_id"), col("band_idx"), col("band_val"))
    val cands = broadcast(qb)
      .join(cb, Seq("band_idx", "band_val"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cv = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cos"))
  }
}
