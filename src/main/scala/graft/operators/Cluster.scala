package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spherical k-means over an embedding column — the scale
  * path the IVF trainer defers to (Similarity.scala trainCentroids:
  * driver-side Lloyd's is right while the sample fits, cells ≲ 4096;
  * past that training must see more points than a driver array holds).
  *
  * Each Lloyd iteration is exactly one Spark job with one shuffle:
  *   1. assignment — a per-row argmax of cosine against the centroids
  *      embedded as plan literals: zero Exchange, zero row explosion,
  *      the same shape as `Similarity.assignCells`.
  *   2. update — the typed [[graft.functions.Aggregators.VecSumAgg]]:
  *      each map task emits ONE (dim-doubles, count) partial per
  *      cluster, partials merge map-side, and only O(tasks·k·dim)
  *      summary bytes shuffle. No neighbor lists, no explode.
  * Driver traffic per iteration is the k new centroids (~2 KB at
  * k=8·dim=64; ~2 MB at k=4096). Like the IVF literal-centroid path,
  * plan size grows with k·dim — fine through a few thousand cells;
  * past that, assign hierarchically (√k super-cells, then within).
  *
  * Ranking is COSINE end to end (spherical k-means — the metric that
  * matches embedding curation: SemDeDup-style pruning, IVF probing),
  * ties to the smallest cluster id, matching the IVF cell convention.
  * Centroid update stays the arithmetic MEAN of members (standard
  * spherical Lloyd's up to the norm, which cosine ranking ignores);
  * empty clusters keep their previous centroid, like trainCentroids.
  *
  * No reference analogue (the reference's curation stops at SQL
  * transforms); this extends the training-data surface the engine
  * adds on top — clustering is the backbone of cluster-balanced
  * sampling and semantic dedup at corpus scale.
  */
object Cluster {

  /** Nearest-centroid assignment as a per-row cosine argmax via the
    * fused [[graft.functions.expressions.NearestCentroid]] expression:
    * zero Exchange, generated-code size O(1) in k (the composed
    * greatest-of-k-structs form fell out of JIT past k≈16 — 40 s for
    * a 200k×64 assignment that now runs in ~1 s). Appends
    * `cluster_id` (and `centroid_cos`, the winning similarity —
    * curation ranks on it). */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
             centroids: Seq[(Int, Array[Float])]): DataFrame = {
    require(centroids.nonEmpty, "no centroids")
    val nc = graft.functions.GraftFunctions
      .nearestCentroid(col(vecCol), centroids, "cosine")
    vectors
      .withColumn("__nc", nc)
      .withColumn("cluster_id", col("__nc").getField("cell"))
      .withColumn("centroid_cos", col("__nc").getField("score"))
      .drop("__nc")
  }

  /** One centroid-update step: per-cluster element-wise vector sums +
    * counts via VecSumAgg — the single shuffle of an iteration.
    * Exposed for the PlanSpec partial-agg guard. */
  private[graft] def updateStep(assigned: DataFrame,
                                vecCol: String): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned.select(col("cluster_id"), col(vecCol))
      .as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.Aggregators.vecSum.toColumn.name("vs"))
      .toDF("cluster_id", "vs")
  }

  /** Lloyd's from explicit initial centroids. Runs ≤ maxIters
    * iterations, stopping early once no centroid coordinate moves by
    * more than `tol`. Returns the final centroids (same ids as init). */
  def fitFrom(vectors: DataFrame, idCol: String, vecCol: String,
              init: Seq[(Int, Array[Float])], maxIters: Int = 10,
              tol: Double = 1e-6): Seq[(Int, Array[Float])] = {
    require(init.nonEmpty, "no initial centroids")
    var centroids = init.sortBy(_._1)
    var moved = Double.MaxValue
    var it = 0
    while (it < maxIters && moved > tol) {
      val upd = updateStep(assign(vectors, idCol, vecCol, centroids), vecCol)
        .collect() // k rows of (id, (dim doubles, count)) — bounded
        .map { r =>
          val vs = r.getStruct(1)
          (r.getInt(0), (vs.getSeq[Double](0), vs.getLong(1)))
        }.toMap
      moved = 0.0
      centroids = centroids.map { case (i, old) =>
        upd.get(i).filter(_._2 > 0L) match {
          case Some((s, n)) =>
            val next = new Array[Float](old.length)
            var j = 0
            while (j < old.length) {
              next(j) = (s(j) / n).toFloat
              moved = math.max(moved, math.abs(next(j) - old(j)).toDouble)
              j += 1
            }
            (i, next)
          case None => (i, old) // empty cluster keeps its centroid
        }
      }
      it += 1
    }
    centroids
  }

  /** Full fit: deterministic seeded k-means++ init on a bounded
    * uniform sample (the proven IVF init), then distributed Lloyd's
    * over the WHOLE corpus — the part the driver-side trainer cannot
    * do once the data outgrows a sample. */
  def fit(vectors: DataFrame, idCol: String, vecCol: String, k: Int,
          maxIters: Int = 10, tol: Double = 1e-6,
          seed: Long = 42L): Seq[(Int, Array[Float])] = {
    val named = vectors.select(col(idCol).as("vec_id"),
                               col(vecCol).as("embedding"))
    val sample = Similarity.sampleVectors(named, math.max(k * 4, 2048))
    val init = Similarity.trainCentroids(sample, k, iters = 0, seed = seed)
    fitFrom(vectors, idCol, vecCol, init, maxIters, tol)
  }

  /** Prototypicality pruning (cluster-balanced curation): assign every
    * vector, then keep the `keep` fraction of each cluster MOST
    * similar to its centroid (ties to the smallest id). One window
    * over the cluster partitioning after the zero-exchange assign —
    * per-cluster quotas mean no cluster starves, unlike a global
    * similarity cut. */
  def prototypicalPrune(vectors: DataFrame, idCol: String, vecCol: String,
                        centroids: Seq[(Int, Array[Float])],
                        keep: Double): DataFrame = {
    require(keep > 0.0 && keep <= 1.0, s"keep fraction out of (0,1]: $keep")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("centroid_cos").desc, col(idCol))
    assign(vectors, idCol, vecCol, centroids)
      .withColumn("rk", row_number().over(w))
      .withColumn("csize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
      .where(col("rk") <= ceil(col("csize") * lit(keep)))
      .drop("rk", "csize")
  }
}
