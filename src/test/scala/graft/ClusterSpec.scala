package graft

import org.apache.spark.sql.functions._
import graft.operators.Cluster

/** Distributed k-means: exact parity against an independent
  * driver-side Lloyd's on INTEGER-planted vectors (sums of small ints
  * are exact in double regardless of accumulation order, so the
  * distributed VecSumAgg update and the sequential reference produce
  * bit-identical centroids — parity is deterministic, not
  * probabilistic), plus empty-cluster and convergence behavior. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated integer lobes in dim 4, 60 points each, plus a
  // deterministic within-lobe spread that keeps every cosine tie-free
  private def planted: Seq[(Long, Seq[Float])] =
    (0 until 180).map { i =>
      val lobe = i % 3
      val base = Seq(Array(9f, 1f, 0f, 0f), Array(0f, 9f, 1f, 0f),
                     Array(0f, 0f, 9f, 1f)).apply(lobe)
      val jit = ((i / 3) % 4).toFloat // 0..3 integer jitter on a tail coord
      val v = base.clone()
      v(3) = v(3) + jit
      (i.toLong, v.toSeq)
    }

  private def cosineRef(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    d / math.sqrt(na * nb)
  }

  /** Sequential reference Lloyd's with the operator's conventions:
    * cosine ranking, ties to smallest cluster id, mean update, empty
    * cluster keeps its centroid. */
  private def refLloyd(pts: Seq[(Long, Seq[Float])],
                       init: Seq[(Int, Array[Float])],
                       iters: Int): Seq[(Int, Array[Float])] = {
    var cents = init.sortBy(_._1)
    for (_ <- 0 until iters) {
      val byCluster = pts.groupBy { case (_, v) =>
        cents.map { case (ci, cv) => (-cosineRef(v, cv.toSeq), ci) }.min._2
      }
      cents = cents.map { case (ci, old) =>
        byCluster.get(ci) match {
          case Some(members) =>
            val dim = old.length
            val s = new Array[Double](dim)
            members.foreach { case (_, v) =>
              var j = 0; while (j < dim) { s(j) += v(j); j += 1 }
            }
            (ci, s.map(x => (x / members.size).toFloat))
          case None => (ci, old)
        }
      }
    }
    cents
  }

  private lazy val df = planted.toDF("vec_id", "embedding")

  private val init: Seq[(Int, Array[Float])] = Seq(
    0 -> Array(5f, 5f, 0f, 0f), // between lobes 0 and 1
    1 -> Array(0f, 5f, 5f, 0f), // between lobes 1 and 2
    2 -> Array(1f, 0f, 8f, 2f)) // near lobe 2

  test("fitFrom matches an independent sequential Lloyd's bit-for-bit") {
    for (iters <- Seq(1, 3)) {
      val got = Cluster.fitFrom(df, "vec_id", "embedding", init,
                                maxIters = iters, tol = 0.0)
      val want = refLloyd(planted, init, iters)
      assert(got.map(_._1) === want.map(_._1))
      for (((gi, gv), (_, wv)) <- got.zip(want))
        assert(gv.toSeq === wv.toSeq, s"centroid $gi after $iters iters")
    }
  }

  test("assignment parity: distributed argmax equals the reference") {
    val cents = refLloyd(planted, init, 2)
    val got = Cluster.assign(df, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("cluster_id"))
      .as[(Long, Int)].collect().toMap
    val want = planted.map { case (id, v) =>
      id -> cents.map { case (ci, cv) => (-cosineRef(v, cv.toSeq), ci) }.min._2
    }.toMap
    assert(got === want)
  }

  test("an empty cluster keeps its centroid") {
    val far = Seq(0 -> Array(9f, 1f, 0f, 1f),
                  1 -> Array(-1f, -1f, -1f, -1f)) // opposite cone: wins nothing
    val out = Cluster.fitFrom(df, "vec_id", "embedding", far, maxIters = 2,
                              tol = 0.0)
    assert(out.find(_._1 == 1).get._2.toSeq === Seq(-1f, -1f, -1f, -1f))
  }

  test("tol stops iteration at the fixpoint") {
    // lobes are well separated: one iteration reaches the fixpoint, so
    // maxIters=10 with tol>0 must equal the 2-iteration run exactly
    val a = Cluster.fitFrom(df, "vec_id", "embedding", init, maxIters = 10,
                            tol = 1e-9)
    val b = Cluster.fitFrom(df, "vec_id", "embedding", init, maxIters = 2,
                            tol = 0.0)
    for (((_, av), (_, bv)) <- a.zip(b)) assert(av.toSeq === bv.toSeq)
  }

  test("full fit produces k non-degenerate clusters on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = Cluster.fit(emb, "vec_id", "embedding", k = 4, maxIters = 3)
    assert(cents.size === 4)
    val sizes = Cluster.assign(emb, "vec_id", "embedding", cents)
      .groupBy("cluster_id").count().as[(Int, Long)].collect().toMap
    assert(sizes.values.sum === emb.count())
    // seeded kmeans++ on 500 near-uniform vectors: no cluster collapses
    assert(sizes.size === 4, sizes.toString)
  }

  test("k=1 assignment degenerates to a constant cluster") {
    val one = Cluster.assign(df, "vec_id", "embedding",
                             Seq(3 -> Array(1f, 1f, 1f, 1f)))
    assert(one.select(col("cluster_id")).distinct()
      .as[Int].collect().toSeq === Seq(3))
  }

  test("update step partial-aggregates map-side (no member lists move)") {
    val p = Cluster.updateStep(
      Cluster.assign(df.repartition(4), "vec_id", "embedding", init),
      "embedding").queryExecution.executedPlan.toString
    assert(p.contains("partial"), p)
  }

  test("assignment is a zero-exchange per-row argmax") {
    val p = Cluster.assign(Tables.embeddings(spark, sfDir), "vec_id",
                           "embedding", init)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
