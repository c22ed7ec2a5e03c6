package graft

import org.apache.spark.sql.functions._
import graft.operators.SemDedup

/** SemDeDup: planted clusters with known near-dup structure, chain
  * resolution through connected components, exact-dup inheritance,
  * and the paper's far-from-centroid keep rule. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal centroids; vectors near axis 0 or axis 1
  private val cents = Seq((0, Array(1f, 0f, 0f)), (1, Array(0f, 1f, 0f)))

  test("near-dups within a cluster collapse to one kept representative") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f, 0f)),   // cluster 0, near-dup chain a
      (2L, Array(1.0f, 0.02f, 0f)),   // ~ id1 (cos ≈ 1)
      (3L, Array(0.9f, 0.02f, 0.44f)), // cluster 0 but far from 1,2
      (4L, Array(0f, 1f, 0.01f)),     // cluster 1
      (5L, Array(0f, 1f, 0.02f))      // ~ id4
    ).toDF("vec_id", "embedding")
    val out = SemDedup.prune(vecs, "vec_id", "embedding", cents, tau = 0.99)
      .as[(Long, Long, Boolean)].collect()
      .map(r => (r._1, (r._2, r._3))).toMap
    assert(out(1L) === ((1L, true)))
    assert(out(2L) === ((1L, false)))
    assert(out(3L) === ((3L, true)))   // alone in its group
    assert(out(4L) === ((4L, true)))
    assert(out(5L) === ((4L, false)))
  }

  test("exact duplicates inherit the group resolution, never keep") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (7L, Array(1f, 0f, 0f)),  // exact dups
      (9L, Array(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = SemDedup.prune(vecs, "vec_id", "embedding", cents, tau = 0.99)
      .as[(Long, Long, Boolean)].collect()
      .map(r => (r._1, (r._2, r._3))).toMap
    assert(out(1L) === ((1L, true)))
    assert(out(7L) === ((1L, false)))
    assert(out(9L) === ((9L, true)))
  }

  test("a chain a~b~c resolves to ONE component even if a!~c") {
    // cos(a,b) and cos(b,c) above tau, cos(a,c) below — components,
    // not per-pair resolution, must make this one group
    val a = Array(1f, 0.20f, 0f)
    val b = Array(1f, 0.10f, 0f)
    val cc = Array(1f, 0.00f, 0f)
    val vecs = Seq((1L, a), (2L, b), (3L, cc)).toDF("vec_id", "embedding")
    def cos(x: Array[Float], y: Array[Float]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    val tau = 0.995
    assert(cos(a, b) >= tau && cos(b, cc) >= tau && cos(a, cc) < tau)
    val out = SemDedup.prune(vecs, "vec_id", "embedding", cents, tau)
      .as[(Long, Long, Boolean)].collect()
    assert(out.map(_._2).toSet === Set(1L))
    assert(out.count(_._3) === 1)
  }

  test("far_from_centroid keeps the least-prototypical member") {
    val vecs = Seq(
      (1L, Array(1f, 0.00f, 0f)),    // on the centroid axis
      (2L, Array(1f, 0.10f, 0f))     // farther from centroid 0
    ).toDF("vec_id", "embedding")
    val out = SemDedup.prune(vecs, "vec_id", "embedding", cents,
                             tau = 0.99, keepRule = "far_from_centroid")
      .as[(Long, Long, Boolean)].collect()
      .map(r => (r._1, r._3)).toMap
    assert(out === Map(1L -> false, 2L -> true))
  }
}
