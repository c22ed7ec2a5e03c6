package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangles finds exactly the known triangles of a hand graph") {
    // K4 on {1,2,3,4} (4 triangles) + pendant 5-6 + path 6-7 (0 more)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L)).toDF("u", "v")
    val tris = Graph.triangles(edges).as[(Long, Long, Long)].collect().toSet
    assert(tris.size === 4)
    // every reported triple really is a triangle of the input
    val es = Set((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(5L,6L),(6L,7L))
    def has(a: Long, b: Long) = es((a min b, a max b))
    tris.foreach { case (a, b, c) =>
      assert(has(a, b) && has(b, c) && has(a, c), s"not a triangle: ($a,$b,$c)")
    }
    val counts = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles counts each triangle once on a hub graph (no wedge blowup at the hub)") {
    // star hub 0 with 200 spokes, spokes chained pairwise: spoke i is
    // linked to spoke i+1 for even i -> exactly 100 triangles
    // (0, 2k+1, 2k+2), each counted once; hub degree 200
    val spokes = (1 to 200).map(i => (0L, i.toLong))
    val rungs = (1 to 199 by 2).map(i => (i.toLong, (i + 1).toLong))
    val edges = (spokes ++ rungs).toDF("u", "v")
    val tris = Graph.triangles(edges)
    assert(tris.count() === 100)
    val counts = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(counts(0L) === 100L)
    assert(counts.filter(_._1 != 0L).values.forall(_ == 1L))
  }

  test("topKEdges keeps the union of per-endpoint strongest edges, drops the rest") {
    val w = Seq(
      (1L, 2L, 9L), (1L, 3L, 5L), (2L, 3L, 8L),
      (3L, 4L, 1L), (2L, 4L, 7L)).toDF("u", "v", "w")
    // k=1: 1 keeps (1,2); 2 keeps (1,2); 3 keeps (2,3); 4 keeps (2,4)
    val e1 = Graph.topKEdges(w, 1).as[(Long, Long)].collect().toSet
    assert(e1 === Set((1L, 2L), (2L, 3L), (2L, 4L)))
    // k >= max degree keeps everything
    val e3 = Graph.topKEdges(w, 3).as[(Long, Long)].collect().toSet
    assert(e3 === Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L)))
  }

  test("canonicalEdges dedupes, orders, and drops self-loops") {
    val raw = Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L)).toDF("a", "b")
    val es = Graph.canonicalEdges(raw, "a", "b").as[(Long, Long)].collect().toSet
    assert(es === Set((1L, 2L), (2L, 3L)))
  }
}
