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

  test("kcore peels a hand graph to its known core") {
    // triangle {1,2,3} + pendant chain 3-4-5: the 2-core is exactly
    // the triangle, and finding it REQUIRES cascade (after round 1
    // drops 5, node 4 still has degree 1 and must drop in round 2)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val core = Graph.kcore(edges, k = 2, maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the max degree empties the graph
    assert(Graph.kcore(edges, k = 5, maxIters = 10).count() === 0L)
  }

  test("kcore reaches a nonempty fixpoint on the planted gate gadget within budget") {
    // the kcore_sound gate construction: 16 blocks of K8 core (deg 7,
    // survives k=4 forever) + a 3-node cascade chain — c1 deg 3 (peels
    // round 1), c2 deg 4 losing c1 (round 2), c3 deg 4 losing c2
    // (round 3); round 4 is the fixpoint confirmation. Survivor counts
    // must walk 160 -> 144 -> 128 -> 128, proving the cascade is a
    // genuine multi-round peel a one-pass degree filter cannot fake.
    val raw = (0 until 176).flatMap { i =>
      val r = i % 11; val base = i - r
      val core = if (r < 8) (r + 1 to 7).map(s => (i.toLong, (base + s).toLong))
                 else Seq.empty
      val attach = (r match {
        case 8  => Seq(9, 0, 1)
        case 9  => Seq(10, 2, 3)
        case 10 => Seq(4, 5, 6)
        case _  => Seq.empty[Int]
      }).map(s => (i.toLong, (base + s).toLong))
      core ++ attach
    }.toDF("a", "b")
    val edges = Graph.canonicalEdges(raw, "a", "b")
    def run(iters: Int) = Graph.kcore(edges, k = 4, maxIters = iters)
      .as[(Long, Long)].collect().toSet
    val at4 = run(4)
    assert(at4 === run(8), "gate's 4-round budget is not a fixpoint")
    assert(at4.size === 128 && at4.forall(_._2 === 7L),
      "fixpoint must be exactly the 16 K8 cores at within-core degree 7")
    assert(run(1).size === 160, "round 1 must peel exactly the 16 c1 nodes")
    assert(run(2).size === 144, "round 2 must cascade-peel the 16 c2 nodes")
    assert(run(3).size === 128, "round 3 must cascade-peel the 16 c3 nodes")
  }

  test("ktruss peels a hand graph to its known truss") {
    // K4 on {1,2,3,4} (every edge in 2 triangles) + pendant triangle
    // {4,5,6} (each edge in 1): the 4-truss is exactly the K4, and the
    // pendant triangle's edges must peel TOGETHER in round 1
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("u", "v")
    val t4 = Graph.ktruss(edges, k = 4, maxIters = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(t4 === Set((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
    // k above the strongest support empties the graph
    assert(Graph.ktruss(edges, k = 5, maxIters = 10).count() === 0L)
    // the pendant triangle alone IS a 3-truss (support >= 1 everywhere)
    val t3 = Graph.ktruss(edges, k = 3, maxIters = 10).count()
    assert(t3 === 9L)
  }

  test("bfs distances: hop counts, multi-seed min, reached-only contract") {
    val path = (1L to 5L).map(i => (i, i + 1)).toDF("s", "d")
    val one = Graph.bfsDistances(path, "s", "d", Seq(1L).toDF("n"), "n",
        maxIters = 3)
      .as[(Long, Long)].collect().toMap
    assert(one === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // two seeds: every node takes the NEARER one
    val two = Graph.bfsDistances(path, "s", "d", Seq(1L, 4L).toDF("n"), "n",
        maxIters = 3)
      .as[(Long, Long)].collect().toMap
    assert(two === Map(1L -> 0L, 2L -> 1L, 3L -> 2L,
                       4L -> 0L, 5L -> 1L, 6L -> 2L))
    // monotone: once converged, extra rounds are no-ops
    val more = Graph.bfsDistances(path, "s", "d", Seq(1L, 4L).toDF("n"), "n",
        maxIters = 6)
      .as[(Long, Long)].collect().toMap
    assert(more === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L,
                        5L -> 1L, 6L -> 2L))
  }

  test("sssp takes the cheaper multi-hop path and rejects negative weights") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5 — Bellman-Ford must
    // prefer the longer-hop cheaper path (a BFS impostor cannot)
    val g = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
      .toDF("s", "d", "w")
    val dist = Graph.ssspDistances(g, "s", "d", "w", Seq(1L).toDF("n"), "n",
        maxIters = 3)
      .as[(Long, Long)].collect().toMap
    assert(dist === Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
    // one round only: the relaxation hasn't seen the 2-hop path yet
    val r1 = Graph.ssspDistances(g, "s", "d", "w", Seq(1L).toDF("n"), "n",
        maxIters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1(3L) === 10L && r1(2L) === 2L)
    intercept[IllegalArgumentException] {
      Graph.ssspDistances(Seq((1L, 2L, -1L)).toDF("s", "d", "w"),
        "s", "d", "w", Seq(1L).toDF("n"), "n")
    }
  }

  test("ktruss cascade on one gate-gadget block needs two peel rounds") {
    // one block of the ktruss_sound gadget: K5 {0..4} + triangle path
    // {5..9}; outer tail edges peel round 1 (support 1), the inner
    // (6,7),(7,8) start at support 2 but lose both triangles to round
    // 1's peel and die in round 2 — survivor counts walk 17→12→10→10
    val edges = (
      (for (a <- 0 to 4; b <- a + 1 to 4) yield (a.toLong, b.toLong)) ++
      Seq((5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L),
          (5L, 7L), (6L, 8L), (7L, 9L))).toDF("u", "v")
    def run(iters: Int) = Graph.ktruss(edges, k = 4, maxIters = iters)
    assert(run(1).count() === 12)
    assert(run(2).count() === 10)
    val at3 = run(3).as[(Long, Long, Long)].collect().toSet
    assert(at3 === run(6).as[(Long, Long, Long)].collect().toSet,
      "3-round budget is not a fixpoint")
    assert(at3.size === 10 && at3.forall(_._3 === 3L),
      "fixpoint must be the K5 with every edge in 3 triangles")
  }
}
