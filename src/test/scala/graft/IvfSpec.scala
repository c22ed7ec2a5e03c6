package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF ANN: self is rank-1; recall vs brute force is reasonable") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 5)
    val ivf = Similarity.ivfTopK(spark, q, emb, 5, cells = 8, nprobe = 2)
    val r1 = ivf.where(col("rk") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(r1 === Set((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))

    val bf = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = ivf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // probing 2/8 cells: expect a meaningful fraction of true top-5
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("hardNegatives: never a same-label neighbor, equals filtered brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 5)
    val hn = Similarity.hardNegatives(q, emb, "label", k = 4)
    assert(hn.where(col("qlabel") === col("nlabel")).count() === 0)
    assert(hn.groupBy("query_id").count()
      .where(col("count") =!= 4).count() === 0)
    // must equal brute-force top-k over the pre-filtered corpus,
    // query by query (the filter runs BEFORE the rank, not after)
    val labels = q.select("vec_id", "label").as[(Long, Int)].collect()
    for ((qid, ql) <- labels) {
      val expect = Similarity.bruteForceTopK(
        q.where(col("vec_id") === qid), emb.where(col("label") =!= ql), 4)
        .select("neighbor_id", "rk").as[(Long, Int)].collect().toSet
      val got = hn.where(col("query_id") === qid)
        .select("neighbor_id", "rk").as[(Long, Int)].collect().toSet
      assert(got === expect, s"query $qid")
    }
  }

  test("assignCells picks the cosine argmax; ties go to the smallest cell") {
    val cents = Seq((0, Array(1f, 0f)), (1, Array(0f, 1f)), (2, Array(1f, 0f)))
    val df = Seq((1L, Array(2f, 0.5f)), (2L, Array(0f, 3f))).toDF("id", "vec")
    val got = Similarity.assignCells(df, "vec", cents)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    // cell 2 duplicates cell 0's direction → the tie breaks to cell 0
    assert(got === Map(1L -> 0, 2L -> 1))
  }

  test("rrfFuse: hand-checked scores, absent-list zeros, id tie-break, 3 lists") {
    // list A ranks docs 1,2,3; list B ranks 2,3,4 — doc 2 and 3 get
    // two contributions, 1 and 4 one each
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rk")
    val b = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("doc_id", "rk")
    val fused = Similarity.rrfFuse(Seq(a, b), "doc_id", "rk", kRrf = 60,
        topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val score = fused.map(t => t._1 -> t._2).toMap
    assert(score(2L) === 1.0 / 62 + 1.0 / 61)
    assert(score(3L) === 1.0 / 63 + 1.0 / 62)
    assert(score(1L) === 1.0 / 61)
    assert(score(4L) === 1.0 / 63)
    // doc 1 (rank 1 in A only) and doc 4 (rank 3 in B only) differ;
    // ranking: 2, 3, 1, 4
    assert(fused.sortBy(_._3).map(_._1).toSeq === Seq(2L, 3L, 1L, 4L))
    // equal contributions tie-break on id: two docs each only rank-1
    val x = Seq((7L, 1)).toDF("doc_id", "rk")
    val y = Seq((5L, 1)).toDF("doc_id", "rk")
    val tie = Similarity.rrfFuse(Seq(x, y), "doc_id", "rk", topK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(tie.sortBy(_._2).map(_._1).toSeq === Seq(5L, 7L))
    // three lists fold in fixed order
    val c = Seq((1L, 1)).toDF("doc_id", "rk")
    val three = Similarity.rrfFuse(Seq(a, b, c), "doc_id", "rk", topK = 1)
      .collect().head
    assert(three.getLong(0) === 1L || three.getLong(0) === 2L)
    // doc 1: 1/61 (A) + 1/61 (C) vs doc 2: 1/62 + 1/61 — doc 1 wins
    assert(three.getLong(0) === 1L)
    assert(three.getDouble(1) === (1.0 / 61 + 0.0) + 1.0 / 61)
  }

  test("IVF with nprobe = cells reproduces brute force exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 5)
    val full = Similarity.ivfTopK(spark, q, emb, 5, cells = 8, nprobe = 8)
      .select("query_id", "neighbor_id", "rk").as[(Long, Long, Int)].collect().toSet
    val bf = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(full === bf)
  }
}
