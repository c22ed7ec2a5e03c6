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
