package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("pqEncode picks the L2-argmin codeword (matches a driver-side recompute)") {
    val emb = Tables.embeddings(spark, sfDir)
    val sample = Similarity.sampleVectors(emb, 2048)
    val m = 8
    val codebooks = Similarity.trainPqCodebooks(sample, m, ksub = 16)
    val got = Similarity.pqEncode(
        emb.where(col("vec_id") < 20)
          .select(col("vec_id"), col("embedding").as("v")), "v", codebooks)
      .select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val vecs = emb.where(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val d = codebooks.head.head._2.length
    for ((id, v) <- vecs; s <- 0 until m) {
      val sub = v.slice(s * d, (s + 1) * d)
      val want = codebooks(s).minBy { case (_, c) =>
        // L2² recomputed independently; ties to the smallest code,
        // matching the argmax's negcode tie-break
        (sub.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum,
         c.hashCode * 0 /* stable */)
      }._1
      assert(got(id)(s) === want,
        s"vec $id subspace $s: engine ${got(id)(s)} != recomputed $want")
    }
  }

  test("pqDecode returns the exact codeword concatenation") {
    val emb = Tables.embeddings(spark, sfDir)
    val sample = Similarity.sampleVectors(emb, 2048)
    val codebooks = Similarity.trainPqCodebooks(sample, 8, ksub = 16)
    val row = Similarity.pqEncode(
        emb.where(col("vec_id") === 3)
          .select(col("vec_id"), col("embedding").as("v")), "v", codebooks)
      .select(col("codes"),
              Similarity.pqDecode(col("codes"), codebooks).as("xhat"))
      .as[(Seq[Int], Seq[Float])].head()
    val want = row._1.zipWithIndex.flatMap { case (c, s) =>
      codebooks(s).find(_._1 == c).get._2
    }
    assert(row._2 === want)
  }

  test("PQ with full probe and unbounded rerank reproduces brute force exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 5)
    val full = Similarity.pqTopK(spark, q, emb, 5,
        cells = 8, nprobe = 8, rerank = Int.MaxValue)
      .select("query_id", "neighbor_id", "rk").as[(Long, Long, Int)].collect().toSet
    val bf = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(full === bf)
  }

  test("IVF-PQ ANN: self is rank-1; recall vs brute force is reasonable") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 5)
    val pq = Similarity.pqTopK(spark, q, emb, 5,
        cells = 8, nprobe = 2, rerank = 50)
    val r1 = pq.where(col("rk") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // the query is its own exact top-1 (cos 1.0); its code decodes to
    // its own cell's codewords, so it survives the approximate cut and
    // the exact re-rank restores it to rank 1
    assert(r1 === Set((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
    val bf = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = pq.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.3, s"recall $recall")
  }
}
