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
}
