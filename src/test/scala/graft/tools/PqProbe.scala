package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Scratch runner backing the ann_pq_recall gate targets: prints
  * recall@10 vs brute force for the IVF-PQ path across rerank widths
  * (rerank = k means the PQ approximate ranking IS the answer; wider
  * rerank lets the exact pass repair quantization error), plus the
  * lossless check at full probe/rerank. Test scope on purpose. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, dir)
      val q = emb.where(col("vec_id") < 20)
      val bf = Similarity.bruteForceTopK(q, emb, 10)
        .select(col("query_id"), col("neighbor_id"))
      val nbf = bf.count()
      for ((np, rr) <- Seq((4, 10), (4, 50), (4, 100), (16, 50))) {
        val hits = Similarity.pqTopK(spark, q, emb, 10,
            cells = 16, nprobe = np, rerank = rr)
          .join(bf, Seq("query_id", "neighbor_id"), "left_semi").count()
        println(s"PQRECALL $dir nprobe=$np rerank=$rr ${hits.toDouble / nbf}")
      }
      // lossless plumbing: full probe + unbounded rerank == brute force
      val full = Similarity.pqTopK(spark, q, emb, 10,
          cells = 16, nprobe = 16, rerank = Int.MaxValue)
        .select(col("query_id"), col("neighbor_id"))
      val diff = full.except(bf).count() + bf.except(full).count()
      println(s"PQFULL $dir symdiff=$diff (0 = lossless)")
    }
    spark.stop()
  }
}
