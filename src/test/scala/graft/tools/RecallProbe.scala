package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Scratch runner backing the ann_ivf_recall gate targets: prints
  * recall@10 vs brute force for nprobe 1/2/4/8 at sf0.01 and sf0.1.
  * Test scope on purpose — tooling, not engine code. Run:
  * java -cp test-classes:classes:spark-jars graft.tools.RecallProbe */
object RecallProbe {
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
      for (np <- Seq(1, 2, 4, 8)) {
        val hits = Similarity.ivfTopK(spark, q, emb, 10,
            cells = 16, nprobe = np)
          .join(bf, Seq("query_id", "neighbor_id"), "left_semi").count()
        println(s"RECALL $dir nprobe=$np ${hits.toDouble / nbf}")
      }
    }
    spark.stop()
  }
}
