package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.operators.{Cluster, Similarity}

/** Scratch profiler for the literal-centroid assignment path: times
  * nearest-centroid assignment at several k over a real embeddings
  * table, separating the argmax projection cost from the VecSumAgg
  * update shuffle. Drove the r7 NearestCentroid expression work.
  *
  * Usage: Test/runMain graft.tools.ClusterProbe /tmp/sf100x
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir).localCheckpoint()
    val n = emb.count()
    println(s"PROBE rows=$n")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label rows=$r sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    for (k <- Seq(4, 16, 64)) {
      val cents = Similarity.trainCentroids(
        Similarity.sampleVectors(
          emb.select(col("vec_id"), col("embedding")), math.max(k * 4, 2048)),
        k, iters = 0)
      // NOTE: consume the VALUE (collect the sum), not .count() of the
      // agg — count() of a global aggregate is optimized to a constant
      // and never evaluates the assignment at all
      time(s"assign_cosine_k$k")(
        Cluster.assign(emb, "vec_id", "embedding", cents)
          .agg(sum("cluster_id")).collect()(0).getLong(0))
      time(s"assign_dot_k$k")(
        Similarity.assignCells(emb.select(col("embedding").as("cvec")),
                               "cvec", cents)
          .agg(sum("cell")).collect()(0).getLong(0))
      time(s"update_step_k$k")(
        Cluster.updateStep(
          Cluster.assign(emb, "vec_id", "embedding", cents), "embedding")
          .count())
      time(s"update_step_ckpt_k$k") {
        val assigned = Cluster.assign(emb, "vec_id", "embedding", cents)
          .select("cluster_id", "embedding").localCheckpoint()
        val r = Cluster.updateStep(assigned, "embedding").count()
        Blocks.freeCheckpoint(assigned); r
      }
      time(s"update_step_explode_k$k") {
        Cluster.assign(emb, "vec_id", "embedding", cents)
          .select(col("cluster_id"), posexplode(col("embedding")))
          .groupBy(col("cluster_id"), col("pos"))
          .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
          .count()
      }
    }
    spark.stop()
  }
}
