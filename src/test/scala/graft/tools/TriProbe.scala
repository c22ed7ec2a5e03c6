package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, Blocks}
import graft.operators.Graph

/** Ad-hoc stage timing for the triangle_counts pipeline at 100×. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TRIPROBE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val sets = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey").cast("long"))).as("sups"))
    val weighted = sets
      .select(explode(flatten(transform(col("sups"), (x, i) =>
        transform(slice(col("sups"), i + 2, size(col("sups"))), y =>
          struct(x.as("u"), y.as("v")))))).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("w"))

    val w = time("cooccur_build")(weighted.localCheckpoint())
    println(s"TRIPROBE weighted_rows=${w.count()}")
    val edges = time("topk_edges")(Graph.topKEdges(w, 20).localCheckpoint())
    println(s"TRIPROBE edge_rows=${edges.count()}")
    val tri = time("triangles")(Graph.triangles(edges))
    println(s"TRIPROBE triangle_rows=${tri.count()}")
    time("counts_agg") {
      val t = tri
      t.select(col("a").as("node"))
        .union(t.select(col("b").as("node")))
        .union(t.select(col("c").as("node")))
        .groupBy("node").agg(count(lit(1)).as("n_triangles")).count()
    }
    Blocks.freeAll(spark)
    spark.stop()
  }
}
