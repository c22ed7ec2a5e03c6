package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.functions.TextFunctions

/** Scratch profiler (test scope — never ships): stage timings for
  * dedup_clusters at an arbitrary SF dir. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val toks = Tables.documents(spark, dir).where(col("doc_id") < 200)
      .select(col("doc_id"),
        array_distinct(split(TextFunctions.normalize(col("text")), " ")).as("toks"))
    val pairs = toks.as("a").join(toks.as("b"), col("a.doc_id") < col("b.doc_id"))
      .where((size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
        size(array_union(col("a.toks"), col("b.toks"))).cast("double")) >= 0.95)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("pairs.count 1st")(println(pairs.count()))
    time("pairs.count 2nd")(println(pairs.count()))
    time("clusters 1st")(
      println(graft.operators.Dedup.clusters(pairs, "doc_a", "doc_b").count()))
    graft.Blocks.freeAll(spark)
    time("clusters 2nd")(
      println(graft.operators.Dedup.clusters(pairs, "doc_a", "doc_b").count()))
    spark.stop()
  }
}
