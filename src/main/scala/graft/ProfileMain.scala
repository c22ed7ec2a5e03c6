package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler — not part of the engine. */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.TextFunctions

    val docs = Tables.documents(spark, sfDir)
    val toks = docs.where(col("doc_id") < 200)
      .select(col("doc_id"),
        array_distinct(split(TextFunctions.normalize(col("text")), " ")).as("toks"))
    val pairs = toks.as("a").join(toks.as("b"), col("a.doc_id") < col("b.doc_id"))
      .where((size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
        size(array_union(col("a.toks"), col("b.toks"))).cast("double")) >= 0.95)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    var t0 = System.nanoTime()
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().localCheckpoint()
    println(f"CLROUND edges ${(System.nanoTime()-t0)/1e9}%6.2f s n=${edges.count()}")
    def repSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(sum(col("rep").cast("decimal(38,0)"))).head.getDecimal(0)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("rep", col("id")).localCheckpoint(eager = false)
    var prev = repSum(labels)
    var converged = false
    var round = 0
    while (!converged) {
      round += 1
      t0 = System.nanoTime()
      val prop = edges.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("rep"))
        .union(labels)
        .groupBy("id").agg(min("rep").as("rep"))
        .localCheckpoint(eager = false)
      val cur = repSum(prop)
      converged = cur.compareTo(prev) == 0
      prev = cur
      labels = prop
      println(f"CLROUND round $round ${(System.nanoTime()-t0)/1e9}%6.2f s sum=$cur")
    }
    spark.stop()
  }
}
