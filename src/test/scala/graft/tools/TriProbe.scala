package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    val pairs = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    time("pairs.distinct")(pairs.count())
    val edges = pairs.as("a")
      .join(pairs.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .agg(count(lit(1)).as("w")).where(col("w") >= 5)
      .select(col("u").cast("long"), col("v").cast("long"))
    time("edges")(edges.count())
    val e = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("edges.persist")(e.count())
    val tris = graft.operators.Graph.triangles(e)
    time("triangles")(tris.count())
    val tc = graft.operators.Graph.triangleCounts(e)
    time("triangleCounts")(tc.count())
    spark.stop()
  }
}
