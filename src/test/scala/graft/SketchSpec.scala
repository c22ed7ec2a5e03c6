package graft

import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 10% of exact; approx median within 5% of exact") {
    val approx = Queries.sketchStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"),
           expr("percentile(o_totalprice, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (n, med)) =>
      val (an, amed) = approx(k)
      assert(math.abs(an - n).toDouble / n < 0.10, s"$k distinct: $an vs $n")
      assert(math.abs(amed - med) / med < 0.05, s"$k median: $amed vs $med")
    }
  }

  test("HLL sketches are mergeable: union of daily == one-shot estimate") {
    // the property the NDV cube depends on — merging per-day sketches
    // must give the SAME estimate as sketching the month directly
    // (HLL union is lossless over registers)
    val orders = Tables.orders(spark, sfDir)
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
    val merged = orders
      .groupBy(col("month"), col("o_orderdate"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .groupBy(col("month"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = orders.groupBy(col("month"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === d)
  }
}
