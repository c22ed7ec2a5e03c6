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
}
