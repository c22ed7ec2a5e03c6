package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators
import graft.functions.Aggregators.Scored

/** Typed TopK aggregator: equals the window top-k on real data while
  * shuffling only k rows per group per map task. */
class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAgg equals window row_number top-k on orders") {
    val k = 5
    val scored = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("grp"),
              col("o_orderkey").as("id"), col("o_totalprice").as("score"))
    val typed = scored.as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(Aggregators.topK(k).toColumn.name("top"))
      .flatMap { case (grp, top) => top.map(s => (grp, s.id, s.score)) }
      .collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
    val windowed = scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k).drop("rk")
      .as[(String, Long, Double)].collect().toSet
    assert(typed === windowed)
    assert(typed.nonEmpty)
  }

  test("TopKAgg is order-insensitive (merge associativity on repartition)") {
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("grp"),
              col("o_orderkey").as("id"), col("o_totalprice").as("score"))
      .as[(String, Long, Double)]
    def run(ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =
      ds.groupByKey(_._1).mapValues(t => Scored(t._2, t._3))
        .agg(Aggregators.topK(3).toColumn.name("top"))
        .collect().toMap
    assert(run(base) === run(base.repartition(17)))
  }
}
