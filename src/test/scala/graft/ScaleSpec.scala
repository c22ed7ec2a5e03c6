package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Lake

class ScaleSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val plain = li.join(orders, "o_orderkey")
    val salted = Skew.saltedJoin(li, orders, "o_orderkey", salts = 8)
    assert(salted.count() === plain.count())
    val ps = plain.agg(sum("l_quantity"), sum("o_totalprice")).first()
    val ss = salted.agg(sum("l_quantity"), sum("o_totalprice")).first()
    assert(ps === ss)
  }

  test("bucketed tables join with no exchange on the bucketed key") {
    Lake.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", 4)
    Lake.writeBucketed(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "lineitem_b", "o_orderkey", 4)
    val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
    // disable auto-broadcast so the test exercises the bucketed path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
