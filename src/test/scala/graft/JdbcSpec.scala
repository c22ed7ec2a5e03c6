package graft

import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** Exercises the JDBC source/sink end-to-end against embedded Derby
  * (ships with Spark) — same code path as Postgres, different URL. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("write, parallel range-partitioned read, and incremental read round-trip") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              to_date(col("o_orderdate")).as("o_orderdate"))
    val n = orders.count()
    Jdbc.write(orders, url, "orders_jdbc", props)

    val maxKey = orders.agg(max("o_orderkey")).first().getLong(0)
    val back = Jdbc.read(spark, url, "orders_jdbc", "o_orderkey",
      0, maxKey + 1, numPartitions = 4, props)
    assert(back.count() === n)
    assert(back.rdd.getNumPartitions === 4)
    // values survive the round trip exactly
    val sumIn = orders.agg(sum(col("o_totalprice").cast("decimal(25,6)"))).first().getDecimal(0)
    val sumOut = back.agg(sum(col("o_totalprice").cast("decimal(25,6)"))).first().getDecimal(0)
    assert(sumIn === sumOut)

    // incremental read: WHERE runs on the database side
    val incr = Jdbc.readIncremental(spark, url, "orders_jdbc",
      "o_orderdate", "1996-01-01", "1997-01-01", props)
    val expected = orders.where(
      col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01").count()
    assert(incr.count() === expected)
    assert(expected > 0 && expected < n) // the range genuinely pruned rows

    // prove the predicate executes REMOTELY: the scan relation itself
    // carries the WHERE (it is part of the pushed dbtable subquery),
    // and the Spark plan has no post-load Filter re-applying the range
    val leaves = incr.queryExecution.optimizedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains("\"o_orderdate\" >= '1996-01-01'") &&
           leaves.contains("\"o_orderdate\" < '1997-01-01'"), leaves)
    assert(!incr.queryExecution.optimizedPlan.toString.contains("Filter"),
           incr.queryExecution.optimizedPlan.toString)
  }

  test("JDBC type mapping round-trips timestamps, decimals and NULLs exactly") {
    import spark.implicits._
    // the Postgres-shaped column types the reference moves
    // (timestamptz → TIMESTAMP, numeric → DECIMAL, nullable payloads)
    val df = Seq(
      (1L, "2024-01-15 10:30:00.123456", Some(BigDecimal("12345.670000")), Some("x")),
      (2L, "1999-12-31 23:59:59.999999", Some(BigDecimal("-0.010000")), None),
      (3L, "2024-06-01 00:00:00.0", None, Some(""))
    ).toDF("id", "ts_s", "amt_s", "note")
      .select(col("id"), to_timestamp(col("ts_s")).as("ts"),
              col("amt_s").cast("decimal(12,6)").as("amt"), col("note"))
    Jdbc.write(df, url, "types_jdbc", props)
    val back = Jdbc.read(spark, url, "types_jdbc", "id", 0, 4, 2, props)
    assert(back.schema("ts").dataType ===
           org.apache.spark.sql.types.TimestampType)
    assert(back.schema("amt").dataType ===
           org.apache.spark.sql.types.DecimalType(12, 6))
    val got = back.select("id", "ts", "amt", "note")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getDecimal(2)), Option(r.getString(3)))).toSet
    val want = df.collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getDecimal(2)), Option(r.getString(3)))).toSet
    assert(got === want) // µs timestamps, decimal scale, NULLs all exact
  }
}
