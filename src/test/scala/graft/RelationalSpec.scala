package graft

class RelationalSpec extends SparkSpec {

  private def plan(name: String): String =
    Queries.all(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q3/q5 broadcast their dimension sides") {
    assert(plan("q3_shipping_priority").contains("BroadcastHashJoin"))
    val p5 = plan("q5_local_volume")
    assert(p5.contains("BroadcastHashJoin"))
  }

  test("q1 aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q1_pricing_summary")
    // partial + final HashAggregate pair around a single exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert("Exchange".r.findAllIn(p).size === 1)
  }

  test("scan_project prunes columns at the parquet scan") {
    val p = plan("scan_project")
    assert(p.contains("o_orderkey") && !p.contains("o_orderdate"))
  }

  test("scan_incremental pushes the range filter to the scan") {
    val p = plan("scan_incremental")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
  }

  test("sessionize reuses one shuffle across both windows and the final agg") {
    val p = plan("events_sessionize")
    // one exchange for user_id; windows + groupBy reuse its partitioning
    assert("Exchange".r.findAllIn(p).size === 1, p)
  }

  test("analytics queries return plausible shapes") {
    assert(Queries.q1PricingSummary(spark, sfDir).count() === 6)
    val q5n = Queries.q5LocalVolume(spark, sfDir).count()
    assert(q5n >= 1 && q5n <= 5) // ≤5 ASIA nations; sparse at sf0.001
    val topk = Queries.topkOrdersPerCust(spark, sfDir)
    import org.apache.spark.sql.functions._
    val maxPer = topk.groupBy("o_custkey").count().agg(max("count")).first().getLong(0)
    assert(maxPer <= 3)
  }
}
