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

  test("q6 pushes all three band predicates to the parquet scan, joins nothing") {
    // the scan's metadata string truncates at 100 chars by default,
    // which would hide the later pushed filters from the assertion
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val p = plan("q6_forecast_revenue")
      assert(!p.contains("Join"), p)
      val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
      assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
             pushed.contains("GreaterThanOrEqual(l_discount") &&
             pushed.contains("LessThanOrEqual(l_discount") &&
             pushed.contains("LessThan(l_quantity"), pushed)
    } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
  }

  test("q4 plans the EXISTS as a semi join, not an aggregate-then-join") {
    val p = plan("q4_priority_exists")
    assert(p.contains("LeftSemi"), p)
  }

  test("q8 market share is consistent: 0 <= share <= 1 and volumes add up") {
    import org.apache.spark.sql.functions._
    val rows = Queries.q8MarketShare(spark, sfDir)
      .where(col("mkt_share") < 0 || col("mkt_share") > 1 ||
             col("share_volume") > col("total_volume"))
    assert(rows.count() === 0)
  }

  test("q15 returns every supplier tied at the maximum, and only those") {
    import org.apache.spark.sql.functions._
    val top = Queries.q15TopSupplier(spark, sfDir)
    val revs = top.select("total_revenue").distinct().count()
    assert(revs === 1) // all returned rows share the max revenue
    // recompute independently: the max must match
    val expect = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(13,6)) * (1 - CAST(l_discount AS DECIMAL(7,6)))").cast("decimal(25,6)")).cast("double").as("r"))
      .agg(max("r")).first().getDouble(0)
    assert(top.first().getAs[Double]("total_revenue") === expect)
  }

  test("q16 deny list really excludes negative-balance suppliers") {
    import org.apache.spark.sql.functions._
    val bad = Tables.supplier(spark, sfDir)
      .where(col("s_acctbal") < 0).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    if (bad.nonEmpty) {
      // rebuild the per-group distinct sets WITHOUT the anti join and
      // check every excluded supplier is absent from the gated result
      val withBad = Tables.lineitem(spark, sfDir)
        .join(Tables.part(spark, sfDir),
              col("l_partkey") === col("p_partkey"))
        .where(col("p_brand") =!= "Brand#1" &&
               col("l_suppkey").isin(bad.toSeq: _*))
      assert(withBad.count() > 0) // the deny list actually bites…
      val gated = Queries.q16SupplierVariety(spark, sfDir)
        .agg(org.apache.spark.sql.functions.sum("supplier_cnt")).first().getLong(0)
      val full = Tables.lineitem(spark, sfDir)
        .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
        .where(col("p_brand") =!= "Brand#1")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("c"))
        .agg(org.apache.spark.sql.functions.sum("c")).first().getLong(0)
      assert(gated < full) // …and the gated counts are strictly smaller
    }
  }

  test("q10/q9 broadcast dims and keep fact joins shuffle-side") {
    for (q <- Seq("q10_returned_items", "q9_profit_by_nation", "q8_market_share")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: no broadcast join")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian")
    }
  }
}
