package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse analytics over the star schema — the query surface the
  * reference's warehouse tables feed (README.md:761-762: "plugged to BI
  * platform"; README.md:826-827: time-series model inputs).
  *
  * Scale notes (100 TB):
  *  - dims (`region`, `nation`, and filtered `customer`) are broadcast —
  *    the fact side never shuffles for them; only fact-fact joins
  *    (orders ⋈ lineitem) shuffle, on their join key.
  *  - every agg goes partial→final (map-side combine), sums through
  *    DECIMAL so plan-order never changes results.
  *  - top-k per group is a single window over one shuffle; ordering is
  *    value-total (unique key tiebreak) so results are deterministic.
  */
object Relational {

  /** Decimal-exact sum of a double expr, surfaced as double. */
  private[graft] def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(25,6)")).cast("double")

  /** Exact GLOBAL rank without the one-task global window: fixed-width
    * value buckets, per-bucket counts folded into cumulative offsets
    * (bucket-table-sized, broadcast), within-bucket row_number +
    * offset. Rank order is (value, tie) ascending — a total order when
    * `tieCol` is unique, so the result is deterministic and equals the
    * naive global window bit-for-bit (RelationalSpec proves it on the
    * Gini path) while every window stays bucket-parallel. Appends
    * column `r` (1-based rank). `bucketWidth` only balances
    * parallelism — correctness never depends on it, but
    * `range / bucketWidth` must stay ≤ `maxBuckets` (the offset
    * cumsum's declared bound, [[graft.plans.Bounds.declare]]): the
    * bucket table is value-RANGE-sized, not data-sized, so the bound
    * is a domain contract — violating it raises loudly with this
    * message rather than queuing range/width one-task rows. */
  private[graft] def bucketedGlobalRank(df: org.apache.spark.sql.DataFrame,
                                        valueCol: String, tieCol: String,
                                        bucketWidth: Long,
                                        maxBuckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("__bkt",
      floor(col(valueCol) / bucketWidth).cast("long"))
    val offs = graft.plans.Bounds.declare(
        b.groupBy(col("__bkt")).agg(count(lit(1)).as("__c")),
        maxBuckets, s"bucketedGlobalRank($valueCol) bucket table - raise bucketWidth")
      .withColumn("__off",
        coalesce(sum(col("__c")).over(
          Window.orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    b.join(broadcast(offs), "__bkt")
      .withColumn("r",
        row_number().over(Window.partitionBy(col("__bkt"))
          .orderBy(col(valueCol), col(tieCol))) + col("__off"))
      .drop("__bkt")
  }

  /** [[bucketedGlobalRank]] plus an exact global RUNNING SUM of
    * `sumCol` in the same (value, tie) order — rank machinery reused:
    * per-bucket counts AND sums fold into broadcast offsets, the
    * within-bucket window carries both row_number and a running sum.
    * Appends `r` (1-based global rank) and `cum` (inclusive running
    * sum of `sumCol` — exact when `sumCol` is integral or decimal).
    * The one-task pattern this replaces (a naked
    * `sum over (ORDER BY ... ROWS UNBOUNDED PRECEDING)`) queues the
    * ENTIRE input on one task; here every window is bucket-parallel
    * and only the bucket-table cumsum is single-task.
    *
    * `bucketCol` must be a MONOTONE NON-DECREASING function of the
    * (valueCol, tieCol) order with ≤ maxBuckets distinct values —
    * fixed-width `floor(value/width)` for range-bounded values, a
    * log-scale `-floor(log2(n))` for heavy-tailed counts (≤ 64 buckets
    * for ANY long, so the bound holds by TYPE, not by data). Equality
    * with the naive one-task window is pinned in RelationalSpec. */
  private[graft] def bucketedGlobalCumsum(df: org.apache.spark.sql.DataFrame,
                                          valueCol: String, tieCol: String,
                                          sumCol: String,
                                          bucketCol: org.apache.spark.sql.Column,
                                          maxBuckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("__bkt", bucketCol.cast("long"))
    val offs = graft.plans.Bounds.declare(
        b.groupBy(col("__bkt")).agg(count(lit(1)).as("__c"),
                                    sum(col(sumCol)).as("__s")),
        maxBuckets, s"bucketedGlobalCumsum($valueCol) bucket table - raise bucketWidth")
      .withColumn("__off",
        coalesce(sum(col("__c")).over(
          Window.orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__soff",
        coalesce(sum(col("__s")).over(
          Window.orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"), col("__soff"))
    val w = Window.partitionBy(col("__bkt"))
      .orderBy(col(valueCol), col(tieCol))
    b.join(broadcast(offs), "__bkt")
      .withColumn("r", row_number().over(w) + col("__off"))
      .withColumn("cum",
        sum(col(sumCol)).over(w.rowsBetween(Window.unboundedPreceding, 0)) +
          col("__soff"))
      .drop("__bkt", "__off", "__soff")
  }

  /** Dense 0-based rank by an orderable (string) key WITHOUT a global
    * window: range-partition on the key (partition index order IS key
    * order under RangePartitioning), row_number within each partition,
    * plus per-partition offsets — a partition-count-sized array, the
    * legitimate driver-side plan input (the probeCells discipline).
    * Requires distinct keys (callers rank a groupBy output); equals
    * `row_number() OVER (ORDER BY key) - 1` bit-for-bit while every
    * window stays partition-parallel. The sibling of
    * [[bucketedGlobalRank]] for keys with no numeric bucket width. */
  private[graft] def rangedDenseRank(df: org.apache.spark.sql.DataFrame,
                                     keyCol: String, idCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    // localCheckpoint pins the (sampled) range bounds so the counts
    // collect and the final projection see the SAME partition ids
    val ranged = df.repartitionByRange(p, col(keyCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val o = (pid, acc); acc += c; o }
    val offDf = broadcast(
      spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(col(keyCol))
    ranged.join(offDf, "__pid")
      .withColumn(idCol,
        row_number().over(w).cast("long") - 1L + col("__off"))
      .drop("__pid")
  }

  /** l_extendedprice·(1−l_discount) with the CASTS ON THE FACTORS:
    * 2-decimal source values convert to DECIMAL tie-free, and decimal
    * multiplication is exact — so the sum is bit-identical across
    * engines at ANY scale. Casting the double PRODUCT instead can tie
    * at the 7th digit, where Spark (shortest-repr HALF_UP) and DuckDB
    * (exact-binary rounding) disagree by 1e-6 per row — invisible at
    * small SF, a visible ULP once sums reach 1e10+.
    *
    * Callers sum via dsum (product re-cast to scale 6 — LOSSLESS, the
    * exact product has ≤4 frac digits): a scale-12 running sum's
    * scaled int128 exceeds 2^53 past ~1e9 totals, where DuckDB's
    * decimal→double conversion double-rounds. Scale 6 keeps the final
    * cast on the exactly-roundable path on both engines. */
  private[graft] def discPriceDec =
    col("l_extendedprice").cast("decimal(13,6)") *
      (lit(1) - col("l_discount").cast("decimal(7,6)"))

  /** discPrice·(1+l_tax), same exact-decimal scheme (≤6 frac digits —
    * the scale-6 re-cast in dsum stays lossless). */
  private[graft] def chargeDec =
    discPriceDec * (lit(1) + col("l_tax").cast("decimal(7,6)"))


  /** TPC-H Q1-style pricing summary. */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    lineitem
      .where(col("l_shipdate") <= cutoff)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(discPriceDec).as("sum_disc_price"),
        dsum(chargeDec).as("sum_charge"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style: revenue of a market segment's orders. The customer
    * dim is filtered then broadcast; orders⋈lineitem shuffles once. */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String,
                       orderBefore: String, shipAfter: String): DataFrame =
    lineitem.where(col("l_shipdate") > shipAfter)
      .join(orders.where(col("o_orderdate") < orderBefore),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.where(col("c_mktsegment") === segment)),
            col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(discPriceDec).as("revenue"))

  /** TPC-H Q5-style: revenue by nation where customer and supplier share
    * the nation, within one region and order-date year. */
  def localSupplierVolume(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          orders: DataFrame, lineitem: DataFrame,
                          regionName: String, from: String, to: String): DataFrame = {
    val nations = broadcast(
      nation.join(broadcast(region.where(col("r_name") === regionName)),
                  col("n_regionkey") === col("r_regionkey")))
    lineitem
      .join(orders.where(col("o_orderdate") >= from && col("o_orderdate") < to),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(customer,
            col("o_custkey") === col("c_custkey") &&
              col("c_nationkey") === col("s_nationkey"))
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(discPriceDec).as("revenue"))
  }

  /** Top-k rows per group; `order` must be value-total (include a
    * unique column) or results are nondeterministic. */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String],
                   order: Seq[org.apache.spark.sql.Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** TPC-H Q4-style: order count per priority where EXISTS a line item
    * fulfilled late (shipped > `lateDays` after the order date — the
    * schema has no commit/receipt dates, so lateness is measured
    * against o_orderdate, which moves the date predicate INTO the
    * join condition; Catalyst still plans it as a left-semi with the
    * inequality as a post-probe filter). One shuffle on orderkey; the
    * count-by-priority agg rides the broadcast-sized result. */
  def lateExistsByPriority(orders: DataFrame, lineitem: DataFrame,
                           from: String, to: String,
                           lateDays: Int): DataFrame = {
    val o = orders.where(col("o_orderdate") >= from && col("o_orderdate") < to)
    o.join(lineitem,
           col("l_orderkey") === col("o_orderkey") &&
             col("l_shipdate") > col("o_orderdate") +
               expr(s"INTERVAL $lateDays DAYS"),
           "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q6-style forecast-revenue: pure scan-filter-agg. All three
    * predicates push to the parquet scan (no join at all); revenue is
    * price·discount with casts on the factors so the single output
    * double is bit-stable cross-engine. The 100 TB shape: a full-fact
    * scan whose row-group min/max on l_shipdate skips most of the
    * table when the lake is date-clustered (Lake.writeSorted). */
  def forecastRevenue(lineitem: DataFrame, from: String, to: String,
                      discLo: Double, discHi: Double,
                      qtyBelow: Double): DataFrame =
    lineitem
      .where(col("l_shipdate") >= from && col("l_shipdate") < to &&
             col("l_discount").between(discLo, discHi) &&
             col("l_quantity") < qtyBelow)
      .agg(dsum(col("l_extendedprice").cast("decimal(13,6)") *
                col("l_discount").cast("decimal(7,6)")).as("revenue"),
           count(lit(1)).as("n_items"))

  /** TPC-H Q8-style market share: of all order volume for one part
    * type flowing to customers in one region, the fraction supplied
    * from `shareNation`, by order year. Numerator and denominator are
    * decimal-exact doubles; the share is ONE double division of two
    * bit-stable doubles, so it is bit-stable too (IEEE division is
    * deterministic given identical operands). Dims all broadcast; the
    * only shuffles are the two fact-fact joins and the tiny year agg. */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
                  supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  part: DataFrame, regionName: String, partType: String,
                  shareNation: String, from: String, to: String): DataFrame = {
    val custNations = broadcast(
      nation.join(broadcast(region.where(col("r_name") === regionName)),
                  col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_nationkey")))
    val suppNation = broadcast(
      supplier.join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
                    col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    lineitem
      .join(broadcast(part.where(col("p_type") === partType)),
            col("l_partkey") === col("p_partkey"))
      .join(orders.where(col("o_orderdate") >= from && col("o_orderdate") < to),
            col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(custNations, col("c_nationkey") === col("cn_nationkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(dsum(when(col("supp_nation") === shareNation, discPriceDec)
                  .otherwise(lit(0))).as("share_volume"),
           dsum(discPriceDec).as("total_volume"))
      .select(col("o_year"), col("share_volume"), col("total_volume"),
              (col("share_volume") / col("total_volume")).as("mkt_share"))
  }

  /** TPC-H Q9-style product profit by supplier nation and year. The
    * schema has no partsupp, so unit cost is proxied as
    * `costRate`·p_retailprice — the join/agg shape (fact ⋈ part filter
    * ⋈ orders ⋈ supplier ⋈ nation, two-key groupBy) is the point.
    * Profit stays decimal on the factors: retailprice and quantity are
    * 2-decimal sources, costRate is a 2-decimal literal, so the
    * per-row profit is exact and the sum order-free. */
  def profitByNation(nation: DataFrame, supplier: DataFrame,
                     orders: DataFrame, lineitem: DataFrame, part: DataFrame,
                     typeFilter: String, costRate: java.math.BigDecimal): DataFrame =
    lineitem
      .join(broadcast(part.where(col("p_type") === typeFilter)),
            col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum(discPriceDec -
                col("p_retailprice").cast("decimal(13,6)") *
                  col("l_quantity").cast("decimal(13,6)") *
                  lit(costRate).cast("decimal(7,6)")).as("profit"))

  /** TPC-H Q10-style returned-item losses: top `k` customers by revenue
    * on returned lines in a quarter. The top-k cut orders by
    * (revenue DESC, custkey) — revenue doubles are bit-stable, so the
    * selected set is deterministic cross-engine even through ties. */
  def returnedItemLosses(nation: DataFrame, customer: DataFrame,
                         orders: DataFrame, lineitem: DataFrame,
                         from: String, to: String, k: Int): DataFrame =
    lineitem.where(col("l_returnflag") === "R")
      .join(orders.where(col("o_orderdate") >= from && col("o_orderdate") < to),
            col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(discPriceDec).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /** TPC-H Q15-style top supplier: the supplier(s) whose quarterly
    * revenue equals the global maximum. The per-supplier agg happens
    * ONCE; the global max is a single-row agg of that result joined
    * back by value (broadcast — it is one row). Equality on doubles is
    * safe here because both sides come from the same decimal-exact
    * pipeline, and it keeps ties (all argmax suppliers), which is Q15's
    * actual semantics. */
  def topRevenueSupplier(supplier: DataFrame, lineitem: DataFrame,
                         from: String, to: String): DataFrame = {
    val rev = lineitem
      .where(col("l_shipdate") >= from && col("l_shipdate") < to)
      .groupBy(col("l_suppkey"))
      .agg(dsum(discPriceDec).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.join(broadcast(mx), col("total_revenue") === col("max_revenue"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** TPC-H Q16-style supplier variety: distinct suppliers able to ship
    * each (brand, type, size) combination, excluding one brand and
    * excluding suppliers on a deny list (negative account balance — the
    * schema's stand-in for Q16's complaint suppliers). The deny list is
    * a broadcast left-anti (NOT IN with non-null keys ≡ anti join);
    * countDistinct runs the standard two-phase expand. */
  def supplierVariety(supplier: DataFrame, lineitem: DataFrame,
                      part: DataFrame, excludeBrand: String): DataFrame =
    lineitem
      .join(broadcast(supplier.where(col("s_acctbal") < 0)
              .select(col("s_suppkey").as("bad_suppkey"))),
            col("l_suppkey") === col("bad_suppkey"), "left_anti")
      .join(broadcast(part.where(col("p_brand") =!= excludeBrand)),
            col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  /** TPC-H Q12-style dual conditional census: per line class (the
    * schema's l_returnflag stands in for l_shipmode), how many LATE
    * lines (shipped > `lateDays` after order placement — the Q4
    * lateness adaptation) belong to high- vs low-priority orders.
    * The Q12 shape is the CASE-sum pair over one fact-fact join:
    * both counters ride a single orderkey shuffle and partial-agg;
    * no second pass, no pivot. */
  def lateLinesByPriorityClass(orders: DataFrame, lineitem: DataFrame,
                               from: String, to: String,
                               lateDays: Int): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .where(col("l_shipdate") >= from && col("l_shipdate") < to)
      .join(orders, col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") +
                expr(s"INTERVAL $lateDays DAYS"))
      .groupBy(col("l_returnflag").as("line_class"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q17-style small-quantity revenue: average yearly revenue
    * lost if orders below 20% of a part's average order quantity were
    * no longer taken, over one brand's parts. The Q17 correlated
    * scalar subquery (`l_quantity < 0.2 * (SELECT avg ... same part)`)
    * decorrelates into a per-part aggregate joined back to the same
    * filtered fact subset — the filtered per-part thresholds are
    * dim-bounded, so the rejoin broadcasts and the fact scans twice
    * but never shuffles on partkey a second time. Threshold math is
    * bit-stable: qty sums go through decimal, the 0.2 factor and the
    * division are single IEEE ops on identical doubles. */
  def smallQuantityRevenue(part: DataFrame, lineitem: DataFrame,
                           brand: String): DataFrame = {
    val pf = broadcast(part.where(col("p_brand") === brand)
      .select(col("p_partkey")))
    val branded = lineitem.join(pf, col("l_partkey") === col("p_partkey"))
    val thresh = branded.groupBy(col("l_partkey").as("t_partkey"))
      .agg(((dsum(col("l_quantity")) / count(lit(1))) * lit(0.2))
             .as("qty_thresh"))
    branded
      .join(broadcast(thresh), col("l_partkey") === col("t_partkey"))
      .where(col("l_quantity") < col("qty_thresh"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q20-style dominant-supplier detection: suppliers in one
    * nation who shipped more than `shareNum/shareDen` of a part
    * family's total volume in a window (the schema has no partsupp
    * availqty, so Q20's "excess stock" half-sum test becomes a
    * volume-share test — the nested-IN chain is the same: part name
    * prefix → per-(supplier, part) aggregate vs a per-part scalar →
    * semi join up to the supplier dim). The share test multiplies
    * through (qty·den > total·num) so the decimal sums compare
    * exactly; both aggregates ride ONE partkey-shuffled pass each
    * over the prefix-filtered fact subset, and the supplier dim is
    * only reached by a broadcast semi join of the tiny winner set. */
  def dominantSuppliers(nation: DataFrame, supplier: DataFrame,
                        part: DataFrame, lineitem: DataFrame,
                        namePrefix: String, nationName: String,
                        from: String, to: String,
                        shareNum: Int, shareDen: Int): DataFrame = {
    val pf = broadcast(part.where(col("p_name").startsWith(namePrefix))
      .select(col("p_partkey")))
    val shipped = lineitem
      .where(col("l_shipdate") >= from && col("l_shipdate") < to)
      .join(pf, col("l_partkey") === col("p_partkey"))
    val perSupp = shipped.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(25,6)")).as("supp_qty"))
    val perPart = shipped.groupBy(col("l_partkey").as("q_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(25,6)")).as("part_qty"))
    val winners = perSupp
      .join(perPart, col("l_partkey") === col("q_partkey"))
      .where(col("supp_qty") * shareDen > col("part_qty") * shareNum)
      .select(col("l_suppkey")).distinct()
    supplier
      .join(broadcast(nation.where(col("n_name") === nationName)),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"),
            "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }
}
