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
}
