package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Registry of every operator's runnable query + its DuckDB oracle.
  *
  * Conventions (hash-stability against the driver's DuckDB compare):
  *  - identical column names on both sides;
  *  - additive float aggs go through DECIMAL (order-independent sums)
  *    and are cast to DOUBLE at the end (both engines produce the same
  *    IEEE double from the same exact decimal);
  *  - timestamps → DATE where the op is date-grained.
  */
object Queries {

  /** The reference's `table_product_demand` mapped onto lineitem
    * (SURVEY.md §3): shop←l_suppkey, date←l_shipdate, product←
    * l_returnflag (A→cheap, N→medium, R→expensive), demand←l_quantity.
    */
  def productDemand(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      to_date(col("l_shipdate")).as("date"),
      col("l_suppkey").as("shop_id"),
      when(col("l_returnflag") === "A", "cheap")
        .when(col("l_returnflag") === "N", "medium")
        .otherwise("expensive").as("product_name"),
      col("l_quantity").as("demand"))

  /** Same mapping as SQL, shared by every oracle below. */
  private val productDemandSql =
    """SELECT CAST(l_shipdate AS DATE) AS date, l_suppkey AS shop_id,
      |  CASE l_returnflag WHEN 'A' THEN 'cheap' WHEN 'N' THEN 'medium'
      |       ELSE 'expensive' END AS product_name,
      |  l_quantity AS demand
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- #7
  def pipelineMaterialDemand(spark: SparkSession, dir: String): DataFrame = {
    val mat = MaterialDemand.productToMaterial(productDemand(spark, dir))
    mat.withColumn("demand_kg", col("demand_kg").cast("double"))
  }

  private val pipelineMaterialDemandSql =
    s"""WITH product_demand AS ($productDemandSql),
       |mat AS (
       |  SELECT date, shop_id,
       |    CAST(CASE product_name WHEN 'cheap' THEN 20*demand
       |         WHEN 'medium' THEN 10*demand ELSE 0 END AS DECIMAL(20,4)) AS local_arabica,
       |    CAST(CASE product_name WHEN 'cheap' THEN 0
       |         ELSE 10*demand END AS DECIMAL(20,4)) AS foreign_arabica,
       |    CAST(CASE product_name WHEN 'expensive' THEN 10*demand
       |         ELSE 0 END AS DECIMAL(20,4)) AS robusta
       |  FROM product_demand),
       |agg AS (
       |  SELECT date, shop_id, SUM(local_arabica) AS local_arabica,
       |         SUM(foreign_arabica) AS foreign_arabica, SUM(robusta) AS robusta
       |  FROM mat GROUP BY date, shop_id)
       |SELECT date, shop_id, raw_material, CAST(demand_g AS DOUBLE)/1000 AS demand_kg
       |FROM (
       |  SELECT date, shop_id, 'foreign_arabica' AS raw_material, foreign_arabica AS demand_g FROM agg
       |  UNION ALL SELECT date, shop_id, 'local_arabica', local_arabica FROM agg
       |  UNION ALL SELECT date, shop_id, 'robusta', robusta FROM agg) u
       |ORDER BY date, shop_id, raw_material""".stripMargin

  // ---------------------------------------------------------------- #1
  def scanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val scanProjectSql =
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"

  // ---------------------------------------------------------------- #2
  def scanIncremental(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-02-01")
      .select(col("l_orderkey"), col("l_linenumber"),
              to_date(col("l_shipdate")).as("ship_date"), col("l_quantity"))

  private val scanIncrementalSql =
    """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date, l_quantity
      |FROM lineitem
      |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-02-01'""".stripMargin

  // ---------------------------------------------------------------- #3
  def deriveRecipe(spark: SparkSession, dir: String): DataFrame =
    productDemand(spark, dir).select(
      col("date"), col("shop_id"), col("product_name"),
      when(col("product_name") === "cheap", col("demand") * 20)
        .when(col("product_name") === "medium", col("demand") * 10)
        .otherwise(lit(0.0)).as("local_arabica"),
      when(col("product_name") === "cheap", lit(0.0))
        .otherwise(col("demand") * 10).as("foreign_arabica"),
      when(col("product_name") === "expensive", col("demand") * 10)
        .otherwise(lit(0.0)).as("robusta"))

  private val deriveRecipeSql =
    s"""WITH product_demand AS ($productDemandSql)
       |SELECT date, shop_id, product_name,
       |  CASE product_name WHEN 'cheap' THEN 20*demand
       |       WHEN 'medium' THEN 10*demand ELSE 0 END AS local_arabica,
       |  CASE product_name WHEN 'cheap' THEN 0 ELSE 10*demand END AS foreign_arabica,
       |  CASE product_name WHEN 'expensive' THEN 10*demand ELSE 0 END AS robusta
       |FROM product_demand""".stripMargin

  // ---------------------------------------------------------------- #4
  def aggGroupbySum(spark: SparkSession, dir: String): DataFrame =
    productDemand(spark, dir)
      .groupBy(col("date"), col("shop_id"))
      .agg(sum(col("demand").cast("decimal(20,4)")).cast("double").as("demand_sum"),
           count(lit(1)).as("n_rows"))

  private val aggGroupbySumSql =
    s"""WITH product_demand AS ($productDemandSql)
       |SELECT date, shop_id,
       |  CAST(SUM(CAST(demand AS DECIMAL(20,4))) AS DOUBLE) AS demand_sum,
       |  COUNT(*) AS n_rows
       |FROM product_demand GROUP BY date, shop_id""".stripMargin

  // ---------------------------------------------------------------- #5
  def unpivotMelt(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_acctbal"),
              col("s_nationkey").cast("double").as("nation_key_d"))
      .unpivot(Array(col("s_suppkey")),
               Array(col("s_acctbal"), col("nation_key_d")),
               "measure", "value")

  private val unpivotMeltSql =
    """SELECT s_suppkey, 's_acctbal' AS measure, s_acctbal AS value FROM supplier
      |UNION ALL
      |SELECT s_suppkey, 'nation_key_d', CAST(s_nationkey AS DOUBLE) FROM supplier""".stripMargin

  // ------------------------------------------------------- CDC (#9-11)

  /** CDC change feed mapped onto lineitem: key←l_orderkey, op←
    * l_returnflag (N→I, A→U, R→D), last_updated←l_shipdate, tiebreak←
    * l_linenumber, payload←l_extendedprice. */
  def changes(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("order_key"),
      col("l_linenumber").as("line_no"),
      col("l_shipdate").as("last_updated"),
      when(col("l_returnflag") === "N", "I")
        .when(col("l_returnflag") === "A", "U")
        .otherwise("D").as("op"),
      col("l_extendedprice").as("new_price"))

  private val changesSql =
    """SELECT l_orderkey AS order_key, l_linenumber AS line_no,
      |  l_shipdate AS last_updated,
      |  CASE l_returnflag WHEN 'N' THEN 'I' WHEN 'A' THEN 'U' ELSE 'D' END AS op,
      |  l_extendedprice AS new_price
      |FROM lineitem""".stripMargin

  private val latestSql =
    s"""changes AS ($changesSql),
       |latest AS (
       |  SELECT order_key, line_no, last_updated, op, new_price FROM (
       |    SELECT *, row_number() OVER (PARTITION BY order_key
       |      ORDER BY last_updated DESC, line_no DESC, new_price DESC, op DESC) AS rn
       |    FROM changes) WHERE rn = 1)""".stripMargin

  private def cdcTarget(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("order_key"),
      col("o_totalprice").as("total_price"),
      col("o_orderstatus").as("status"))

  private val cdcTargetSql =
    """target AS (SELECT o_orderkey AS order_key, o_totalprice AS total_price,
      |  o_orderstatus AS status FROM orders)""".stripMargin

  def cdcLatestPerKey(spark: SparkSession, dir: String): DataFrame =
    Cdc.latestPerKey(changes(spark, dir), "order_key",
      Seq("last_updated", "line_no", "new_price", "op"))

  private val cdcLatestPerKeySql =
    s"WITH $latestSql SELECT * FROM latest"

  def cdcMergeApply(spark: SparkSession, dir: String): DataFrame = {
    val latest = cdcLatestPerKey(spark, dir).select(
      col("order_key"), col("op"),
      col("new_price").as("total_price"), lit("NEW").as("status"))
    Cdc.mergeApply(cdcTarget(spark, dir), latest, "order_key")
  }

  private val cdcMergeApplySql =
    s"""WITH $latestSql,
       |cdc AS (SELECT order_key, op, new_price AS total_price, 'NEW' AS status FROM latest),
       |$cdcTargetSql
       |SELECT coalesce(t.order_key, c.order_key) AS order_key,
       |  CASE WHEN t.order_key IS NOT NULL AND c.order_key IS NOT NULL AND c.op = 'U'
       |         THEN c.total_price
       |       WHEN t.order_key IS NULL THEN c.total_price
       |       ELSE t.total_price END AS total_price,
       |  CASE WHEN t.order_key IS NOT NULL AND c.order_key IS NOT NULL AND c.op = 'U'
       |         THEN c.status
       |       WHEN t.order_key IS NULL THEN c.status
       |       ELSE t.status END AS status
       |FROM target t FULL JOIN cdc c ON t.order_key = c.order_key
       |WHERE c.order_key IS NULL
       |   OR (t.order_key IS NOT NULL AND c.op IN ('U','I'))
       |   OR (t.order_key IS NULL AND c.op = 'I')""".stripMargin

  def upsertOnConflict(spark: SparkSession, dir: String): DataFrame = {
    val updates = cdcLatestPerKey(spark, dir).where(col("op") === "U").select(
      col("order_key"), col("new_price").as("total_price"),
      lit("UPD").as("status"))
    Cdc.upsert(cdcTarget(spark, dir), updates, "order_key")
  }

  private val upsertOnConflictSql =
    s"""WITH $latestSql,
       |updates AS (SELECT order_key, new_price AS total_price, 'UPD' AS status
       |  FROM latest WHERE op = 'U'),
       |$cdcTargetSql
       |SELECT coalesce(u.order_key, t.order_key) AS order_key,
       |  CASE WHEN u.order_key IS NOT NULL THEN u.total_price ELSE t.total_price END AS total_price,
       |  CASE WHEN u.order_key IS NOT NULL THEN u.status ELSE t.status END AS status
       |FROM target t FULL JOIN updates u ON t.order_key = u.order_key""".stripMargin

  // ---------------------------------------------------------------- #8
  /** Year/month lake-layout summary (the write itself is spec-tested in
    * SourcesSpec — queries must stay read-only for Verify). */
  def partitionLayout(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("year"),
               month(col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast("decimal(20,4)"))
             .cast("double").as("total_price"))

  private val partitionLayoutSql =
    """SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total_price
      |FROM orders GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------ registry

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_material_demand" -> (pipelineMaterialDemand _),
    "scan_project"             -> (scanProject _),
    "scan_incremental"         -> (scanIncremental _),
    "derive_recipe"            -> (deriveRecipe _),
    "agg_groupby_sum"          -> (aggGroupbySum _),
    "unpivot_melt"             -> (unpivotMelt _),
    "cdc_latest_per_key"       -> (cdcLatestPerKey _),
    "cdc_merge_apply"          -> (cdcMergeApply _),
    "upsert_on_conflict"       -> (upsertOnConflict _),
    "partition_layout"         -> (partitionLayout _)
  )

  def oracles: Map[String, String] = Map(
    "pipeline_material_demand" -> pipelineMaterialDemandSql,
    "scan_project"             -> scanProjectSql,
    "scan_incremental"         -> scanIncrementalSql,
    "derive_recipe"            -> deriveRecipeSql,
    "agg_groupby_sum"          -> aggGroupbySumSql,
    "unpivot_melt"             -> unpivotMeltSql,
    "cdc_latest_per_key"       -> cdcLatestPerKeySql,
    "cdc_merge_apply"          -> cdcMergeApplySql,
    "upsert_on_conflict"       -> upsertOnConflictSql,
    "partition_layout"         -> partitionLayoutSql
  )
}
