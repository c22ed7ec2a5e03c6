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

  // ------------------------------------------------------------ registry

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_material_demand" -> (pipelineMaterialDemand _),
    "scan_project"             -> (scanProject _),
    "scan_incremental"         -> (scanIncremental _),
    "derive_recipe"            -> (deriveRecipe _),
    "agg_groupby_sum"          -> (aggGroupbySum _),
    "unpivot_melt"             -> (unpivotMelt _)
  )

  def oracles: Map[String, String] = Map(
    "pipeline_material_demand" -> pipelineMaterialDemandSql,
    "scan_project"             -> scanProjectSql,
    "scan_incremental"         -> scanIncrementalSql,
    "derive_recipe"            -> deriveRecipeSql,
    "agg_groupby_sum"          -> aggGroupbySumSql,
    "unpivot_melt"             -> unpivotMeltSql
  )
}
