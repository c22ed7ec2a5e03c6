package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's flagship transform: product demand → raw-material
  * demand.
  *
  * Reference behavior (what, not how):
  *  - `/root/reference/README.md:223-231` — pandas apply-lambdas derive
  *    three material columns from `product_name`, groupby(date,shop_id)
  *    sum, `pd.melt` wide→long, g→kg.
  *  - `/root/reference/mnt/dags/unused_pipeline_sourcecode.py:37-99`
  *    (`table_demand_sql`) — same as SQL: CASE WHEN derivation, UNION
  *    ALL unpivot, GROUP BY, ORDER BY.
  *
  * Spark-first realization: the recipe is data (material → product →
  * grams-per-unit), derivation is a codegen'd `when` chain, the melt is
  * Spark 4's native `unpivot` (single scan — the reference SQL rescans
  * the CTE three times via UNION ALL), and the whole pipeline is ONE
  * logical plan with exactly one shuffle (the groupBy). At 100 TB the
  * groupBy keys (date, shop) are high-cardinality and well-distributed,
  * so partial aggregation collapses most rows map-side before the
  * shuffle.
  */
object MaterialDemand {

  /** material → (product → grams per unit demand). README.md:72-82. */
  val defaultRecipe: Map[String, Map[String, Int]] = Map(
    "local_arabica"   -> Map("cheap" -> 20, "medium" -> 10),
    "foreign_arabica" -> Map("medium" -> 10, "expensive" -> 10),
    "robusta"         -> Map("expensive" -> 10)
  )

  /** CASE chain for one material column: grams = demand * rate(product). */
  private def materialCol(product: Column, demand: Column,
                          rates: Map[String, Int]): Column =
    rates.foldLeft(lit(0.0)) { case (acc, (p, g)) =>
      when(product === p, demand * g).otherwise(acc)
    }

  /** product-demand rows (date, shop_id, product_name, demand) →
    * long-format material demand (date, shop_id, raw_material,
    * demand_kg), sorted like the reference's ORDER BY.
    *
    * `sorted = false` skips the output ORDER BY — for callers that
    * AGGREGATE the result further (e.g. the pivot inverse), where a
    * sort between two shuffles is pure wasted work at any scale (the
    * range exchange's ordering dies at the next hash exchange).
    */
  def productToMaterial(productDemand: DataFrame,
                        recipe: Map[String, Map[String, Int]] = defaultRecipe,
                        sorted: Boolean = true)
      : DataFrame = {
    val materials = recipe.keys.toSeq.sorted
    val derived = productDemand.select(
      Seq(col("date"), col("shop_id")) ++
        materials.map(m =>
          materialCol(col("product_name"), col("demand"), recipe(m)).as(m)): _*
    )
    // Sum as DECIMAL: order-independent (hash-stable vs any oracle) and
    // exact at 100 TB where double partial-sums would drift.
    val aggs = materials.map(m => sum(col(m).cast("decimal(20,4)")).as(m))
    val agged = derived
      .groupBy(col("date"), col("shop_id"))
      .agg(aggs.head, aggs.tail: _*)
    val long = agged
      .unpivot(Array(col("date"), col("shop_id")),
               materials.map(col).toArray, "raw_material", "demand_g")
      .withColumn("demand_kg",
        (col("demand_g") / 1000).cast("decimal(24,8)"))
      .drop("demand_g")
    if (sorted) long.orderBy(col("date"), col("shop_id"), col("raw_material"))
    else long
  }
}
