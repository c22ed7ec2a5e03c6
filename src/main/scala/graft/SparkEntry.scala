package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry in `queries` has an `oracleSql` twin (DuckDB-runnable,
  * same column NAMES) unless the op is not SQL-expressible, in which
  * case the driver records a rows-only check and the ScalaTest spec
  * carries the oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.pipelineMaterialDemand(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** DuckDB oracle SQL per query key (same parquet tables, same column
    * names — driver sorts columns by name before hashing values). */
  def oracleSql: Map[String, String] = Queries.oracles
}
