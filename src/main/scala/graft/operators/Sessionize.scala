package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over append-only event streams (batch form;
  * the streaming twin lives in graft.streaming).
  *
  * Gap sessionization is the classic lag+cumsum: one shuffle on
  * user_id, two windows over the same partitioning (Spark reuses the
  * sort), then a partial-aggregated groupBy that reuses the same
  * partitioning again — no extra exchange at any size.
  */
object Sessionize {

  /** Hourly (or any truncation) event rollup. */
  def timeBucketed(events: DataFrame, unit: String): DataFrame =
    events
      .groupBy(date_trunc(unit, col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           Relational.dsum(col("value")).as("value_sum"))

  /** 30-min-gap (parameterized) sessions per user: session bounds plus
    * event count. Ordering is (ts, event_id) — total, since event_id is
    * unique — so session numbering is deterministic. */
  def gapSessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(byUser)
    events
      .withColumn("is_new",
        when(prev.isNull ||
             col("ts") > prev + expr(s"INTERVAL $gapMinutes MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_no",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
  }
}
