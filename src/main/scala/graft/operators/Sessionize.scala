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

  /** Gaps-and-islands: per-user consecutive-active-day streaks — the
    * engagement metric sessionization cannot express (sessions split on
    * intra-day gaps; streaks ask about DAY-grain continuity across
    * weeks). Classic island labeling: distinct active days, one
    * row_number window, `day − rn` is constant exactly within a
    * consecutive run, so it names the island without a join or a
    * recursive walk.
    *
    * Scale shape: TWO exchanges total, and that's the right two. The
    * day-grain distinct partial-aggregates map-side FIRST — at event
    * scale this is the reduction that matters (billions of raw events
    * collapse to ≤ users×days rows before anything moves) — then the
    * user window re-keys the already-tiny distinct stream. The island
    * groupBy keys (user, anchor) and the final per-user argmax key
    * (user) are both satisfied by the window's partitioning, so
    * EnsureRequirements inserts nothing further at any size.
    * (Repartitioning by user BEFORE the dedup would hit one exchange,
    * but it would shuffle every raw event — strictly worse.)
    * All arithmetic is integer/date;
    * the longest-streak pick is min_by over (−len, start) structs —
    * (length DESC, start ASC), deterministic through ties. */
  def dailyStreaks(events: DataFrame, userCol: String,
                   tsCol: String): DataFrame = {
    val active = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = active
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"),
           min(col("day")).as("start"), max(col("day")).as("end"))
    islands.groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
           count(lit(1)).as("n_streaks"),
           min_by(struct(col("len"), col("start"), col("end")),
                  struct((-col("len")).as("nl"), col("start"))).as("b"))
      .select(col("user_id"), col("n_active_days"), col("n_streaks"),
              col("b.len").as("longest_streak"),
              col("b.start").as("streak_start"),
              col("b.end").as("streak_end"))
  }
}
