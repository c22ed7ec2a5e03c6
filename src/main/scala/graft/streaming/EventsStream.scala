package graft.streaming

import java.time.Instant
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators
  * (graft.operators.Sessionize) — the engine's ingest path when the
  * reference's daily Airflow batches become a continuous feed.
  *
  * Design: file/Kafka source → event-time watermark → windowed agg or
  * keyed state. State is per-user and O(1) per key (just the open
  * session), so a 1000-executor cluster shards it by user_id with no
  * driver involvement.
  */
object EventsStream extends Serializable {

  /** Instant (µs-precise) rather than java.sql.Timestamp — getTime is
    * ms-truncated and silently shifts session bounds off the batch
    * operator's results. */
  case class Event(event_id: Long, ts: Instant, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, session_start: Instant,
                     session_end: Instant, n_events: Long)
  /** start/end in epoch micros. */
  case class OpenSession(start: Long, end: Long, n: Long)

  private def micros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def instant(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
                          Math.floorMod(us, 1000000L) * 1000L)

  /** Hourly tumbling-window counts with a 1-hour watermark: late events
    * beyond the watermark are dropped, closed windows finalize. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("value_sum"))
      .select(col("window.start").as("bucket"), col("event_type"),
              col("n_events"), col("value_sum"))

  /** Gap sessionization with keyed state: a session closes when a
    * later event for the same user arrives more than `gapMinutes`
    * after it, or when the event-time timeout fires. Emits only CLOSED
    * sessions (append semantics). */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(Session(userId, instant(s.start), instant(s.end), s.n))
      }
      val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = micros(e.ts)
        open match {
          case Some(s) if t > s.end + gapUs =>
            closed += Session(userId, instant(s.start), instant(s.end), s.n)
            open = Some(OpenSession(t, t, 1))
          case Some(s) =>
            open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
          case None =>
            open = Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp((s.end + gapUs) / 1000L) // timeout is ms-grain
      }
      closed.result().iterator
    }

    events.withWatermark("ts", "30 minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Streaming exact dedup on event_id: duplicates arriving within the
    * watermark horizon are dropped, state self-expires with the
    * watermark (bounded memory — a plain dropDuplicates would grow
    * state forever on an unbounded stream). */
  def dedupStream(events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** File-source stream over a parquet directory (the lake as a feed). */
  def fromParquetDir(spark: SparkSession, dir: String,
                     schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(dir)
}
