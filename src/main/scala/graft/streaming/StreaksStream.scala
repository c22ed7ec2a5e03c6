package graft.streaming

import java.time.Instant
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Sessionize.dailyStreaks]]:
  * per-user consecutive-active-day streak summaries maintained
  * continuously with BOUNDED state. Day islands still inside the
  * watermark horizon stay explicit in state (they can merge or
  * extend); an island closes — folds into three compressed counters
  * (total days, streak count, best-(len, start) champion) — only when
  * the watermark passes end + 1 day, after which no event can extend
  * it forward (future days ≥ watermark day > end+1) nor bridge it
  * backward (a bridging day ≤ start−1 < watermark day is impossible
  * too). So state per user is O(horizon) islands + O(1) counters, and
  * every emitted summary already counts BOTH closed and open islands
  * — the last summary per user equals the batch operator over the
  * same input, with no sentinel flush needed (StreaksStreamSpec
  * asserts set equality).
  *
  * Emission is one summary row per (user, micro-batch-with-changes),
  * sequence-numbered so consumers (and the parity spec) can pick the
  * newest without relying on sink ordering. */
object StreaksStream extends Serializable {

  case class Ev(user_id: Long, ts: Instant)
  case class Island(start: Long, end: Long)
  case class St(seq: Long, closedDays: Long, closedCount: Long,
                bestLen: Long, bestStart: Long, bestEnd: Long,
                open: List[Island])
  // LocalDate, not java.sql.Date: epoch-day construction is
  // timezone-free, so stream and batch agree regardless of JVM TZ
  case class Summary(user_id: Long, seq: Long, n_active_days: Long,
                     n_streaks: Long, longest_streak: Long,
                     streak_start: java.time.LocalDate,
                     streak_end: java.time.LocalDate)

  /** (len DESC, start ASC) champion fold — the batch tie rule. */
  private def better(aLen: Long, aStart: Long, aEnd: Long,
                     bLen: Long, bStart: Long, bEnd: Long): (Long, Long, Long) =
    if (bLen > aLen || (bLen == aLen && bStart < aStart)) (bLen, bStart, bEnd)
    else (aLen, aStart, aEnd)

  def summaries(spark: SparkSession, events: DataFrame,
                watermarkDelay: String = "30 minutes"): Dataset[Summary] = {
    import spark.implicits._
    // Day bucketing must match the batch twin's to_date(ts), which
    // applies the SESSION timezone — a raw floorDiv of epoch micros is
    // the UTC day and silently breaks batch/stream parity (the
    // documented contract, asserted by StreaksStreamSpec) for any
    // non-UTC session. Local dates are monotone in the instant for a
    // fixed zone (even across DST), so the island-closing argument
    // below is unchanged. Captured HERE, not inside fn: executors
    // don't see the driver's session conf.
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)

    def fn(userId: Long, it: Iterator[Ev],
           state: GroupState[St]): Iterator[Summary] = {
      val st = state.getOption.getOrElse(St(0L, 0L, 0L, 0L, 0L, 0L, Nil))
      val days = it.map(e => e.ts.atZone(zone).toLocalDate.toEpochDay).toSet
      if (days.isEmpty && !state.hasTimedOut) return Iterator.empty
      // merge incoming days + open islands: sort by start, collapse
      // neighbors within one day (duplicates fold into the same run)
      val all = (st.open ++ days.map(d => Island(d, d)))
        .sortBy(i => (i.start, i.end))
      val merged = all.foldLeft(List.empty[Island]) { (acc, i) =>
        acc match {
          case h :: t if i.start <= h.end + 1 =>
            Island(h.start, math.max(h.end, i.end)) :: t
          case _ => i :: acc
        }
      }.reverse
      val watermarkDay = java.time.Instant
        .ofEpochMilli(state.getCurrentWatermarkMs())
        .atZone(zone).toLocalDate.toEpochDay
      val (done, open) = merged.partition(_.end + 1 < watermarkDay)
      var (cd, cc) = (st.closedDays, st.closedCount)
      var (bl, bs, be) = (st.bestLen, st.bestStart, st.bestEnd)
      done.foreach { i =>
        val len = i.end - i.start + 1
        cd += len; cc += 1
        val b = better(bl, bs, be, len, i.start, i.end)
        bl = b._1; bs = b._2; be = b._3
      }
      val next = St(st.seq + 1, cd, cc, bl, bs, be, open)
      state.update(next)
      if (open.nonEmpty)
        state.setTimeoutTimestamp(java.time.LocalDate
          .ofEpochDay(open.map(_.end).min + 2)
          .atStartOfDay(zone).toInstant.toEpochMilli + 1)
      // summary over closed counters + open islands together
      var (tl, ts2, te) = (bl, bs, be)
      open.foreach { i =>
        val len = i.end - i.start + 1
        val b = better(tl, ts2, te, len, i.start, i.end)
        tl = b._1; ts2 = b._2; te = b._3
      }
      val nDays = cd + open.map(i => i.end - i.start + 1).sum
      val nStreaks = cc + open.size
      if (nStreaks == 0) Iterator.empty
      else Iterator.single(Summary(userId, next.seq, nDays, nStreaks, tl,
        java.time.LocalDate.ofEpochDay(ts2), java.time.LocalDate.ofEpochDay(te)))
    }

    events.select("user_id", "ts")
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
