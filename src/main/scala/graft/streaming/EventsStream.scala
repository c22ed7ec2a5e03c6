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

  /** Sliding-window rates (#35d): overlapping windows of `length`
    * advancing every `slide` — the smoothed-rate view a tumbling
    * window can't give (a spike at a bucket boundary halves). Each
    * event lands in length/slide windows; Spark's TimeWindow expand
    * does that replication BEFORE the partial agg, so the shuffle
    * carries (window, type) partials, not events — the same
    * map-side-combine shape as the tumbling path, length/slide×
    * wider. Watermark = one window length: a window finalizes once
    * no in-horizon event can still join it. */
  def slidingCounts(events: DataFrame, length: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", length)
      .groupBy(window(col("ts"), length, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("value_sum"))
      .select(col("window.start").as("bucket_start"),
              col("window.end").as("bucket_end"), col("event_type"),
              col("n_events"), col("value_sum"))

  /** Gap sessionization with keyed state. State holds ALL open
    * sessions inside the watermark horizon (not just the latest one):
    * out-of-order events within the watermark merge correctly — an
    * event EARLIER than an open session's start can lower the start or
    * split off its own session, exactly like the batch twin. A session
    * emits (append semantics) only once the watermark passes its
    * end + gap, so no later in-watermark event can still extend it. */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[List[OpenSession]]): Iterator[Session] = {
      val incoming = it.toSeq.map(e => OpenSession(micros(e.ts), micros(e.ts), 1))
      val all = (state.getOption.getOrElse(Nil) ++ incoming)
        .sortBy(s => (s.start, s.end))
      // merge chain: neighbors within gap collapse
      val merged = all.foldLeft(List.empty[OpenSession]) { (acc, s) =>
        acc match {
          case head :: tail if s.start <= head.end + gapUs =>
            OpenSession(head.start, math.max(head.end, s.end), head.n + s.n) :: tail
          case _ => s :: acc
        }
      }.reverse
      val watermarkUs = state.getCurrentWatermarkMs() * 1000L
      val (done, open) = merged.partition(s => s.end + gapUs < watermarkUs)
      if (open.nonEmpty) {
        state.update(open)
        state.setTimeoutTimestamp((open.map(_.end).min + gapUs) / 1000L + 1)
      } else {
        state.remove()
      }
      done.iterator.map(s =>
        Session(userId, instant(s.start), instant(s.end), s.n))
    }

    // Lateness tolerance must cover the session gap: with a watermark
    // shorter than the gap, an out-of-order event still inside the gap
    // would be dropped and break parity with the batch twin.
    events.withWatermark("ts", s"${math.max(gapMinutes, 30)} minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  case class Change(event_id: Long, user_id: Long, ts: Instant,
                    event_type: String)
  /** last = type of the newest FLUSHED event ("" before any); buffer =
    * events still inside the watermark horizon, unflushed. */
  case class CompactState(last: String, buffer: List[BufEvent])
  case class BufEvent(id: Long, ts: Long, tpe: String)

  /** Streaming twin of `events_compact_changes`: emit an event only
    * when its type differs from the user's previous event, in EVENT
    * time order. Arrival order is not event order, so incoming events
    * buffer in keyed state until the watermark passes them — only then
    * can no earlier event still arrive — and flush through the
    * last-emitted-type comparison sorted by (ts, event_id), exactly
    * the batch ordering. State per user is the unflushed horizon
    * window plus one string, and self-expires via event-time timeout
    * one horizon after the user's last activity. A user idle past the
    * horizon restarts compaction (their next event always emits) —
    * the right call for monitoring feeds, where "first event after a
    * long silence" is signal, and the price of bounded state. */
  def compactChanges(spark: SparkSession, events: DataFrame,
                     delayMinutes: Int = 30): Dataset[Change] = {
    import spark.implicits._
    val horizonUs = delayMinutes * 60000000L

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[CompactState]): Iterator[Change] = {
      val incoming = it.toSeq
        .map(e => BufEvent(e.event_id, micros(e.ts), e.event_type))
      val st = state.getOption.getOrElse(CompactState("", Nil))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (ready, pending) = (st.buffer ++ incoming)
        .sortBy(b => (b.ts, b.id))
        .partition(_.ts < wmUs)
      var last = st.last
      val out = ready.flatMap { b =>
        val emit = last.isEmpty || b.tpe != last
        last = b.tpe
        if (emit) Some(Change(b.id, userId, instant(b.ts), b.tpe)) else None
      }
      if (pending.isEmpty && state.hasTimedOut) {
        state.remove() // idle past the horizon: forget the user
      } else {
        state.update(CompactState(last, pending))
        // a pending event is flushable the moment the watermark passes
        // its ts — anchor the timeout at the EARLIEST pending event
        // (sessionize precedent: min open end), not the latest, or the
        // stream-tail key's buffer outlives every watermark advance;
        // with nothing pending, expire the idle user one horizon out
        val fireAtMs = pending.headOption match {
          case Some(b) => b.ts / 1000L + 1
          case None    => (math.max(wmUs, 0L) + horizonUs) / 1000L + 1
        }
        state.setTimeoutTimestamp(math.max(fireAtMs, wmUs / 1000L + 1))
      }
      out.iterator
    }

    events.withWatermark("ts", s"$delayMinutes minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks within the preceding `windowMinutes`. Watermarks on
    * BOTH sides plus the time-range predicate let the engine expire
    * buffered rows — without them a stream-stream join buffers forever.
    * State is sharded by user_id across executors like any keyed state. */
  def purchaseClickJoin(events: DataFrame, windowMinutes: Int): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
              col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    purchases.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") -
            expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
              col("click_id"), col("click_ts"))
  }

  /** Streaming exact dedup on event_id: duplicates arriving within the
    * watermark horizon are dropped, state self-expires with the
    * watermark (bounded memory — a plain dropDuplicates would grow
    * state forever on an unbounded stream). */
  def dedupStream(events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming CDC apply: the reference's daily staging-MERGE run
    * continuously. Each micro-batch of I/U/D changes is deduped to the
    * latest change per key and merged into the target via foreachBatch
    * — batch semantics per trigger, exactly the `Cdc.mergeApply` the
    * daily job uses, so daily and streaming deployments can't drift.
    *
    * The target is a [[graft.sources.Manifest]] table: each batch
    * commits a new version dir published by an atomic marker-file
    * create. The previous rename-swap was crash-safe only on
    * HDFS/local — `fs.rename` is not atomic on S3-family stores, and
    * the swap had a reader-visible gap between the two renames. With
    * the manifest there is no gap (readers resolve the last committed
    * version at every instant) and no recovery step: a crash between
    * data write and marker leaves an orphan that the replayed batch
    * overwrites. A fresh table bootstraps from the first batch's
    * non-delete changes.
    *
    * Returns the started query; caller owns termination. */
  def cdcApplyStream(changes: DataFrame, tableRoot: String, key: String,
                     orderCol: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        // ordering includes op and every payload column (the
        // latestPerKey contract) so an orderCol tie can't make the
        // winner — and thus the merge outcome — nondeterministic
        val payloadOrder = orderCol +:
          batch.columns.filterNot(Set(key, orderCol)).toSeq
        val latest = graft.operators.Cdc
          .latestPerKey(batch.toDF(), key, payloadOrder)
        val merged = graft.sources.Manifest.read(spark, tableRoot) match {
          case Some(target) =>
            graft.operators.Cdc.mergeApply(target, latest.drop(orderCol), key)
          case None => // bootstrap: the first batch founds the table
            latest.where(col("op") =!= "D").drop("op", orderCol)
        }
        graft.sources.Manifest.commit(spark, tableRoot, merged)
        ()
      }
      .outputMode("update")
      .start()
  }

  /** File-source stream over a parquet directory (the lake as a feed). */
  def fromParquetDir(spark: SparkSession, dir: String,
                     schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(dir)

  case class EwmaPoint(user_id: Long, ts: Instant, value: Double,
                       ewma: Double)
  /** Pending events not yet behind the watermark (ts µs, id, value)
    * and the latest-first history of finalized values (≤ terms). */
  case class EwmaState(pending: List[(Long, Long, Double)],
                       hist: List[Double])

  /** Streaming twin of [[graft.operators.Temporal.ewma]] (dyadic
    * α = alphaNum/2^alphaLog2Den, last `terms` observations): per-key
    * smoothed values as events finalize. The BATCH operator's
    * exactness argument carries over verbatim — exact dyadic weights
    * ([[graft.operators.Temporal.dyadicWeights]]), one fixed
    * left-associated sum — so a stream point and the batch row for
    * the same (key, ts) are bit-identical doubles (EwmaStreamSpec
    * asserts exact equality, at α = 1/2 and a tuned α = 3/8).
    *
    * Out-of-order arrivals inside the watermark are handled the same
    * way sessionize handles them: incoming events BUFFER in state and
    * only finalize — in (ts, event_id) order — once the watermark
    * passes them, so the smoothing history is applied in event-time
    * order no matter the arrival order. An event-time timeout flushes
    * buffered events when the watermark advances without new data for
    * the key. State is O(terms + in-flight window) per key: the
    * finalized history keeps only the last `terms` values, and the
    * pending buffer is bounded by the watermark horizon. Like the
    * batch operator, nothing is emitted until a key has `terms`
    * finalized observations. */
  def ewmaStream(spark: SparkSession, events: DataFrame, terms: Int = 10,
                 watermarkDelay: String = "30 minutes",
                 alphaNum: Int = 1, alphaLog2Den: Int = 1): Dataset[EwmaPoint] = {
    import spark.implicits._
    require(terms >= 1 && terms <= 50, s"terms out of [1,50]: $terms")
    val (weights, norm) =
      graft.operators.Temporal.dyadicWeights(alphaNum, alphaLog2Den, terms)

    def smoothed(hist: List[Double]): Double =
      hist.zipWithIndex
        .map { case (v, i) => v * weights(i) }
        .reduceLeft(_ + _) / norm

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[EwmaState]): Iterator[EwmaPoint] = {
      val st = state.getOption.getOrElse(EwmaState(Nil, Nil))
      val pending = st.pending ++
        it.map(e => (micros(e.ts), e.event_id, e.value))
      val watermarkUs = state.getCurrentWatermarkMs() * 1000L
      val (ready, rest) = pending.partition(_._1 < watermarkUs)
      var hist = st.hist
      val out = ready.sortBy(p => (p._1, p._2)).flatMap { p =>
        hist = (p._3 :: hist).take(terms)
        if (hist.size == terms)
          Some(EwmaPoint(userId, instant(p._1), p._3, smoothed(hist)))
        else None
      }
      state.update(EwmaState(rest, hist))
      if (rest.nonEmpty)
        state.setTimeoutTimestamp(rest.map(_._1).min / 1000L + 1)
      out.iterator
    }

    events.withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
