package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weighted k-sample per group — the continuous twin of
  * `Sampling.prioritySample`: the keyed state holds the running
  * top-(k+1) priorities, so after ANY prefix of the stream the kept
  * set and the Horvitz-Thompson ŵ equal the batch operator over the
  * rows seen so far — deterministically, because the priority
  * q = w·65537/(b+1) is a pure function of (id, w) (no RNG, no
  * arrival-order sensitivity; a row arriving twice replaces itself
  * idempotently). This is the op a curation pipeline runs at ingest
  * to maintain a fresh weighted sample per source without nightly
  * recomputes.
  *
  * State per group is EXACTLY k+1 entries (the +1 carries the
  * threshold priority τ that makes ŵ = max(w, τ) unbiased) — bounded
  * regardless of stream length, no watermark needed (the sample is
  * over ALL history by design; recency-windowed variants compose by
  * keying on (group, window) upstream).
  *
  * Emission (update mode): each trigger re-emits the groups whose
  * state CHANGED this batch, k rows each. */
object PriorityStream {

  case class Doc(group: String, id: Long, w: Long)
  case class Entry(q: Double, id: Long, w: Long)
  case class Kept(group: String, id: Long, w: Double, est_w: Double)

  /** The batch operator's exact priority: one exact product + one
    * IEEE division over the id's md5 bucket. */
  private[graft] def priority(id: Long, w: Long): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val b = java.lang.Long.parseLong(hex.substring(28, 32), 16)
    w.toDouble * 65537.0 / (b + 1).toDouble
  }

  private def merge(cur: List[Entry], added: Iterator[Doc],
                    k: Int): List[Entry] = {
    // re-arrival dedup is FIRST-SEEN-WINS (state precedes the batch in
    // encounter order): weights are a pure function of the doc, so a
    // true replay carries the identical w and either choice agrees; a
    // CHANGED weight for a seen id is an upstream bug this operator
    // deliberately does not mask with last-wins semantics
    val all = (cur.iterator ++ added.map(d => Entry(priority(d.id, d.w), d.id, d.w)))
      .toSeq.groupBy(_.id).map(_._2.head).toSeq
    all.sortBy(e => (-e.q, e.id)).take(k + 1).toList
  }

  def sample(docs: Dataset[Doc], k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.group)
      .mapGroupsWithState[List[Entry], List[Kept]](
        GroupStateTimeout.NoTimeout()) {
        case (group, rows, state: GroupState[List[Entry]]) =>
          val next = merge(state.getOption.getOrElse(Nil), rows, k)
          state.update(next)
          val tau = next.lift(k).map(_.q)
          next.take(k).map(e => Kept(group, e.id, e.w.toDouble,
            tau.fold(e.w.toDouble)(t => math.max(e.w.toDouble, t))))
      }
      .flatMap(identity).toDF()
  }

  /** Batch reference over the same typed input (for parity specs and
    * backfills): delegates to the batch operator. */
  def sampleBatch(docs: Dataset[Doc], k: Int): DataFrame =
    graft.operators.Sampling.prioritySample(
      docs.toDF(), "group", "id", "w", k)
      .select(col("id"), col("group"), col("w").cast("double").as("w"),
              col("est_w"))
}
