package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming token-budget gate — the continuous twin of
  * `Sampling.capTokensPerSource`: after ANY prefix of the stream, each
  * source's kept set equals the batch operator over the rows seen so
  * far. Determinism comes from the same device as the batch side: the
  * keep order is md5(id), a pure function of the document, so arrival
  * order and micro-batch boundaries cannot matter.
  *
  * Why the state stays BOUNDED: the batch kept set is the md5-order
  * PREFIX whose inclusive running total fits the budget, and adding
  * docs only grows every position's running total — so the
  * first-overflow position (the "horizon") only moves EARLIER over
  * time, and nothing at-or-after the current horizon can ever become
  * kept or become the horizon... except the horizon entry itself,
  * whose tokens still count against later positions exactly as in the
  * batch cumsum. The state is therefore the kept prefix PLUS the one
  * horizon entry (the priority-sampler's τ device): at most
  * budget / min-tokens + 1 entries per source, regardless of stream
  * length. No watermark needed; the gate is over all history by
  * design (recency-windowed variants compose by keying on
  * (source, window) upstream).
  *
  * Emission (update mode): each trigger re-emits the kept set of
  * every source whose state changed this batch. */
object TokenBudgetStream {

  case class Doc(source: String, id: Long, tokens: Long)
  case class Kept(source: String, id: Long, tokens: Long)
  private[graft] case class Entry(key: String, id: Long, tokens: Long)

  /** The batch operator's order key: md5 of the id's decimal string —
    * identical to `md5(cast(id as string))` on the batch side. */
  private[graft] def md5key(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** kept prefix + the first-overflow entry (whose tokens gate every
    * later position, exactly as in the batch cumsum). */
  private[graft] case class St(kept: List[Entry], horizon: Option[Entry])

  private def advance(cur: St, added: Iterator[Doc], budget: Long): St = {
    // first-seen-wins on replay (token counts are a pure function of
    // the doc, so a true replay is identical either way)
    val merged = (cur.kept.iterator ++ cur.horizon.iterator ++
        added.map(d => Entry(md5key(d.id), d.id, d.tokens)))
      .toSeq.groupBy(_.id).map(_._2.head).toSeq
      .sortBy(e => (e.key, e.id))
    // inclusive-prefix budget cut — the batch rule; the first exceeder
    // becomes the new horizon, everything after it can never matter
    var cum = 0L
    val (kept, rest) = merged.span { e => cum += e.tokens; cum <= budget }
    St(kept.toList, rest.headOption)
  }

  def gate(docs: Dataset[Doc], budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .mapGroupsWithState[St, List[Kept]](
        GroupStateTimeout.NoTimeout()) {
        case (source, rows, state: GroupState[St]) =>
          val next = advance(state.getOption.getOrElse(St(Nil, None)),
                             rows, budget)
          state.update(next)
          next.kept.map(e => Kept(source, e.id, e.tokens))
      }
      .flatMap(identity).toDF()
  }

  /** Batch reference over the same typed input (parity specs,
    * backfills): delegates to the batch operator. */
  def gateBatch(docs: Dataset[Doc], budget: Long): DataFrame =
    graft.operators.Sampling.capTokensPerSource(
      docs.toDF(), "source", "id", "tokens", budget)
}
