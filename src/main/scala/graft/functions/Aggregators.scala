package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s for the Dataset API — algebraic (zero/reduce/
  * merge) so Spark runs them with map-side partial aggregation.
  *
  * TopK is the scale-relevant one: top-k-per-group via a window
  * (`row_number <= k`) shuffles EVERY row to its group's partition;
  * an algebraic top-k carries at most k rows per group out of each
  * map task, so the shuffle is O(groups·k) regardless of group size.
  * Use the window form when you need ranks over the whole group,
  * this when you only need the k survivors.
  */
object Aggregators {

  case class Scored(id: Long, score: Double)

  /** Bounded top-k by (score desc, id asc) — deterministic total
    * order. Buffer is a sorted Seq capped at k (k is small; for very
    * hot paths swap in a binary heap, the algebra is identical). */
  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0, "k must be positive")
    private def top(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)
    override def zero: Seq[Scored] = Nil
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.size < k || a.score > b.last.score ||
          (a.score == b.last.score && a.id < b.last.id)) top(b :+ a) else b
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = top(x ++ y)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
  }

  def topK(k: Int): TopKAgg = new TopKAgg(k)
}
