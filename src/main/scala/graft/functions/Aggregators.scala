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

  case class TokenCount(token: String, est: Long)

  /** Misra-Gries heavy hitters — a MERGEABLE one-pass frequency
    * summary (Agarwal et al., "Mergeable Summaries", PODS'12). The
    * scale story: exact top-k terms needs a full vocabulary shuffle
    * (O(distinct) rows); this carries at most `capacity` (token,
    * count) pairs out of each map task and merges them losslessly
    * w.r.t. the MG error bound, so the shuffle is O(tasks·capacity)
    * no matter how large the corpus. Guarantees after any merge tree
    * over a stream of n items: every estimate is an UNDERCOUNT by at
    * most n/(capacity+1), and every item with true frequency >
    * n/(capacity+1) survives in the summary. Estimates (and in edge
    * cases the survivor set) depend on the merge order, so production
    * use is rows-only checked; the `heavy_hitters_sound` gate runs
    * capacity ≥ vocabulary where the summary is provably exact.
    *
    * reduce() is the classic per-item step (hit: +1; miss with room:
    * insert; miss when full: decrement-all — amortized O(1) per item
    * since each decrement pays back an earlier insert). merge() is
    * the summary-sum + subtract-(capacity+1)-th-largest step from the
    * paper. Buffer is an immutable Map (capacity entries, small by
    * construction); the typed agg runs as a map-side-partial
    * SortAggregate like every struct-buffered Aggregator. */
  class HeavyHittersAgg(capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[TokenCount]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      b.get(tok) match {
        case Some(c)                   => b.updated(tok, c + 1)
        case None if b.size < capacity => b.updated(tok, 1L)
        case None =>
          b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= capacity) sum
      else {
        val d = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        sum.flatMap { case (t, c) => if (c > d) Some(t -> (c - d)) else None }
      }
    }

    /** Deterministic presentation order: estimate desc, token asc. */
    override def finish(r: Map[String, Long]): Seq[TokenCount] =
      r.toSeq.map { case (t, c) => TokenCount(t, c) }
        .sortBy(tc => (-tc.est, tc.token))

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[TokenCount]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TokenCount]]()
  }

  def heavyHitters(capacity: Int): HeavyHittersAgg = new HeavyHittersAgg(capacity)

  case class VecSum(sum: Seq[Double], n: Long)

  /** Element-wise vector sum + count — the centroid-update aggregate
    * for distributed k-means (graft.operators.Cluster). Algebraic, so
    * each map task emits ONE (dim-doubles, count) buffer per cluster
    * and partials merge map-side: the shuffle is O(tasks·k·dim)
    * regardless of corpus size, and no task ever materializes a
    * member list (the explode-by-dimension formulation ships dim×
    * rows; this ships one). Accumulates in Double so integer-valued
    * inputs stay exact (the ClusterSpec parity gate relies on it). */
  class VecSumAgg extends Aggregator[Seq[Float], VecSum, VecSum] {
    override def zero: VecSum = VecSum(Nil, 0L)
    override def reduce(b: VecSum, v: Seq[Float]): VecSum = {
      val s = if (b.n == 0L) new Array[Double](v.length) else b.sum.toArray
      var i = 0
      while (i < v.length) { s(i) += v(i); i += 1 }
      VecSum(s.toSeq, b.n + 1)
    }
    override def merge(x: VecSum, y: VecSum): VecSum =
      if (x.n == 0L) y
      else if (y.n == 0L) x
      else {
        val s = x.sum.toArray
        var i = 0
        while (i < s.length) { s(i) += y.sum(i); i += 1 }
        VecSum(s.toSeq, x.n + y.n)
      }
    override def finish(r: VecSum): VecSum = r
    override def bufferEncoder: Encoder[VecSum] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[VecSum]()
    override def outputEncoder: Encoder[VecSum] = bufferEncoder
  }

  def vecSum: VecSumAgg = new VecSumAgg
}
