package graft.streaming

import java.time.Instant
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** Streaming embedding near-duplicate detection: the continuous twin
  * of `Dedup.embeddingCosinePairs` for a vector feed — every incoming
  * embedding is checked against the vectors already seen in its
  * sign-LSH band buckets, so near-dups drop at ingest instead of in a
  * nightly batch. Same shape as [[DocsStream]]: the banded sign
  * bucket is computed with the SAME native SignBucket expression as
  * the batch operator, the stream is keyed by (band_idx, band_val),
  * and per-bucket state self-expires via event-time timeout.
  *
  * Unlike MinHash state (k signature longs), each state entry keeps
  * the full vector — cosine needs it — so per-bucket memory is
  * O(docs-per-bucket × dim floats); the watermark horizon bounds it.
  * The free bucket-hamming prefilter from the batch path applies
  * before any dot product. Differences from batch, by nature of
  * streaming: pairs are arrival-ordered (earlier vector first) and a
  * pair sharing several bands can emit more than once (at-least-once;
  * consumers dedupe on (id_a, id_b)) — but the cosine emitted IS
  * exact, computed from the stored vectors.
  *
  * Exact-duplicate collapse (same rationale as the batch operator's
  * step 0): identical vectors share EVERY band, so without collapse a
  * flood of F copies inside the watermark horizon emits
  * bands × F²/2 pairs and holds F copies of the vector in every
  * band's state. Instead, an arrival whose vector is bit-identical to
  * a stored entry emits ONE pair to that first-seen keeper — from
  * band 0 only, so a copy costs exactly one output row — is never
  * added to state, and refreshes the keeper's expiry so the group
  * stays resident while the flood continues (the batch twin keeps a
  * duplicated group alive via its keeper the same way). State and
  * output are thus linear in DISTINCT vectors, not arrivals. The pair
  * carries cosine(v, v) computed from the stored vector — ≈1.0, and
  * NaN (suppressed, < tau) for zero vectors — exactly how the batch
  * pipeline verifies collapsed groups. One deliberate divergence from
  * batch: a collapsed copy pairs ONLY with its keeper, not with the
  * keeper's other near-dup partners (batch expands group pairs to all
  * members); the missing pairs are exactly the ones cluster
  * resolution (Dedup.clusters over the pair stream) recovers
  * transitively, and emitting them would require unbounded
  * per-keeper partner state.
  */
object EmbedStream extends Serializable {

  case class BandedVec(vec_id: Long, ts: Instant, vec: Array[Float],
                       bucket: Long, band_idx: Int, band_val: Long)
  case class VecNearDup(id_a: Long, id_b: Long, cos: Double, ts: Instant)
  case class SeenVec(id: Long, tsUs: Long, bucket: Long, vec: Array[Float])

  private def micros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  /** Sequential double accumulation, matching the batch DotProduct
    * expression's evaluation order bit for bit. */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) Double.NaN else dot / denom
  }

  /** Near-dup pairs over a stream of (vec_id, ts, vec). Banding
    * defaults target the high-cosine dedup regime like the batch
    * operator; derive from tau via [[Dedup.bandingFor]] for
    * moderate-tau sweeps. */
  def nearDupPairs(spark: SparkSession, vecs: DataFrame,
                   horizonMinutes: Int, tau: Double = 0.9,
                   bands: Int = 8, rows: Int = 8,
                   dim: Int = 64): Dataset[VecNearDup] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val m = bands * rows
    val p = math.acos(tau) / math.Pi
    val maxDiffBits =
      math.ceil(m * p + 4.0 * math.sqrt(m * p * (1 - p))).toInt
    val horizonUs = horizonMinutes * 60000000L
    val mask = (1L << rows) - 1
    val banded = vecs
      .withWatermark("ts", s"$horizonMinutes minutes")
      .select(col("vec_id"), col("ts"), col("vec"),
        graft.functions.GraftFunctions
          .signBucket(col("vec"), Dedup.hyperplanes(m, dim)).as("bucket"))
      .select(col("vec_id"), col("ts"), col("vec"), col("bucket"),
        posexplode(expr(
          s"transform(sequence(0, ${bands - 1}), j -> shiftright(bucket, j * $rows) & $mask)"))
          .as(Seq("band_idx", "band_val")))
      .as[BandedVec]

    def fn(key: (Int, Long), it: Iterator[BandedVec],
           state: GroupState[List[SeenVec]]): Iterator[VecNearDup] = {
      val incoming = it.toList.sortBy(d => (micros(d.ts), d.vec_id))
      // expire BEFORE processing (see DocsStream.fn): a stale keeper
      // surviving in a quiet bucket would otherwise absorb copies
      // silently (non-zero bands suppress emission) while band 0
      // elects a fresh keeper — splitting an exact-dup group.
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      var seen = state.getOption.getOrElse(Nil)
        .filter(_.tsUs + horizonUs >= wmUs)
      val out = List.newBuilder[VecNearDup]
      for (d <- incoming) {
        // exact-dup collapse: bit-identical vectors share the full
        // 64-bit bucket, so bucket equality is a free prefilter for
        // the array comparison. One pair per copy (band 0 emits, the
        // other bands see the same copy and stay silent), keeper
        // expiry refreshed, copy NOT added to state.
        seen.find(e => e.id != d.vec_id && e.bucket == d.bucket &&
                    java.util.Arrays.equals(e.vec, d.vec)) match {
          case Some(keeper) =>
            if (key._1 == 0) {
              val c = cosine(keeper.vec, d.vec)
              if (c >= tau) out += VecNearDup(keeper.id, d.vec_id, c, d.ts)
            }
            val tsU = micros(d.ts)
            seen = seen.map(e =>
              if (e.id == keeper.id && e.tsUs < tsU) e.copy(tsUs = tsU)
              else e)
          case None =>
            for (e <- seen if e.id != d.vec_id
                   if java.lang.Long.bitCount(e.bucket ^ d.bucket) <= maxDiffBits) {
              val c = cosine(e.vec, d.vec)
              if (c >= tau) out += VecNearDup(e.id, d.vec_id, c, d.ts)
            }
            // replace rather than prepend on same-id replay, so a
            // redelivered vector can't duplicate its state entry —
            // keeping the LATEST sighting (a late redelivery must not
            // rewind the expiry, same guard as the keeper refresh)
            val tsU = math.max(micros(d.ts),
              seen.find(_.id == d.vec_id).map(_.tsUs).getOrElse(0L))
            seen = SeenVec(d.vec_id, tsU, d.bucket, d.vec) ::
              seen.filterNot(_.id == d.vec_id)
        }
      }
      if (seen.nonEmpty) {
        state.update(seen)
        state.setTimeoutTimestamp(
          (seen.map(_.tsUs).min + horizonUs) / 1000L + 1)
      } else state.remove()
      out.result().iterator
    }

    banded.groupByKey(d => (d.band_idx, d.band_val))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
