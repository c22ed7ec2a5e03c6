package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling-free clustered layout for ENUMERABLE partition keys.
  *
  * Every index segment writer needs its rows clustered by a small
  * integer key (inverted-index `bucket` ∈ [0, nBuckets), ANN `cell` ∈
  * [0, cells)) so [[StatsIndex]] file pruning bites. The obvious tool,
  * `repartitionByRange`, pays a hidden full pass: RangePartitioner
  * SAMPLES the child to find boundaries, and the child here is the
  * expensive part of the write (the whole tokenize/term-count chain,
  * or the centroid-assignment scan) — so every segment write computed
  * its input twice (r18 verdict item 4 named exactly this as the
  * inv-append residual; the r18/r19 escape hatches — hash layout,
  * opt-in checkpoint — each traded away layout quality or memory).
  *
  * But a bounded integer key needs no sampling: the key's domain is
  * KNOWN, so the boundaries are known. [[repartitionByKeyRange]]
  * routes key k to file ⌊k·nFiles/nKeys⌋ deterministically by
  * repartitioning on a PROBE value x(fid) precomputed (driver-side,
  * microseconds) such that Spark's hash partitioning
  * `pmod(murmur3(x, 42), nFiles) = fid`. One pass, zero sampling, and
  * the resulting files partition the key space into CONTIGUOUS ranges
  * exactly like the range layout (tighter, in fact: keys never
  * straddle a file boundary mid-key). LayoutSpec pins the placement
  * per partition; if a Spark release ever changed the partitioning
  * hash the spec breaks loudly — and even unpinned, results stay
  * correct (StatsIndex min/max always reflect the files actually
  * written; layout quality is the only thing at stake).
  */
object Layout {

  /** Murmur3 of a single int exactly as Spark's HashPartitioning
    * computes it for an integer column (seed 42). */
  private def sparkHashInt(x: Int): Int =
    org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(x, 42)

  /** probe(fid) = smallest non-negative int x with
    * pmod(murmur3(x, 42), n) == fid. */
  private[sources] def probeValues(n: Int): Array[Int] = {
    val probes = new Array[Int](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var x = 0
    while (remaining > 0) {
      val p = ((sparkHashInt(x) % n) + n) % n
      if (!found(p)) { found(p) = true; probes(p) = x; remaining -= 1 }
      x += 1
    }
    probes
  }

  /** Repartition `df` into `nFiles` partitions where partition fid
    * holds exactly the rows with ⌊key·nFiles/nKeys⌋ = fid — the
    * sampling-free equivalent of `repartitionByRange(nFiles, key)`
    * for keys in [0, nKeys). Callers sort within partitions
    * afterwards exactly as with the range layout. */
  def repartitionByKeyRange(df: DataFrame, key: Column, nKeys: Int,
                            nFiles: Int): DataFrame = {
    require(nKeys >= 1 && nFiles >= 1, s"bad layout: nKeys=$nKeys nFiles=$nFiles")
    val files = math.min(nFiles, nKeys) // more files than keys = empties
    val fid = (key.cast("long") * files / nKeys).cast("int")
    routeByFid(df, fid, files)
  }

  /** The same, for a UNIFORM 64-bit hash key (xxhash64 digests — the
    * grep trigram domain): fixed-width SIGNED ranges of the long
    * domain replace sampled boundaries. fid = ((h >> 1) + 2^62) /
    * ⌈2^63 / nFiles⌉ is monotone in the signed key, so each file
    * holds one contiguous key range (tight parquet/StatsIndex
    * min-max) and uniformity of the hash makes the widths balanced —
    * exactly what RangePartitioner's sample would have found, minus
    * the extra pass over the (expensive) child. */
  def repartitionByHashRange(df: DataFrame, key: Column,
                             nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"bad layout: nFiles=$nFiles")
    val width = Long.MaxValue / nFiles + 1 // ⌈2^63 / nFiles⌉
    val fid = ((shiftright(key, 1) + lit(1L << 62)) / lit(width)).cast("int")
    routeByFid(df, fid, nFiles)
  }

  private def routeByFid(df: DataFrame, fid: Column, files: Int): DataFrame = {
    val probes = probeValues(files)
    df.withColumn("__layout_probe", element_at(lit(probes), fid + 1))
      .repartition(files, col("__layout_probe"))
      .drop("__layout_probe")
  }
}
