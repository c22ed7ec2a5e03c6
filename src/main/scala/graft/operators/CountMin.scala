package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a mergeable
  * frequency table: depth independent hash rows × width counters;
  * estimate(key) = min over rows of its counter — never an
  * underestimate, overestimate bounded by ε·N with ε = e/width at
  * depth ln(1/δ). The streaming-agg complement to Misra-Gries
  * (#38b): MG keeps the top-k heavy hitters and forgets the tail; CM
  * answers point queries about ANY key, heavy or not, in fixed
  * space.
  *
  * Scale shape: the build is ONE partial-agg shuffle whose post-agg
  * size is ≤ depth·width rows no matter the corpus (the token stream
  * collapses map-side); tables from disjoint corpus shards merge by
  * (row, bucket) count addition — the property that lets 1000
  * executors sketch 100 TB independently. Estimation broadcasts the
  * (tiny, bounded) table into the probe join.
  *
  * Determinism: hash rows are disjoint 4-hex-digit slices of md5 —
  * engine-portable, so the WHOLE sketch (build + probe + min) is
  * exactly recomputable by the DuckDB oracle; CM's "approximation"
  * is a deterministic function of the data, not a random one.
  */
object CountMin {

  val MaxDepth = 4 // md5's 32 hex chars = 4 disjoint 8-char slices

  /** Counter index of `t` in hash row `row`: fold 4 hex digits of the
    * row's md5 slice, mod width. */
  private[graft] def bucket(t: Column, row: Int, width: Int): Column =
    (conv(substring(md5(t), 1 + row * 8, 4), 16, 10).cast("long") % width)
      .cast("int")

  /** Build the (row, bucket, c) counter table over a token column. */
  def buildTable(toks: DataFrame, tokenCol: String,
                 depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= MaxDepth,
      s"depth out of [1, $MaxDepth]: $depth")
    require(width >= 2 && width <= 65536, s"width out of [2, 65536]: $width")
    toks.select(posexplode(array(
        (0 until depth).map(r => bucket(col(tokenCol), r, width)): _*))
        .as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for `keys` against a built table: min over rows
    * of the key's counters (0 for a never-touched counter). The table
    * is depth·width-bounded, hence broadcast. */
  def estimate(table: DataFrame, keys: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame = {
    val probes = keys.select(col(keyCol),
      posexplode(array(
        (0 until depth).map(r => bucket(col(keyCol), r, width)): _*))
        .as(Seq("row", "bucket")))
    probes.join(broadcast(table), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_estimate"))
  }
}
