package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/splitting for training-data
  * pipelines. Everything keys off `md5(key)` — stable across runs,
  * partitionings, cluster sizes, AND engines (the DuckDB oracle
  * reproduces the exact assignment), unlike `rand()` or Spark's
  * `sample()` whose draws depend on partition layout.
  *
  * Scale: pure per-row projections — no shuffle, no state; the filter
  * form pushes through scans like any predicate.
  */
object Sampling {

  /** 0..15 bucket from the last hex nibble of md5(key-as-string). */
  def bucket16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 32, 1), 16, 10).cast("int")

  /** 0..255 bucket from the last hex byte — finer-grained fractions. */
  def bucket256(key: Column): Column =
    conv(substring(md5(key.cast("string")), 31, 2), 16, 10).cast("int")

  /** train/val/test assignment: 12/2/2 sixteenths (75/12.5/12.5%). */
  def splitLabel(key: Column): Column = {
    val b = bucket16(key)
    when(b < 12, "train").when(b < 14, "val").otherwise("test")
  }

  /** Keep ~fraction of rows, deterministically by key hash. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(bucket256(key) < (fraction * 256).round)
}
