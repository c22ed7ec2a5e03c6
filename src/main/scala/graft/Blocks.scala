package graft

import org.apache.spark.sql.SparkSession

/** Block-manager hygiene between queries.
  *
  * `spark.catalog.clearCache()` drops cached DataFrames but NOT
  * `localCheckpoint` blocks — a checkpointed RDD's blocks live until
  * the RDD object is GC'd. Iterative operators free their own
  * superseded rounds (Dedup.clusters), but the terminal checkpoint a
  * returned frame still reads from can only be freed by the caller,
  * after the result is consumed. A long-lived session running the
  * dedup family repeatedly would otherwise accrue block-manager state
  * without bound — and at bench time the accrued blocks made query
  * latency depend on suite position (r4: dedup_minhash_pairs 2.7 s
  * alone vs 10.7 s mid-suite).
  */
object Blocks {
  /** Drop every persisted block: cached frames AND checkpoint blocks.
    * Blocking, so the reclaim doesn't bleed into the next query's
    * measured time. Call only between queries — a localCheckpoint'd
    * RDD cannot be recomputed once unpersisted. */
  def freeAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  /** Unpersist the block-manager blocks behind a localCheckpoint'd
    * frame (no-op for anything else) — iterative operators free each
    * superseded round themselves (see the class doc). */
  private[graft] def freeCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
