package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Durable exactly-once replay guard for index-append sinks.
  *
  * The commit-note check in [[AnnIndexStream]]/[[InvertedIndexStream]]
  * scans only the notes of currently RETAINED versions, so a replayed
  * micro-batch arriving after more than `retain` subsequent commits
  * (a long recovery gap) would not be detected and would silently
  * double-append — double-counting postings/vectors and corrupting
  * BM25/df stats. This high-water record lives OUTSIDE the GC'd
  * version dirs: one empty marker file per committed batch id under
  * `<root>/_stream/`, so "have I seen batchId already?" is
  * `batchId <= max(listed ids)` regardless of how far retention has
  * advanced.
  *
  * Write discipline: the marker is created AFTER the index's CAS
  * commit — a crash in between leaves the note check to catch the
  * immediate replay (the just-committed version is by definition
  * retained). Marker files are create-only (atomic on every FS,
  * including S3-family stores — no rename, no overwrite); old markers
  * are pruned on each record, keeping a small tail for debuggability.
  * foreachBatch runs micro-batches sequentially per query, so ids are
  * recorded monotonically and the max is the high-water mark.
  */
object StreamMarkers {

  private val Dir = "_stream"
  private val KeepMarkers = 16

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest batch id ever recorded for this index root, if any. */
  def lastBatch(spark: SparkSession, root: String): Option[Long] = {
    val dir = new Path(s"$root/$Dir")
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) None
    else {
      val ids = fs.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("batch-") =>
          n.stripPrefix("batch-").toLong }
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** True iff `batchId` was already committed — replayed micro-batches
    * must be skipped by the caller. */
  def seen(spark: SparkSession, root: String, batchId: Long): Boolean =
    lastBatch(spark, root).exists(batchId <= _)

  /** Record a committed batch id and prune markers older than the
    * debuggability tail. */
  def record(spark: SparkSession, root: String, batchId: Long): Unit = {
    val dir = new Path(s"$root/$Dir")
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    fs.create(new Path(dir, s"batch-$batchId"), false).close()
    fs.listStatus(dir).toSeq
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("batch-") &&
          p.getName.stripPrefix("batch-").toLong < batchId - KeepMarkers
      }
      .foreach(fs.delete(_, false))
  }
}
