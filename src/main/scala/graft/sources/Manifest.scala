package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Object-store-safe table commit: write-new-version-dir + atomic
  * marker file, in place of a directory rename swap.
  *
  * `fs.rename` is not atomic on S3-family stores — and a 100 TB lake
  * lives on one — so the reference's staging-table swap (transaction
  * boundary: `/root/reference/mnt/dags/unused_pipeline_sourcecode.py:329-350`,
  * `unused_02retail_stage.py:100-143`) cannot be re-expressed as two
  * renames: a crash between them loses the target, and readers see a
  * window with no table at all. This manifest scheme never renames and
  * never overwrites a live object:
  *
  *  - data for version N lives in `<root>/data-N/`
  *  - a commit IS the creation of `<root>/_commits/N` — a brand-new
  *    file, which is a single atomic PUT on S3 and an atomic
  *    create-no-overwrite on HDFS/local
  *  - readers resolve max(N) under `_commits` and read `data-N`: at
  *    every instant some fully-written version is resolvable — no
  *    swap gap, and a crash before the marker leaves only an orphaned
  *    data dir that the next commit overwrites and GC removes
  *  - GC after committing N keeps N and N-1 (for in-flight readers of
  *    the previous version) and deletes anything older
  *
  * Single writer assumed (a streaming query or one batch job):
  * `create(marker, overwrite = false)` makes a second concurrent
  * committer fail loudly instead of silently racing.
  */
object Manifest {

  private val CommitsDir = "_commits"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def dataDir(root: String, version: Long): String = s"$root/data-$version"

  /** Highest committed version, if the table exists. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val dir = new Path(root, CommitsDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .maxOption
  }

  /** All committed versions, ascending — the time-travel index. GC
    * drops a version's marker and data dir together, so every listed
    * version is readable. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(root, CommitsDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .sorted
  }

  /** Read the current committed version, if any. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentVersion(spark, root).map(v => spark.read.parquet(dataDir(root, v)))

  /** Time travel: read a SPECIFIC committed version. Fails with the
    * retention story in the message when `v` was never committed or
    * has been vacuumed — the first question a reader asks after an
    * atomic publish is "can I still see yesterday's table", and the
    * answer must be a clear yes/no, not a parquet path error. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val marker = new Path(new Path(root, CommitsDir), v.toString)
    require(fsOf(spark, marker).exists(marker),
      s"version $v of $root is not committed or was vacuumed; " +
        s"available: ${versions(spark, root).mkString("[", ", ", "]")}")
    spark.read.parquet(dataDir(root, v))
  }

  /** Write `df` as the next version and publish it atomically.
    * Returns the committed version number. `retain` controls how many
    * trailing versions stay readable after the commit (default 2:
    * the new version plus one for in-flight readers — the original
    * behavior); raise it to keep a time-travel window. */
  def commit(spark: SparkSession, root: String, df: DataFrame,
             retain: Int = 2): Long = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val next = currentVersion(spark, root).map(_ + 1).getOrElse(0L)
    // a crash after this write but before the marker leaves an orphan;
    // the retry recomputes the same `next` and overwrites it
    df.write.mode("overwrite").parquet(dataDir(root, next))
    val marker = new Path(new Path(root, CommitsDir), next.toString)
    val fs = fsOf(spark, marker)
    val out = fs.create(marker, false) // commits are immutable: never overwrite
    try out.write(s"data-$next\n".getBytes("UTF-8")) finally out.close()
    gc(fs, root, keepFrom = next - (retain - 1))
    next
  }

  /** Keyed diff between two retained versions — the audit question a
    * versioned lake gets asked right after time travel ("what changed
    * between yesterday's publish and today's?"): one full-outer join
    * on the key, classifying each key as inserted / deleted /
    * updated / unchanged (update detection compares the remaining
    * columns via a hash over their canonical struct — no column list
    * to maintain). Both sides are immutable published versions, so
    * the result is reproducible for as long as retention keeps them.
    * Scale: one shuffle on the key (the join); the classification is
    * per-row. */
  def diff(spark: SparkSession, root: String, keyCol: String,
           fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    def hashed(v: Long, side: String) = {
      val df = readVersion(spark, root, v)
      val rest = df.columns.filterNot(_ == keyCol).sorted
      df.select(col(keyCol).as(s"${side}_key"),
        hash(struct(rest.map(col): _*)).as(s"${side}_h"))
    }
    hashed(fromV, "a").join(hashed(toV, "b"),
        col("a_key") === col("b_key"), "full_outer")
      .select(coalesce(col("b_key"), col("a_key")).as(keyCol),
        when(col("a_key").isNull, "inserted")
          .when(col("b_key").isNull, "deleted")
          .when(col("a_h") =!= col("b_h"), "updated")
          .otherwise("unchanged").as("change"))
  }

  /** Explicit retention pass: keep the newest `retain` committed
    * versions, delete the rest (data dirs and markers drop together
    * inside [[gc]], so a reader that can list a version can read it).
    * Returns the versions removed. */
  def vacuum(spark: SparkSession, root: String, retain: Int): Seq[Long] = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val vs = versions(spark, root)
    val dropped = vs.dropRight(retain)
    if (dropped.nonEmpty) {
      val fs = fsOf(spark, new Path(root))
      gc(fs, root, keepFrom = dropped.max + 1)
    }
    dropped
  }

  /** Drop data dirs and markers older than `keepFrom` (the previous
    * version stays readable for in-flight readers). */
  private def gc(fs: FileSystem, root: String, keepFrom: Long): Unit = {
    val rootP = new Path(root)
    fs.listStatus(rootP).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("data-"))
        scala.util.Try(name.stripPrefix("data-").toLong).toOption
          .filter(_ < keepFrom)
          .foreach(_ => fs.delete(st.getPath, true))
    }
    fs.listStatus(new Path(root, CommitsDir)).foreach { st =>
      scala.util.Try(st.getPath.getName.toLong).toOption
        .filter(_ < keepFrom)
        .foreach(_ => fs.delete(st.getPath, false))
    }
  }
}
