package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.{Manifest, AnnIndex, InvertedIndex}
import graft.functions.TextFunctions

/** Incremental curation: the production form of the one-shot
  * `curate_pipeline` flagship (#65). Each arriving batch runs
  * ledger-dedup → quality gate → per-source token budget, then appends
  * the survivors to the published corpus, the fingerprint ledger, BOTH
  * persisted indexes (ANN + inverted), and the budget state — all
  * pinned by ONE Manifest `commitWith` per batch, so a reader sees
  * batch boundaries atomically.
  *
  * Scale economics (the Delta/Iceberg shape):
  *   - corpus/ and ledger/ are per-version DELTAS — each commit writes
  *     only the batch; the full table is the union of versions (an
  *     append-only log read, no O(total) rewrite per batch);
  *   - state/ (per-source cumulative token counters) is a per-version
  *     SNAPSHOT — bounded by |sources|, trivially small;
  *   - meta/ pins the ANN and inverted-index versions published for
  *     this batch: the indexes keep their own Manifest roots (their
  *     appends are zero-copy catalog re-publishes), and the outer
  *     commit records which version belongs to this batch — if the
  *     outer commit never lands, the pre-committed index versions are
  *     orphaned-but-harmless (next batch re-appends from the curation
  *     root's authoritative state).
  *
  * Append == rebuild, by construction (the discipline each piece
  * already proves alone — `dedup_incremental`, `ann_index_append`,
  * `bm25_index_incremental` — here proven for the COMPOSITION):
  *   - dedup: the ledger holds every FIRST-SEEN fingerprint (including
  *     docs later rejected by quality or budget), so a later duplicate
  *     of a rejected doc is rejected too — exactly what from-scratch
  *     keep-one-then-filter produces;
  *   - budget: the state carries the per-source running token sum over
  *     the whole QUALITY-PASSED stream (not just accepted docs —
  *     from-scratch's window cumsum includes every row it scans), and
  *     batches arrive in doc_id order, so resuming the cumsum equals
  *     the global one;
  *   - indexes: batch appends are doc-disjoint (the ledger guarantees
  *     it), and both index appends recompose exact integer stats.
  */
object Curate {

  /** The three Manifest roots one curation pipeline owns. */
  final case class Roots(curation: String, ann: String, inv: String)

  /** Make a fresh Roots triple under a temp dir (gate/test plumbing). */
  def tempRoots(prefix: String): Roots = {
    val base = java.nio.file.Files.createTempDirectory(prefix).toString
    Roots(s"$base/cur", s"$base/ann", s"$base/inv")
  }

  private def subDir(spark: SparkSession, root: String, v: Long,
                     sub: String): String =
    s"${Manifest.resolvedDataDir(spark, root, v)}/$sub"

  /** Union a per-version DELTA sub-table across all retained versions
    * (the append-only log read). */
  private def readDeltas(spark: SparkSession, root: String,
                         sub: String): Option[DataFrame] = {
    val vs = Manifest.versions(spark, root)
    if (vs.isEmpty) None
    else Some(vs.map(v => spark.read.parquet(subDir(spark, root, v, sub)))
      .reduce(_.unionByName(_)))
  }

  /** The published curated corpus: (doc_id, source, quality) union of
    * all batch deltas. */
  def readCorpus(spark: SparkSession, roots: Roots): DataFrame =
    readDeltas(spark, roots.curation, "corpus").getOrElse(
      throw new IllegalStateException(s"no curation commits at ${roots.curation}"))

  /** Ingest one batch. `batch` must carry (doc_id, source, text) with
    * doc_ids strictly above every previously ingested batch (arrival
    * order IS doc_id order — the append==rebuild precondition);
    * `embeddings` is the (vec_id, embedding) side table batch vectors
    * are pulled from. Returns the committed curation version. */
  /** Batch note of a committed curation version (from meta/), or ""
    * for pre-note versions. Streaming ingestion keys replay detection
    * on it. */
  def noteOf(spark: SparkSession, roots: Roots, v: Long): String = {
    val df = spark.read.parquet(subDir(spark, roots.curation, v, "meta"))
    if (df.columns.contains("batch_note"))
      df.select(col("batch_note")).head().getString(0)
    else ""
  }

  def runBatch(spark: SparkSession, roots: Roots, batch: DataFrame,
               embeddings: DataFrame, qualityFloor: Double,
               budgetPerSource: Long, annCells: Int = 4,
               nFiles: Int = 4, note: String = ""): Long = {
    val priorVs = Manifest.versions(spark, roots.curation)
    val first = priorVs.isEmpty

    // ---- stage 1: ledger dedup (keep-one within batch, drop any fp
    // ever seen before — Dedup.incrementalExact semantics inline, the
    // projection kept narrow)
    val wFp = Window.partitionBy(col("fp"))
    val keepOne = batch
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .withColumn("keeper", min(col("doc_id")).over(wFp))
      .where(col("doc_id") === col("keeper"))
    val fresh = readDeltas(spark, roots.curation, "ledger") match {
      case Some(led) => keepOne.join(led.hint("shuffle_hash"), Seq("fp"), "left_anti")
      case None      => keepOne
    }
    // every first-seen fp enters the ledger NOW — before quality and
    // budget — so later duplicates of rejected docs stay rejected
    val ledgerDelta = fresh.select(col("fp"))

    // ---- stage 2: quality gate
    val scored = fresh
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .where(col("quality") >= qualityFloor)

    // ---- stage 3: per-source token budget, doc_id order, resuming the
    // prior cumsum. NOTE the order is doc_id, not the md5 order of
    // `mixture_token_budget`: arrival order is the only order an
    // incremental cut can share with its from-scratch twin.
    import spark.implicits._
    val priorState = priorVs.lastOption
      .map(v => spark.read.parquet(subDir(spark, roots.curation, v, "state")))
      .getOrElse(Seq.empty[(String, Long)].toDF("source", "used_tokens"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val budgeted = scored
      .withColumn("n_tokens", TextFunctions.bpeTokenCount(col("text")).cast("long"))
      .join(broadcast(priorState), Seq("source"), "left")
      .withColumn("cum",
        sum(col("n_tokens")).over(wCum) + coalesce(col("used_tokens"), lit(0L)))
      .localCheckpoint()
    val accepted = budgeted.where(col("cum") <= budgetPerSource)
      .select(col("doc_id"), col("source"), col("quality"), col("fp"))
      .localCheckpoint()

    // new state: prior counters carried forward, batch's FULL
    // quality-passed token mass added (see object doc — rejected rows
    // still advance the from-scratch cumsum)
    val batchTokens = budgeted.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("batch_tokens"))
    val newState = priorState.join(batchTokens, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("used_tokens"), lit(0L)) +
          coalesce(col("batch_tokens"), lit(0L))).as("used_tokens"))

    // ---- stage 4: index appends (zero-copy catalog re-publishes on
    // their own roots; versions pinned in meta/ below)
    val annBatch = embeddings
      .join(accepted.select(col("doc_id").as("vec_id")), "vec_id")
      .select(col("vec_id"), col("embedding"))
    // crash-recovery idempotence for the append paths: a crash AFTER
    // an index append but BEFORE the outer commit leaves the index one
    // version ahead; the replayed batch finds its note on a retained
    // version and REUSES it instead of double-appending. (A replayed
    // FIRST batch is naturally safe: build publishes a catalog of only
    // its own segment, so the rebuilt version supersedes the orphan.)
    def notedVersion(root: String, note0: String,
                     noteAt: Long => String): Option[Long] =
      if (note0.isEmpty) None
      else Manifest.versions(spark, root).find(v => noteAt(v) == note0)
    val annV =
      if (first)
        AnnIndex.build(spark, annBatch, roots.ann, cells = annCells,
          nFiles = nFiles)
      else notedVersion(roots.ann, note,
          v => AnnIndex.noteOf(spark, roots.ann, Some(v))).getOrElse {
        if (annBatch.isEmpty)
          Manifest.currentVersion(spark, roots.ann).getOrElse(-1L)
        else
          AnnIndex.append(spark, roots.ann, annBatch, nFiles = nFiles,
            note = note).version
      }
    val invBatch = batch
      .join(accepted.select(col("doc_id")), "doc_id")
      .select(col("doc_id"), col("text"))
    val invV =
      if (first)
        InvertedIndex.build(spark, invBatch, roots.inv, nBuckets = nFiles,
          nFiles = nFiles)
      else notedVersion(roots.inv, note,
          v => InvertedIndex.noteOf(spark, roots.inv, Some(v))).getOrElse {
        if (invBatch.isEmpty)
          Manifest.currentVersion(spark, roots.inv).getOrElse(-1L)
        else
          InvertedIndex.append(spark, roots.inv, invBatch, nFiles = nFiles,
            note = note)
      }

    // ---- stage 5: ONE atomic publish for the batch
    Manifest.commitWith(spark, roots.curation, retain = 16) { dir =>
      accepted.select(col("doc_id"), col("source"), col("quality"))
        .write.parquet(s"$dir/corpus")
      ledgerDelta.write.parquet(s"$dir/ledger")
      newState.write.parquet(s"$dir/state")
      Seq((annV, invV, note)).toDF("ann_version", "inv_version", "batch_note")
        .write.parquet(s"$dir/meta")
    }
  }
}
