package graft

import org.apache.spark.sql.functions._
import graft.operators.Curate
import graft.sources.Manifest

/** Incremental-curation composition (#65a). The composed
  * append==rebuild equality is driver-gated by `curate_incremental`
  * (from-scratch DuckDB recomputation); this spec pins the two
  * semantics that make the equality hold and the batch-commit
  * plumbing. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  // quality arithmetic under TextFunctions.qualityScore:
  //   "aaaa"      -> letters 1.0*0.5 + stop 0 + clean 0.2 = 0.7, 1 token
  //   "...."      -> 0.0 (all punctuation), 4 tokens
  //   "aa bb"     -> letters 4/5*0.5 + 0 + 0.2 = 0.6,       2 tokens
  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")
  private def embs(ids: Long*) =
    ids.map(i => (i, Array(i.toFloat, 1f, 0f, 0f))).toDF("vec_id", "embedding")

  test("a later duplicate of a quality-REJECTED doc stays rejected (ledger-first)") {
    val roots = Curate.tempRoots("curate-spec-led")
    // batch 1: doc 1 fails the 0.5 floor; its fp still enters the ledger
    Curate.runBatch(spark, roots,
      docs((1L, "s", "...."), (2L, "s", "aaaa")), embs(1L, 2L),
      qualityFloor = 0.5, budgetPerSource = 100L)
    // batch 2: doc 11 repeats the REJECTED text — from-scratch keep-one
    // would collapse it into doc 1 and then quality-reject it, so the
    // incremental path must reject it too
    Curate.runBatch(spark, roots,
      docs((11L, "s", "...."), (12L, "s", "bbbb")), embs(11L, 12L),
      qualityFloor = 0.5, budgetPerSource = 100L)
    val got = Curate.readCorpus(spark, roots).select("doc_id")
      .as[Long].collect().sorted
    assert(got.toSeq === Seq(2L, 12L))
  }

  test("budget state carries the FULL quality-passed mass, not just accepted") {
    val roots = Curate.tempRoots("curate-spec-bud")
    // budget 2: doc 1 (1 token) accepted; doc 3 (2 tokens, cum 3)
    // budget-rejected but its mass must still advance the counter
    Curate.runBatch(spark, roots,
      docs((1L, "s", "aaaa"), (3L, "s", "bb cc")), embs(1L, 3L),
      qualityFloor = 0.5, budgetPerSource = 2L)
    // batch 2: doc 5 (1 token). From-scratch cumsum = 1+2+1 = 4 > 2 →
    // reject. A state that only counted ACCEPTED tokens (1) would
    // wrongly accept it at cum 2.
    Curate.runBatch(spark, roots,
      docs((5L, "s", "dddd")), embs(5L),
      qualityFloor = 0.5, budgetPerSource = 2L)
    val got = Curate.readCorpus(spark, roots).select("doc_id")
      .as[Long].collect().sorted
    assert(got.toSeq === Seq(1L))
  }

  test("each batch is one commit; meta pins index versions; empty batches commit") {
    val roots = Curate.tempRoots("curate-spec-ver")
    Curate.runBatch(spark, roots,
      docs((1L, "s", "aaaa"), (2L, "t", "bbbb")), embs(1L, 2L),
      qualityFloor = 0.5, budgetPerSource = 100L)
    // batch of pure duplicates: nothing accepted, indexes untouched,
    // but the batch still publishes (ledger idempotence + audit trail)
    Curate.runBatch(spark, roots,
      docs((11L, "s", "aaaa")), embs(11L),
      qualityFloor = 0.5, budgetPerSource = 100L)
    Curate.runBatch(spark, roots,
      docs((21L, "u", "cccc")), embs(21L),
      qualityFloor = 0.5, budgetPerSource = 100L)
    assert(Manifest.versions(spark, roots.curation) === Seq(0L, 1L, 2L))
    val metas = Manifest.versions(spark, roots.curation).map { v =>
      val m = spark.read.parquet(
        s"${Manifest.resolvedDataDir(spark, roots.curation, v)}/meta")
        .select("ann_version", "inv_version").head()
      (m.getLong(0), m.getLong(1))
    }
    // empty batch 1 pins batch 0's index versions; batch 2 appends
    assert(metas(0) === metas(1))
    assert(metas(2)._1 > metas(1)._1 && metas(2)._2 > metas(1)._2)
    assert(Curate.readCorpus(spark, roots).count() === 3L)
  }
}
