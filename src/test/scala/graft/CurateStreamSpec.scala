package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Curate
import graft.streaming.CurateStream

/** Streaming incremental curation (#65a streaming twin): micro-batches
  * through the full composed pipeline must publish exactly what the
  * batch runBatch sequence publishes, and replays must be no-ops at
  * every layer (curation version, ledger, both indexes). */
class CurateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def corpusRows(roots: Curate.Roots) =
    Curate.readCorpus(spark, roots)
      .select("doc_id", "source").as[(Long, String)].collect().toSet

  test("streamed curation equals the batch runBatch sequence") {
    val tmp = Files.createTempDirectory("curate-stream").toString
    val docs = Tables.documents(spark, sfDir)
      .where(col("doc_id") < 60)
      .select(col("doc_id"), col("source"), col("text"))
    val emb = Tables.embeddings(spark, sfDir)
    // batch reference: two ordered batches
    val refRoots = Curate.tempRoots("curate-stream-ref")
    Curate.runBatch(spark, refRoots, docs.where(col("doc_id") < 30),
      emb, qualityFloor = 0.61, budgetPerSource = 200L)
    Curate.runBatch(spark, refRoots, docs.where(col("doc_id") >= 30),
      emb, qualityFloor = 0.61, budgetPerSource = 200L)
    // stream: same split as two files -> two micro-batches in order
    docs.where(col("doc_id") < 30)
      .coalesce(1).write.parquet(s"$tmp/in")
    docs.where(col("doc_id") >= 30)
      .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val roots = Curate.tempRoots("curate-stream-got")
    var committed = List.empty[(Long, Long)]
    val q = CurateStream.curateTo(roots,
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in"),
        emb, qualityFloor = 0.61, budgetPerSource = 200L,
        onBatch = (id, v) => committed ::= (id, v))
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)

    assert(committed.size === 2)
    assert(corpusRows(roots) === corpusRows(refRoots))
    // both probes equal across the streamed and batch-built artifacts
    val terms = Seq("spark", "window", "merge")
    val pS = graft.sources.InvertedIndex.probe(spark, roots.inv, terms, 10)
      .as[(Long, Double, Int)].collect().toSet
    val pB = graft.sources.InvertedIndex.probe(spark, refRoots.inv, terms, 10)
      .as[(Long, Double, Int)].collect().toSet
    assert(pS === pB)
  }

  test("a replayed micro-batch is a no-op at every layer") {
    val docs = Tables.documents(spark, sfDir)
      .where(col("doc_id") < 40)
      .select(col("doc_id"), col("source"), col("text"))
    val emb = Tables.embeddings(spark, sfDir)
    val roots = Curate.tempRoots("curate-replay")
    val v0 = CurateStream.batchOnce(roots, docs.where(col("doc_id") < 20),
      emb, batchId = 0L, qualityFloor = 0.61, budgetPerSource = 200L)
    assert(v0.nonEmpty)
    val v1 = CurateStream.batchOnce(roots, docs.where(col("doc_id") >= 20),
      emb, batchId = 1L, qualityFloor = 0.61, budgetPerSource = 200L)
    assert(v1.nonEmpty)
    val before = (corpusRows(roots),
      graft.sources.Manifest.currentVersion(spark, roots.curation),
      graft.sources.Manifest.currentVersion(spark, roots.ann),
      graft.sources.Manifest.currentVersion(spark, roots.inv))
    // replay both ids: nothing may move
    assert(CurateStream.batchOnce(roots, docs.where(col("doc_id") < 20),
      emb, batchId = 0L, qualityFloor = 0.61, budgetPerSource = 200L).isEmpty)
    assert(CurateStream.batchOnce(roots, docs.where(col("doc_id") >= 20),
      emb, batchId = 1L, qualityFloor = 0.61, budgetPerSource = 200L).isEmpty)
    val after = (corpusRows(roots),
      graft.sources.Manifest.currentVersion(spark, roots.curation),
      graft.sources.Manifest.currentVersion(spark, roots.ann),
      graft.sources.Manifest.currentVersion(spark, roots.inv))
    assert(after === before)
  }
}
