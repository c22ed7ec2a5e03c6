package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.operators.{Curate, Similarity}

/** r17 (verdict item 8): decompose `curate_incremental`'s constant
  * term. The bench's most expensive row (13.8 s quiet) has had its
  * wobble attributed to "per-batch commit/AQE/checkpoint constants"
  * for three rounds without a measurement; this probe replays the
  * registered query's exact composition at the bench SF with (a) a
  * wall timer around each top-level step and (b)
  * `spark.graft.curate.profile=true`, which makes [[Curate.runBatch]]
  * print per-stage seconds between its own materialization barriers.
  * Output: TOTAL per step + CURATE_PROF stage lines → the
  * BENCHNOTES_r17 attribution table.
  *
  * Usage: Test/runMain graft.tools.CurateProbe /root/testdata/sf0.1
  */
object CurateProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.curate.profile", "true")
    // bench-identical warmup surface: one small query
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, dir).limit(1000)
      .groupBy("l_returnflag").count().collect()

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"CURATE_STEP $label ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }

    val whole0 = System.nanoTime()
    val docs = Tables.documents(spark, dir).where(col("doc_id") < 600)
    val emb = Tables.embeddings(spark, dir)
    val baseId = expr("CASE WHEN doc_id >= 300 THEN doc_id % 300 " +
      "WHEN doc_id % 11 = 7 THEN doc_id - 1 ELSE doc_id END")
    val derived = t("derive-ckpt") {
      docs.select(col("doc_id"), col("source"), baseId.as("base_id"))
        .join(docs.select(col("doc_id").as("base_id"), col("text")), "base_id")
        .select(col("doc_id"), col("source"), col("text"))
        .localCheckpoint()
    }
    val roots = Curate.tempRoots("graft-curate-probe")
    Seq((0L, 200L), (200L, 400L), (400L, 600L)).foreach { case (lo, hi) =>
      t(s"runBatch-$lo-$hi") {
        Curate.runBatch(spark, roots,
          derived.where(col("doc_id") >= lo && col("doc_id") < hi),
          emb, qualityFloor = 0.615, budgetPerSource = 550L)
      }
    }
    val corpus = t("readCorpus-ckpt") {
      Curate.readCorpus(spark, roots).localCheckpoint()
    }
    val finalVecs = t("finalVecs-ckpt") {
      emb.join(corpus.select(col("doc_id").as("vec_id")), "vec_id")
        .select(col("vec_id"), col("embedding")).localCheckpoint()
    }
    val queries = t("queries-ckpt") {
      finalVecs.orderBy(col("vec_id")).limit(5).localCheckpoint()
    }
    val annOk = t("ann-verify") {
      val probed = graft.sources.AnnIndex
        .probe(spark, roots.ann, queries, k = 5, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rk"))
      val bf = Similarity.bruteForceTopK(queries, finalVecs, 5)
        .select(col("query_id"), col("neighbor_id"), col("rk"))
      probed.except(bf).isEmpty && bf.except(probed).isEmpty
    }
    val bm25Ok = t("bm25-rebuild-verify") {
      val rebuildRoot = Curate.tempRoots("graft-curate-probe-rb").inv
      val finalDocs = derived
        .join(corpus.select(col("doc_id")), "doc_id")
        .select(col("doc_id"), col("text"))
      graft.sources.InvertedIndex.build(spark, finalDocs, rebuildRoot,
        nBuckets = 4, nFiles = 4)
      val terms = Seq("spark", "window", "merge")
      val pA = graft.sources.InvertedIndex.probe(spark, roots.inv, terms, 10)
      val pR = graft.sources.InvertedIndex.probe(spark, rebuildRoot, terms, 10)
      pA.except(pR).isEmpty && pR.except(pA).isEmpty
    }
    val n = t("final-count") {
      corpus.select(col("doc_id"), col("source"), col("quality"))
        .withColumn("ann_probe_ok", lit(annOk))
        .withColumn("bm25_probe_ok", lit(bm25Ok))
        .count()
    }
    println(f"CURATE_STEP TOTAL ${(System.nanoTime() - whole0) / 1e9}%.3f rows=$n")
    Blocks.freeAll(spark)
    spark.stop()
  }
}
