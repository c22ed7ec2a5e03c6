package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.operators.Dedup
import graft.functions.TextFunctions

/** 1000× probe tier (test scope — never ships): the five
  * scale-critical families run against a 1000× derived set
  * (`graft.ScaleN <sf0.1> /tmp/sf1000x 1000` — ~600M lineitem / 150M
  * orders / 100M events / 5M documents in 1000-DEEP exact-dup groups /
  * 2M embeddings) under the same 16 GiB executor-like heap as
  * Scale100. 100× was conquered (zero spill, zero exclusions); this
  * tier exists to find the next wall before a user does.
  *
  * The known-by-algebra wall this tier makes measurable: MEMBER-PAIR
  * EXPANSION. Collapse-first keeps all join work linear in the 5k
  * unique texts, but the member-pair OUTPUT of a d-deep dup group is
  * d(d-1)/2 rows — ~2.5B pairs at d=1000 (vs 27M at d=100: ×90 output
  * for ×10 data, exactly quadratic). The probe times it honestly, and
  * times the scale-correct ROUTING next to it: consume the
  * cluster/keeper table (pairs on uniques → CC on the group graph →
  * ONE member-map join, output linear at 5M rows) instead of
  * materialized member pairs.
  *
  * Usage: Test/runMain graft.tools.Scale1000 /tmp/sf1000x [outJson]
  */
object Scale1000 {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1000x")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new Scale100.StageMetrics
    spark.sparkContext.addSparkListener(metrics)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, dir).limit(1000).groupBy("l_returnflag").count().collect()

    val out = new StringBuilder
    val only = sys.env.get("SCALE1000_ONLY").map(_.split(",").toSet)
    def run(label: String)(body: => Long): Unit = {
      if (!only.forall(_.contains(label))) return
      Thread.sleep(1000); metrics.reset()
      val t0 = System.nanoTime()
      val n = try body
              catch { case t: Throwable =>
                System.err.println(s"SCALE FAIL $label: $t"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      Blocks.freeAll(spark)
      Thread.sleep(1000)
      val m = metrics.snapshot
      val line = f"""{"query":"$label","rows":$n,"sec":$sec%.2f,""" +
        m.map { case (k, v) => s""""$k":$v""" }.mkString("", ",", "}")
      println("SCALE1000 " + line)
      out.append(line).append('\n')
    }
    def runDf(label: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      run(label)(df.count())

    // ---- headline context: the flagship over 600M lineitem rows
    runDf("pipeline_material_demand")(
      SparkEntry.queries("pipeline_material_demand")(spark, dir))
    runDf("agg_groupby_sum")(SparkEntry.queries("agg_groupby_sum")(spark, dir))

    // ---- family 1: exact dedup — 5M docs → 5k fingerprint groups
    runDf("dedup_exact")(SparkEntry.queries("dedup_exact")(spark, dir))

    // ---- family 2: minhash pair generation
    // (a) the linear object: band join + verify over the 5k UNIQUES
    //     (what collapse-first reduces every corpus to)
    val keepers = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(TextFunctions.fingerprint(col("text")))
      Tables.documents(spark, dir)
        .withColumn("keeper", min(col("doc_id")).over(w))
        .where(col("doc_id") === col("keeper"))
        .select(col("doc_id"), col("text"))
    }
    runDf("minhash_pairs_uniques") {
      Dedup.minhashPairs(keepers.localCheckpoint(), "doc_id", "text")
    }
    // (b) the quadratic object, timed honestly: full member-pair
    //     expansion over 1000-deep groups (~2.5B output rows)
    runDf("minhash_pairs_full_expansion") {
      Dedup.minhashPairs(Tables.documents(spark, dir), "doc_id", "text")
    }

    // ---- family 3: cluster resolution, the scale-correct route —
    // CC (star) on the GROUP graph, then one member-map join: output
    // 5M keeper rows, never 2.5B pairs
    runDf("cc_star_group_graph_member_map") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(TextFunctions.fingerprint(col("text")))
      val mem = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .withColumn("gid", min(col("doc_id")).over(w))
        .select(col("doc_id"), col("gid"))
        .localCheckpoint()
      val uniq = mem.where(col("doc_id") === col("gid"))
        .join(Tables.documents(spark, dir), "doc_id")
        .select(col("doc_id"), col("text"))
      val groupPairs = Dedup.minhashPairs(uniq.localCheckpoint(),
        "doc_id", "text")
      val labels = Dedup.clustersStar(groupPairs, "doc_a", "doc_b")
        .withColumnRenamed("doc_id", "gid")
      // every member inherits its group keeper's cluster label; docs
      // whose group has no near-dup edge keep gid as the label
      mem.join(labels, Seq("gid"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_rep"), col("gid")).as("cluster_rep"))
    }

    // ---- family 4: persisted ANN index build + probe over 2M vectors
    run("ann_index_build_2m") {
      val root = java.nio.file.Files
        .createTempDirectory("graft-ann-1000x").toString + "/idx"
      spark.conf.set("spark.graft.scale1000.annRoot", root)
      graft.sources.AnnIndex.build(spark, Tables.embeddings(spark, dir),
        root, cells = 64, nFiles = 64)
    }
    runDf("ann_index_probe_2m") {
      val root = spark.conf.get("spark.graft.scale1000.annRoot")
      graft.sources.AnnIndex.probe(spark, root,
        Tables.embeddings(spark, dir).where(col("vec_id") < 10),
        k = 10, nprobe = 8)
    }

    // ---- family 5: persisted inverted index build + probe over 5M docs
    // nFiles sizes the clustered-write sort partitions (the build's one
    // essential exchange) — the corpusBytes/targetFileBytes rule from
    // the writeSegment doc; SCALE1000_INV_NFILES probes the knob
    val invNFiles = sys.env.get("SCALE1000_INV_NFILES").map(_.toInt)
      .getOrElse(64)
    run(s"inv_index_build_5m") {
      val root = java.nio.file.Files
        .createTempDirectory("graft-inv-1000x").toString + "/idx"
      spark.conf.set("spark.graft.scale1000.invRoot", root)
      graft.sources.InvertedIndex.build(spark, Tables.documents(spark, dir),
        root, nBuckets = 64, nFiles = invNFiles)
    }
    runDf("inv_index_probe_5m") {
      val root = spark.conf.get("spark.graft.scale1000.invRoot")
      graft.sources.InvertedIndex.probe(spark, root,
        Seq("spark", "window", "merge"), k = 10)
    }

    // ---- family 6: per-doc term statistics over 5M docs — the
    // queries converted off the explode+groupBy(doc_id, term) shape
    // after inv_index_build_5m exposed it (graft_term_counts rows).
    // Consume EVERY output column through a hash-sum: after the
    // conversion these are (mostly) per-row projections, and a bare
    // count() would let ColumnPruning erase the very computation being
    // measured (text_repetition "ran" in 1.06 s that way — the
    // optimizer had deleted the gram lambdas and term counting).
    def runHash(label: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      run(label) {
        val d = df
        // bit_xor, not sum: ANSI mode kills a long sum of 5M hashes
        d.select(xxhash64(d.columns.map(col): _*).as("h"))
          .agg(count(lit(1)).as("n"), expr("bit_xor(h)")).head().getLong(0)
      }
    runHash("tfidf_top_term_5m")(
      SparkEntry.queries("tfidf_top_term")(spark, dir))
    runHash("rare_token_stats_5m")(
      SparkEntry.queries("rare_token_stats")(spark, dir))
    runHash("text_repetition_5m")(
      SparkEntry.queries("text_repetition")(spark, dir))

    // ---- family 7: per-source quality percentile filter — exact
    // window form vs the documented 100 TB approx swap (SURVEY 31b/
    // 31b2), both on the native quality scan, at 5M docs
    runHash("quality_filter_5m")(
      SparkEntry.queries("quality_filter")(spark, dir))
    runHash("quality_filter_approx_5m")(
      SparkEntry.queries("quality_filter_approx")(spark, dir))

    // ---- family 8: winnowing fingerprints over 5M docs — per-row
    // native scan (graft_winnow), the r12 conversion off interpreted
    // gram-md5 HOFs
    runDf("winnow_fingerprint_5m")(
      SparkEntry.queries("winnow_fingerprint")(spark, dir))

    // ---- family 9: segment-level corpus dedup (global boilerplate
    // excision + per-doc reassembly) and the IVF-PQ ANN artifact at 2M
    // vectors (the 32x-smaller ADC code path, vs family 4's plain IVF)
    runHash("dedup_lines_5m")(
      SparkEntry.queries("dedup_lines")(spark, dir))
    runHash("strip_boilerplate_5m")(
      SparkEntry.queries("strip_boilerplate")(spark, dir))
    run("ann_pq_build_2m") {
      val root = java.nio.file.Files
        .createTempDirectory("graft-annpq-1000x").toString + "/idx"
      spark.conf.set("spark.graft.scale1000.annPqRoot", root)
      graft.sources.AnnIndex.build(spark, Tables.embeddings(spark, dir),
        root, cells = 64, nFiles = 64, pqSubspaces = 8)
    }
    runDf("ann_pq_probe_2m") {
      val root = spark.conf.get("spark.graft.scale1000.annPqRoot")
      graft.sources.AnnIndex.probePq(spark, root,
        Tables.embeddings(spark, dir).where(col("vec_id") < 10),
        k = 10, nprobe = 8)
    }

    args.lift(1).foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        out.toString)
    }
    println("SCALE1000 done")
    spark.stop()
  }
}
