package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft._
import graft.streaming._

/** Streaming-surface benchmark (test scope — never ships): drives
  * every streaming operator with a 100×-sized chronological
  * file-source feed and records what the parity specs cannot —
  * sustained rows/s, per-batch trigger wall, and state-store size
  * (rows + bytes) per operator. This is the r12 verdict's item 3:
  * the 12 streaming operators were parity-proven with zero measured
  * throughput numbers.
  *
  * Feed shape: each operator's input is pre-split into `SLICES`
  * chronologically-ordered parquet files (file mod times increase
  * with event time), and the stream reads with maxFilesPerTrigger=1 —
  * one micro-batch per slice, the arrival order a production
  * file-drop ingest actually sees. Event-time operators therefore
  * exercise real watermark advancement and state expiry, not a
  * single-batch degenerate run.
  *
  * Usage: Test/runMain graft.tools.StreamBench /tmp/sf100x [outJson]
  * `STREAMBENCH_ONLY=a,b` narrows re-runs (Scale100 convention).
  */
object StreamBench {

  private val SLICES = 8

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100x")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup

    val work = java.nio.file.Files
      .createTempDirectory("graft-streambench").toString
    val out = new StringBuilder
    val only = sys.env.get("STREAMBENCH_ONLY").map(_.split(",").toSet)

    /** Run one streaming query to completion; summarize recentProgress. */
    def bench(label: String)(start: String => StreamingQuery): Unit = {
      if (!only.forall(_.contains(label))) return
      System.gc(); Thread.sleep(500)
      val ckpt = s"$work/ckpt-$label"
      val t0 = System.nanoTime()
      // start() inside the try: an analysis error / bad seed build must
      // not abort the whole run and skip the remaining benchmarks. Any
      // caught failure lands in the emitted row as "err" so a partial
      // run can't masquerade as a clean one in STREAMBENCH.json.
      var q: StreamingQuery = null
      var err: Option[String] = None
      try { q = start(ckpt); q.awaitTermination(3600000) }
      catch { case t: Throwable =>
        // strip ALL control chars (tab, NUL, ... — Spark messages can
        // carry them), not just CR/LF: one unescaped control char makes
        // the emitted row invalid JSON
        err = Some(t.toString.replaceAll("[\\p{Cntrl}\"\\\\]", " ").take(300))
        System.err.println(s"STREAM FAIL $label: $t") }
      val wall = (System.nanoTime() - t0) / 1e9
      val ps = if (q == null) Array.empty[org.apache.spark.sql.streaming.StreamingQueryProgress]
               else q.recentProgress.filter(_.numInputRows > 0)
      val rows = ps.map(_.numInputRows).sum
      val trigMs = ps.map(_.durationMs.getOrDefault("triggerExecution", 0L)
        .longValue()).toSeq
      val stateRows = ps.flatMap(_.stateOperators.map(_.numRowsTotal))
      val stateBytes = ps.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      val rps = if (trigMs.sum > 0) rows * 1000.0 / trigMs.sum else 0.0
      val line = f"""{"query":"$label","rows_in":$rows,""" +
        f""""batches":${ps.length},"wall_sec":$wall%.2f,""" +
        f""""rows_per_sec":$rps%.0f,""" +
        f""""batch_ms_max":${if (trigMs.isEmpty) 0L else trigMs.max},""" +
        f""""batch_ms_mean":${if (trigMs.isEmpty) 0L else trigMs.sum / trigMs.length},""" +
        f""""state_rows_max":${if (stateRows.isEmpty) 0L else stateRows.max},""" +
        f""""state_bytes_max":${if (stateBytes.isEmpty) 0L else stateBytes.max}""" +
        err.map(e => s""","err":"$e"""").getOrElse("") + "}"
      println("STREAMBENCH " + line)
      out.append(line).append('\n')
      Blocks.freeAll(spark)
    }

    def noopRun(label: String, outputMode: String = "append")
               (build: DataFrame => DataFrame): Unit =
      bench(label) { ckpt =>
        build(null).writeStream.format("noop").outputMode(outputMode)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
      }

    // ---------------------------------------------------- feed prep
    // (untimed) — chronological slices, one file per slice

    def writeSlices(slices: Seq[DataFrame], path: String): Unit = {
      slices.zipWithIndex.foreach { case (s, i) =>
        s.coalesce(1).write
          .mode(if (i == 0) "overwrite" else "append").parquet(path)
      }
    }

    // events: real ts column — range-sliced on time
    val eventsFeedPath = s"$work/feed-events"
    val eventsCols = Seq("event_id", "ts", "user_id", "event_type", "value")
    lazy val eventsFeedReady: Unit = {
      val ev = Tables.events(spark, dir)
        .select(eventsCols.map(col): _*)
        .withColumn("tsd", col("ts").cast("double"))
        .localCheckpoint()
      val cuts = ev.stat.approxQuantile("tsd",
        (1 until SLICES).map(_.toDouble / SLICES).toArray, 0.001)
      val bounds = (Double.MinValue +: cuts :+ Double.MaxValue).toSeq
      writeSlices(
        (0 until SLICES).map(i =>
          ev.where(col("tsd") >= bounds(i) && col("tsd") < bounds(i + 1))
            .select(eventsCols.map(col): _*)),
        eventsFeedPath)
      Blocks.freeAll(spark)
    }
    def eventsFeed: DataFrame = {
      eventsFeedReady
      spark.readStream
        .schema(Tables.events(spark, dir).select(eventsCols.map(col): _*).schema)
        .option("maxFilesPerTrigger", 1).parquet(eventsFeedPath)
    }

    // documents: no ts in the table — slice by hash bucket, stamp each
    // slice with an advancing ts (batch i = base + 10i minutes) so
    // watermarks move between micro-batches
    val docsFeedPath = s"$work/feed-docs"
    lazy val docsFeedReady: Unit = {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text"),
          pmod(xxhash64(col("doc_id")), lit(SLICES)).as("b"))
        .localCheckpoint()
      writeSlices(
        (0 until SLICES).map(i =>
          docs.where(col("b") === i)
            .select(col("doc_id"), col("source"), col("text"),
              (to_timestamp(lit("2024-01-01 00:00:00")) +
                expr(s"INTERVAL ${10 * i} MINUTES")).as("ts"))),
        docsFeedPath)
      Blocks.freeAll(spark)
    }
    def docsFeed: DataFrame = {
      docsFeedReady
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, source STRING, text STRING, ts TIMESTAMP")
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(docsFeedPath)
    }

    // embeddings: same hash-slice + advancing-ts scheme
    val vecsFeedPath = s"$work/feed-vecs"
    lazy val vecsFeedReady: Unit = {
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"),
          pmod(xxhash64(col("vec_id")), lit(SLICES)).as("b"))
        .localCheckpoint()
      writeSlices(
        (0 until SLICES).map(i =>
          vecs.where(col("b") === i)
            .select(col("vec_id"), col("embedding"),
              (to_timestamp(lit("2024-01-01 00:00:00")) +
                expr(s"INTERVAL ${10 * i} MINUTES")).as("ts"))),
        vecsFeedPath)
      Blocks.freeAll(spark)
    }
    def vecsFeed: DataFrame = {
      vecsFeedReady
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id BIGINT, embedding ARRAY<FLOAT>, ts TIMESTAMP")
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(vecsFeedPath)
    }

    // ------------------------------------------- events-family (10M)
    noopRun("stream_hourly_counts")(_ => EventsStream.hourlyCounts(eventsFeed))
    noopRun("stream_sliding_counts")(_ => EventsStream.slidingCounts(eventsFeed))
    noopRun("stream_dedup")(_ => EventsStream.dedupStream(eventsFeed, "1 hour"))
    noopRun("stream_sessionize")(_ =>
      EventsStream.sessionize(spark, eventsFeed, gapMinutes = 30).toDF())
    noopRun("stream_compact_changes")(_ =>
      EventsStream.compactChanges(spark, eventsFeed).toDF())
    noopRun("stream_interval_join")(_ =>
      EventsStream.purchaseClickJoin(eventsFeed, windowMinutes = 30))
    noopRun("stream_ewma")(_ =>
      EventsStream.ewmaStream(spark, eventsFeed).toDF())
    noopRun("stream_streaks")(_ =>
      StreaksStream.summaries(spark,
        eventsFeed.select(col("user_id"), col("ts"))).toDF())

    // --------------------------------------------- docs-family (500k)
    noopRun("stream_docs_neardup")(_ =>
      DocsStream.nearDupPairs(spark, docsFeed.drop("source"),
        horizonMinutes = 25).toDF())
    // r15 (verdict item 8): the LONG-horizon regime. 360 event-minutes
    // exceeds the feed's whole span, so NOTHING expires — every doc's
    // signature stays resident and state_rows/bytes_max measure the
    // worst-case growth a 6-hour dedup horizon implies. The measured
    // bytes/doc feeds the batch-ledger crossover rule in the
    // DocsStream scaladoc.
    noopRun("stream_docs_neardup_6h")(_ =>
      DocsStream.nearDupPairs(spark, docsFeed.drop("source"),
        horizonMinutes = 360).toDF())
    lazy val needleTbl = ContainStream.needleTable(
      Tables.documents(spark, dir).where(col("doc_id") < 200)
        .select(col("doc_id"), col("text")),
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      "doc_id", "text").localCheckpoint()
    noopRun("stream_contain_gate")(_ =>
      ContainStream.contaminated(docsFeed.drop("source"), needleTbl))
    val vocab: Seq[String] = {
      val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
      chars ++ chars.map("##" + _) ++ Seq("the", "##ing", "ing")
    }
    noopRun("stream_ingest_prepare")(_ =>
      IngestStream.prepare(docsFeed, "doc_id", "text", "source", vocab))
    noopRun("stream_token_budget", outputMode = "update")(_ =>
      TokenBudgetStream.gate(
        docsFeed.select(col("source"), col("doc_id").as("id"),
            size(split(col("text"), " ")).cast("long").as("tokens"))
          .as[TokenBudgetStream.Doc],
        budget = 1000000L))
    noopRun("stream_priority_sample", outputMode = "update")(_ =>
      PriorityStream.sample(
        docsFeed.select(col("source").as("group"), col("doc_id").as("id"),
            size(split(col("text"), " ")).cast("long").as("w"))
          .as[PriorityStream.Doc],
        k = 100))

    // ---------------------------------------------- embeddings (200k)
    noopRun("stream_embed_neardup")(_ =>
      EmbedStream.nearDupPairs(spark,
        vecsFeed.withColumnRenamed("embedding", "vec"),
        horizonMinutes = 25).toDF())

    // ------------------------------- persisted-index ingestion streams
    // seed each index from the 1× base slice, then stream the 100×
    // corpus as appends — batch sizes ~62.5k docs / ~25k vectors
    bench("stream_inv_index_append") { ckpt =>
      val root = s"$work/inv-index"
      graft.sources.InvertedIndex.build(spark,
        Tables.documents(spark, dir).where(col("doc_id") < 5000),
        root, nBuckets = 16, nFiles = 16)
      InvertedIndexStream.appendTo(root,
          docsFeed.where(col("doc_id") >= 5000), nFiles = 16)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
    }
    bench("stream_ann_index_append") { ckpt =>
      val root = s"$work/ann-index"
      graft.sources.AnnIndex.build(spark,
        Tables.embeddings(spark, dir).where(col("vec_id") < 2000),
        root, cells = 16, nFiles = 16)
      AnnIndexStream.appendTo(root,
          vecsFeed.where(col("vec_id") >= 2000).drop("ts"),
          nFiles = 16, driftTolerance = 1.0)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
    }
    bench("stream_curate") { ckpt =>
      val roots = graft.operators.Curate.tempRoots("streambench-curate")
      CurateStream.curateTo(roots, docsFeed.drop("ts"),
          Tables.embeddings(spark, dir),
          qualityFloor = 0.61, budgetPerSource = 100000000L,
          annCells = 16, nFiles = 8)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
    }

    args.lift(1).foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        out.toString)
    }
    println("STREAMBENCH done")
    spark.stop()
  }
}
