package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.DocsStream

class DocsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 8

  test("streaming near-dup detection flags planted dups, ignores distinct docs") {
    val tmp = Files.createTempDirectory("docs-stream").toString
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val docs = Seq(
      (1L, t(0), base),
      (2L, t(5), base.replace("lazy", "sleepy")), // near-dup of 1
      (3L, t(10), "completely different content about spark catalyst optimizer internals and shuffle exchanges"),
      (4L, t(15), base)                           // exact dup of 1
    ).toDF("doc_id", "ts", "text")
    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$tmp/in")
    // bands=16 (1 row per band) saturates candidate recall, as in
    // DedupSpec. tau=0.35: the planted near-dup's true jaccard is
    // ≈0.5 and the k=16 signature ESTIMATE has σ≈0.125 around it —
    // 0.35 keeps the planted pair safely in and the distinct doc
    // (est ≈ 0.07) safely out
    val q = DocsStream.nearDupPairs(spark, stream, horizonMinutes = 60,
        numHashes = 16, bands = 16, tau = 0.35)
      .writeStream.format("memory").queryName("neardup_t")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("neardup_t")
      .select("doc_a", "doc_b", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // pairs are arrival-ordered; multi-band emissions collapse in the
    // Map. 4 is an exact dup of 1, so it pairs ONLY with its keeper 1
    // — (2,4) is recovered transitively by cluster resolution, not
    // emitted (exact-signature collapse; see DocsStream's scaladoc)
    assert(out.keySet === Set((1L, 2L), (1L, 4L)))
    assert(out((1L, 4L)) === 1.0) // exact dup: every minhash position matches
    assert(out((1L, 2L)) >= 0.35)
  }

  test("identical-doc flood emits one pair per copy, not quadratic") {
    // 150 copies of one text inside the horizon: without the collapse
    // this emits bands × F²/2 ≈ 178k rows; with it, exactly F-1 rows
    // (keeper, copy) and ONE signature held per band bucket.
    val tmp = Files.createTempDirectory("docs-flood").toString
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val docs = (0 until 150).map(i => (i.toLong, t(i % 30), base))
      .toDF("doc_id", "ts", "text")
    docs.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$tmp/in")
    val q = DocsStream.nearDupPairs(spark, stream, horizonMinutes = 60,
        numHashes = 16, bands = 16, tau = 0.5)
      .writeStream.format("memory").queryName("neardup_flood")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("neardup_flood")
      .select("doc_a", "doc_b", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 149, s"flood not collapsed: ${rows.length} rows")
    assert(rows.map(_._1).forall(_ == 0L))
    assert(rows.map(_._2).toSet === (1L to 149L).toSet)
    assert(rows.map(_._3).forall(_ === 1.0))
  }

  test("stale keeper cannot absorb copies after its horizon passes") {
    // The window the EventTimeTimeout cleanup can NOT cover: a bucket
    // that RECEIVES data in the same micro-batch where its stored
    // entry went past-horizon never gets a timeout invocation (keys
    // with data aren't timed out), so the state function sees the
    // stale entry alongside the arrival. Matching before expiring
    // would emit a pair to the expired keeper, resurrect it via the
    // expiry refresh, and never install the copy as the new keeper —
    // splitting the group. maxFilesPerTrigger=1 forces one file per
    // micro-batch so the watermark advances BETWEEN the unrelated doc
    // and the copy's arrival.
    val tmp = Files.createTempDirectory("docs-stream-stale").toString
    def t(s: String) = Timestamp.valueOf(s)
    def add(rows: (Long, Timestamp, String)*): Unit = {
      rows.toDF("doc_id", "ts", "text")
        .write.mode("append").parquet(s"$tmp/in")
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    add((1L, t("2024-01-01 10:00:00"), base))
    add((9L, t("2024-01-01 15:00:00"), "totally unrelated filler text"))
    add((4L, t("2024-01-01 15:10:00"), base)) // copy; keeper 1 is stale
    add((5L, t("2024-01-01 15:20:00"), base)) // copy; keeper must be 4
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val q = DocsStream.nearDupPairs(spark, stream, horizonMinutes = 30,
        numHashes = 16, bands = 16, tau = 0.5)
      .writeStream.format("memory").queryName("neardup_stale")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val pairs = spark.table("neardup_stale")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((4L, 5L)),
      s"stale keeper leaked into pairing: $pairs")
  }

  test("bucket state expires with the watermark horizon") {
    val tmp = Files.createTempDirectory("docs-stream-exp").toString
    val cp = s"$tmp/cp"
    def t(s: String) = Timestamp.valueOf(s)
    val schema = Seq((1L, t("2024-01-01 10:00:00"), base))
      .toDF("doc_id", "ts", "text").schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
      val q = DocsStream.nearDupPairs(spark, stream, horizonMinutes = 30,
          numHashes = 16, bands = 16, tau = 0.5)
        .writeStream.format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    // batch 1: the original doc, plus a far-future distinct doc that
    // pushes the watermark hours past the original's horizon
    Seq((1L, t("2024-01-01 10:00:00"), base),
        (9L, t("2024-01-01 15:00:00"), "totally unrelated filler text"))
      .toDF("doc_id", "ts", "text").write.parquet(s"$tmp/in")
    run()
    // batch 2: an exact dup of doc 1 arriving within the NEW watermark
    // but far past doc 1's horizon — its bucket entry must be gone
    Seq((4L, t("2024-01-01 15:10:00"), base))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(s"$tmp/in")
    run()
    val pairs = spark.read.parquet(s"$tmp/out")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!pairs.contains((1L, 4L)), s"expired entry still matched: $pairs")
  }
}
