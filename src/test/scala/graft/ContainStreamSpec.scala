package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.ContainStream

class ContainStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming contamination gate equals the batch cross operator bit-for-bit") {
    val tmp = Files.createTempDirectory("contain-stream").toString
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // needles: a fully-quoted benchmark item, a half-unseen item
    // (stays uncontained), and an exact-duplicate needle pair
    val needles = Seq(
      (1L, "zeta omicron theta lambda"),
      (2L, "zeta omicron neverseen1 neverseen2 neverseen3"),
      (3L, "theta lambda kappa"), (4L, "theta lambda kappa"))
      .toDF("doc_id", "text")
    // corpus: two identical contaminated articles, one partial match,
    // filler keeping the df cap meaningful
    val corpusRows = Seq(
      (100L, t(0), "the article quotes zeta omicron theta lambda kappa verbatim"),
      (101L, t(2), "the article quotes zeta omicron theta lambda kappa verbatim"),
      (102L, t(4), "only theta here with much other unrelated text body")) ++
      (200L to 219L).map(i => (i, t(10), s"corpusfill$i padding$i noise$i the"))
    val corpus = corpusRows.toDF("doc_id", "ts", "text")
    corpus.write.parquet(s"$tmp/in")

    // needle table prepped once against the corpus-as-reference (the
    // same df source the batch operator derives internally), cached so
    // micro-batches don't replan the prep
    val tbl = ContainStream.needleTable(needles,
      corpus.select("doc_id", "text"), "doc_id", "text").cache()
    // needle 2 has in-vocab tokens (incl. df-0 unseen ones): it must
    // be REPRESENTED in the table yet emit nothing downstream
    assert(tbl.where(col("needle_id") === 2L).count() === 1)

    val stream = spark.readStream.schema(corpus.schema).parquet(s"$tmp/in")
    val q = ContainStream.contaminated(stream, tbl)
      .writeStream.format("memory").queryName("contam_t")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("contam_t")
      .select("needle_id", "doc_id", "containment")
      .as[(Long, Long, Double)].collect().toSet

    // batch twin on identical data: df comes from the same corpus
    val expected = Dedup.containmentPairsAcross(
        needles, corpus.select("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
    // the planted shape: both article copies contaminated by needle 1
    // and by the duplicate needles 3+4; the unseen-token needle never
    assert(got.contains((1L, 100L, 1.0)) && got.contains((1L, 101L, 1.0)))
    assert(got.contains((3L, 100L, 1.0)) && got.contains((4L, 101L, 1.0)))
    assert(!got.exists(_._1 == 2L))
    // exactly-once per (needle, doc): no multiplicity to dedupe
    val all = spark.table("contam_t").select("needle_id", "doc_id")
      .as[(Long, Long)].collect()
    assert(all.length === all.distinct.length)
  }
}
