package graft

import java.nio.file.Files
import graft.streaming.StreamMarkers

/** Durable replay-guard semantics (r13). The r12 rule — any
  * `batchId <= max(recorded)` is a replay — silently no-op'd a NEW
  * streaming query (fresh checkpoint, ids restarting at 0) against an
  * existing index root until its ids outran the old high-water mark:
  * dropped data, worse than the double-append the marker prevents. */
class StreamMarkersSpec extends SparkSpec {

  private val QueryIdKey = "sql.streaming.queryId"
  private def withQueryId[A](id: String)(body: => A): A = {
    spark.sparkContext.setLocalProperty(QueryIdKey, id)
    try body finally spark.sparkContext.setLocalProperty(QueryIdKey, null)
  }

  test("exact markers decide inside the kept tail; only pruned ids use the high-water rule") {
    val root = Files.createTempDirectory("markers-exact").toString + "/idx"
    StreamMarkers.record(spark, root, 5L)
    StreamMarkers.record(spark, root, 9L)
    assert(StreamMarkers.seen(spark, root, 5L))
    assert(StreamMarkers.seen(spark, root, 9L))
    // an id inside the kept window WITHOUT a marker was never
    // committed — the r12 high-water rule wrongly dropped it
    assert(!StreamMarkers.seen(spark, root, 7L))
    assert(!StreamMarkers.seen(spark, root, 10L))
    // below the oldest kept marker: only committed ids are ever
    // pruned, so the high-water fallback correctly says replay
    assert(StreamMarkers.seen(spark, root, 3L))
  }

  test("markers prune to the kept tail and stay exact across pruning") {
    val root = Files.createTempDirectory("markers-prune").toString + "/idx"
    for (i <- 0L to 20L) StreamMarkers.record(spark, root, i)
    assert(StreamMarkers.lastBatch(spark, root) === Some(20L))
    assert(StreamMarkers.seen(spark, root, 20L))
    assert(StreamMarkers.seen(spark, root, 2L))  // pruned → high-water
    assert(!StreamMarkers.seen(spark, root, 21L))
  }

  test("a different streaming query against an owned root fails loudly") {
    val root = Files.createTempDirectory("markers-qid").toString + "/idx"
    withQueryId("query-aaaa") {
      StreamMarkers.record(spark, root, 0L)
      StreamMarkers.record(spark, root, 1L)
      assert(StreamMarkers.seen(spark, root, 0L)) // same query: fine
    }
    // a FRESH checkpoint restarts ids at 0 — r12 silently dropped its
    // batches as "replays"; now the identity mismatch throws
    val e = intercept[IllegalStateException] {
      withQueryId("query-bbbb")(StreamMarkers.seen(spark, root, 0L))
    }
    assert(e.getMessage.contains("different checkpoint"))
    // batch callers carry no query id and skip the identity check
    assert(StreamMarkers.seen(spark, root, 0L))
  }
}
