package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.TokenBudgetStream
import graft.streaming.TokenBudgetStream.Doc

/** Streaming token-budget gate: after any prefix of the stream the
  * kept set must equal the batch operator over the rows seen so far —
  * arrival order, micro-batch boundaries, and replay must not matter. */
class TokenBudgetStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Doc]], budget: Long)
      : Map[Long, Set[(String, Long, Long)]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val emissions = scala.collection.mutable.Map[Long, Set[(String, Long, Long)]]()
    val q = TokenBudgetStream.gate(input.toDS(), budget)
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        emissions(id) = df.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      }.start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    emissions.toMap
  }

  private def batchSet(docs: Seq[Doc], budget: Long): Set[(String, Long, Long)] =
    TokenBudgetStream.gateBatch(docs.toDS(), budget)
      .select("source", "id", "tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("stream equals batch after every micro-batch, shuffled arrival") {
    val docs = (1L to 40L).map(i =>
      Doc(if (i % 2 == 0) "a" else "b", i, (i % 7) + 3))
    val (b1, b2) = new scala.util.Random(7).shuffle(docs).splitAt(17)
    val em = run(Seq(b1, b2), budget = 40L)
    assert(em(0) === batchSet(b1, 40L))
    assert(em(1) === batchSet(docs, 40L))
  }

  test("a doc beyond the horizon stays dropped: the dropped doc's tokens still gate") {
    // construct positions IN md5 order so the middle doc overflows:
    // pos0 fits (4), pos1 overflows (8 -> cum 12 > 10) and becomes the
    // horizon, pos2 (5) must stay out even though kept-sum + 5 <= 10 —
    // the bug a kept-prefix-only state would have
    val ids = (1L to 3L).sortBy(TokenBudgetStream.md5key)
    val docs = Seq(Doc("s", ids(0), 4), Doc("s", ids(1), 8), Doc("s", ids(2), 5))
    // horizon doc arrives FIRST, then the late doc in a separate batch
    val em = run(Seq(Seq(docs(0), docs(1)), Seq(docs(2))), budget = 10L)
    assert(em(0) === Set(("s", ids(0), 4L)))
    assert(em(1) === Set(("s", ids(0), 4L))) // pos2 NOT admitted
    assert(em(1) === batchSet(docs, 10L))
  }

  test("replay is idempotent") {
    val docs = (1L to 12L).map(i => Doc("s", i, 5))
    val em = run(Seq(docs, docs), budget = 20L)
    assert(em(0) === em(1))
    assert(em(1) === batchSet(docs, 20L))
  }
}
