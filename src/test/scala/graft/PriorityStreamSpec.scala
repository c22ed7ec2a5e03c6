package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.PriorityStream
import graft.streaming.PriorityStream.Doc

/** Streaming priority sampling: after any prefix of the stream the
  * kept set and HT weights must equal the batch operator over the
  * rows seen — arrival order and batching must not matter. */
class PriorityStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docsFor(ids: Seq[Long]): Seq[Doc] =
    ids.map(i => Doc(if (i % 2 == 0) "even" else "odd", i, (i % 5) + 1))

  test("stream state equals the batch sample after every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val emissions = scala.collection.mutable.Map[Long, Seq[Row]]()
    val q = PriorityStream.sample(input.toDS(), k = 5)
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        emissions(id) = df.collect().toSeq
      }.start()
    try {
      val all = docsFor(1L to 60L)
      // deliberately shuffled arrival, split into two batches
      val (b1, b2) = scala.util.Random.shuffle(all).splitAt(25)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()

      def asSet(rows: Seq[Row]) = rows.map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      def batchSet(docs: Seq[Doc]) = asSet(
        PriorityStream.sampleBatch(docs.toDS(), 5)
          .select("group", "id", "w", "est_w").collect().toSeq)

      // batch 0 parity over its prefix; batch 1 parity over everything
      assert(asSet(emissions(0)) === batchSet(b1))
      assert(asSet(emissions(1)) === batchSet(all))
    } finally q.stop()
  }

  test("re-arrival of the same row is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val emissions = scala.collection.mutable.Map[Long, Seq[Row]]()
    val q = PriorityStream.sample(input.toDS(), k = 3)
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        emissions(id) = df.collect().toSeq
      }.start()
    try {
      val docs = docsFor(1L to 10L)
      input.addData(docs); q.processAllAvailable()
      input.addData(docs); q.processAllAvailable() // exact replay
      assert(emissions(0).toSet === emissions(1).toSet)
    } finally q.stop()
  }
}
