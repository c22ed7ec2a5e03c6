package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventsStream
import graft.operators.Temporal

class EwmaStreamSpec extends SparkSpec {

  test("streaming EWMA equals the batch dyadic EWMA bit-for-bit, out-of-order input") {
    streamBatchParity(alphaNum = 1, alphaLog2Den = 1)
  }

  test("streaming EWMA bit-parity holds at tuned dyadic alpha = 3/8") {
    streamBatchParity(alphaNum = 3, alphaLog2Den = 3)
  }

  private def streamBatchParity(alphaNum: Int, alphaLog2Den: Int): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("ewma-stream").toString
    val terms = 4

    // two users, 30 points each, unique ts per user, deterministic
    // values; written SHUFFLED so arrival order ≠ event-time order
    val base0 = java.time.Instant.parse("2025-01-01T00:00:00Z")
    val rows = for (u <- 1L to 2L; i <- 0L until 30L) yield
      (u * 1000 + i, base0.plusSeconds(i * 60), u,
       "obs", (i * 7 + u * 3) % 11 * 1.5)
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    df.orderBy(hash(col("event_id"))) // deterministic shuffle
      .write.parquet(s"$tmp/in")

    def run(): Unit = {
      val stream = EventsStream.fromParquetDir(spark, s"$tmp/in", df)
      val q = EventsStream.ewmaStream(spark, stream, terms, "30 minutes",
                                      alphaNum, alphaLog2Den)
        .writeStream.format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/cp")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    run()
    // sentinels 2h after each user's last event advance the watermark
    // past every real observation; their own points never finalize
    df.groupBy("user_id")
      .agg(max("ts").as("maxts"), max("event_id").as("maxid"))
      .select((col("maxid") + 1000000L).as("event_id"),
              (col("maxts") + expr("INTERVAL 2 HOURS")).as("ts"),
              col("user_id"), lit("sentinel").as("event_type"),
              lit(0.0).as("value"))
      .write.mode("append").parquet(s"$tmp/in")
    run()

    val streamed = spark.read.parquet(s"$tmp/out")
      .select("user_id", "ts", "ewma")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .toSet
    val batch = Temporal.ewma(df, Seq("user_id"), "ts", "value", terms,
                              alphaNum = alphaNum, alphaLog2Den = alphaLog2Den)
      .select(col("user_id"), col("ts"), col("ewma"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .toSet
    assert(batch.nonEmpty && batch.size === 2 * (30 - terms + 1))
    val missing = batch -- streamed
    val extra = streamed -- batch
    assert(streamed === batch,
      s"\nmissing(${missing.size}): ${missing.take(5)}\nextra(${extra.size}): ${extra.take(5)}")
  }
}
