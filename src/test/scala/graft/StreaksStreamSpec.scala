package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{EventsStream, StreaksStream}

/** Streaming streaks (#50c): the last emitted summary per user must
  * equal the batch gaps-and-islands operator over the same events —
  * closed-island compression plus open islands covers the whole
  * history, so no sentinel flush is needed. */
class StreaksStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream summaries converge to the batch dailyStreaks result") {
    val tmp = Files.createTempDirectory("stream-streaks").toString
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"))
    base.write.parquet(s"$tmp/in")

    val stream = EventsStream.fromParquetDir(spark, s"$tmp/in", base)
    val q = StreaksStream.summaries(spark, stream).writeStream
      .format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/cp")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)

    val streamed = spark.read.parquet(s"$tmp/out")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("seq").desc)))
      .where(col("rk") === 1)
      .select("user_id", "n_active_days", "n_streaks", "longest_streak",
              "streak_start", "streak_end")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDate(4).toLocalDate, r.getDate(5).toLocalDate))
      .toSet

    val batch = graft.operators.Sessionize
      .dailyStreaks(Tables.events(spark, sfDir), "user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDate(4).toLocalDate, r.getDate(5).toLocalDate))
      .toSet

    val missing = batch -- streamed
    val extra = streamed -- batch
    assert(streamed === batch,
      s"\nmissing(${missing.size}): ${missing.take(5)}" +
        s"\nextra(${extra.size}): ${extra.take(5)}")
  }

  test("out-of-order days merge islands instead of splitting them") {
    val tmp = Files.createTempDirectory("stream-streaks-ooo").toString
    def ev(id: Long, day: String) =
      (id, java.sql.Timestamp.valueOf(s"$day 10:00:00"), 1L, "e", 0.0)
    // batch 1 writes days 1 and 3; batch 2 bridges with day 2 —
    // the two open islands must MERGE into one 3-day streak. The
    // bridge arrives a day late, so the lateness tolerance must span
    // it (with the default 30-min watermark it would be DROPPED —
    // correct streaming semantics, wrong test)
    val schema = Seq(ev(1, "2024-01-01"), ev(2, "2024-01-03"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    schema.write.parquet(s"$tmp/in")
    def run(): Unit = {
      val stream = EventsStream.fromParquetDir(spark, s"$tmp/in", schema)
      val q = StreaksStream.summaries(spark, stream, "3 days").writeStream
        .format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/cp")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    Seq(ev(3, "2024-01-02"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$tmp/in")
    run()
    val last = spark.read.parquet(s"$tmp/out")
      .orderBy(col("seq").desc).limit(1)
      .select("n_active_days", "n_streaks", "longest_streak")
      .as[(Long, Long, Long)].head()
    assert(last === ((3L, 1L, 3L)))
  }

  test("batch/stream parity holds under a non-UTC session timezone") {
    // The batch twin buckets days via to_date(ts) — SESSION timezone —
    // so the stream must derive days in the same zone, not raw UTC
    // epoch-day division. UTC+10/+11 shifts many evening events across
    // a date boundary, so a UTC-day stream would diverge visibly here.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
    try {
      val tmp = Files.createTempDirectory("stream-streaks-tz").toString
      val base = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"),
                col("event_type"), col("value"))
      base.write.parquet(s"$tmp/in")
      val stream = EventsStream.fromParquetDir(spark, s"$tmp/in", base)
      val q = StreaksStream.summaries(spark, stream).writeStream
        .format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/cp")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
      val streamed = spark.read.parquet(s"$tmp/out")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("seq").desc)))
        .where(col("rk") === 1)
        .select("user_id", "n_active_days", "n_streaks", "longest_streak")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = graft.operators.Sessionize
        .dailyStreaks(Tables.events(spark, sfDir), "user_id", "ts")
        .select("user_id", "n_active_days", "n_streaks", "longest_streak")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      // and the zone genuinely matters: the UTC-day bucketing differs
      val utcBatch = graft.operators.Sessionize
        .dailyStreaks(
          Tables.events(spark, sfDir)
            .withColumn("ts", to_utc_timestamp(col("ts"), "Australia/Sydney")),
          "user_id", "ts")
        .select("user_id", "n_active_days", "n_streaks", "longest_streak")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(utcBatch !== batch,
        "test data never crosses a Sydney/UTC date boundary - pick a bigger offset")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
