package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EmbedStream

class EmbedStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming embedding near-dup flags planted dups, expires with the horizon") {
    val tmp = Files.createTempDirectory("embed-stream").toString
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val rnd = new scala.util.Random(5)
    val v = Array.fill(64)(rnd.nextGaussian().toFloat)
    val vNear = v.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val noise = (0 until 20).map(i =>
      (100L + i, t(2), Array.fill(64)(rnd.nextGaussian().toFloat)))
    val vecs = (Seq(
      (1L, t(0), v),
      (2L, t(5), vNear),        // near-dup of 1 (cos ≈ 1)
      (3L, t(10), v.map(-_)),   // antipode: cos = -1, never a dup
      (4L, t(15), v)            // exact dup of 1
    ) ++ noise).toDF("vec_id", "ts", "vec")
    vecs.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(vecs.schema).parquet(s"$tmp/in")
    val q = EmbedStream.nearDupPairs(spark, stream, horizonMinutes = 60,
        tau = 0.95)
      .writeStream.format("memory").queryName("embdup_t")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("embdup_t")
      .select("id_a", "id_b", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // arrival-ordered pairs; multi-band emissions collapse in the Map.
    // 4 is an exact copy of 1, so it pairs ONLY with its keeper 1 —
    // (2,4) is recovered transitively by cluster resolution, not
    // emitted (exact-dup collapse; see EmbedStream's scaladoc)
    assert(out.keySet === Set((1L, 2L), (1L, 4L)), s"got $out")
    assert(out((1L, 4L)) === 1.0) // identical vectors
    assert(out.values.forall(_ >= 0.95))

    // horizon expiry: a far-future exact dup must not match doc 1,
    // whose bucket entries expired hours earlier
    val cp = s"$tmp/cp"
    def run(path: String): Unit = {
      val s2 = spark.readStream.schema(vecs.schema).parquet(s"$tmp/in2")
      val q2 = EmbedStream.nearDupPairs(spark, s2, horizonMinutes = 30,
          tau = 0.95)
        .writeStream.format("parquet").option("path", path)
        .option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination(120000)
    }
    Seq((1L, t(0), v), (9L, Timestamp.valueOf("2024-01-01 15:00:00"),
        Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "ts", "vec").write.parquet(s"$tmp/in2")
    run(s"$tmp/out2")
    Seq((4L, Timestamp.valueOf("2024-01-01 15:10:00"), v))
      .toDF("vec_id", "ts", "vec").write.mode("append").parquet(s"$tmp/in2")
    run(s"$tmp/out2")
    val pairs = spark.read.parquet(s"$tmp/out2")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.contains((1L, 4L)), s"expired entry still matched: $pairs")
  }

  test("stale keeper cannot absorb copies after its horizon passes") {
    // Same window as DocsStreamSpec's twin test: the copy arrives in
    // the same micro-batch where its keeper went past-horizon, so the
    // timeout path (keys without data) can't clean the bucket first —
    // the state function itself must expire before matching, or the
    // stale keeper absorbs the copy (no pair outside band 0, keeper
    // resurrected, group split).
    val tmp = Files.createTempDirectory("embed-stale").toString
    def t(s: String) = Timestamp.valueOf(s)
    val rnd = new scala.util.Random(11)
    val v = Array.fill(64)(rnd.nextGaussian().toFloat)
    def add(rows: (Long, Timestamp, Array[Float])*): Unit = {
      rows.toDF("vec_id", "ts", "vec")
        .write.mode("append").parquet(s"$tmp/in")
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    add((1L, t("2024-01-01 10:00:00"), v))
    add((9L, t("2024-01-01 15:00:00"),
         Array.fill(64)(rnd.nextGaussian().toFloat)))
    add((4L, t("2024-01-01 15:10:00"), v)) // copy; keeper 1 is stale
    add((5L, t("2024-01-01 15:20:00"), v)) // copy; keeper must be 4
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val q = EmbedStream.nearDupPairs(spark, stream, horizonMinutes = 30,
        tau = 0.95)
      .writeStream.format("memory").queryName("embdup_stale")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val pairs = spark.table("embdup_stale")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((4L, 5L)),
      s"stale keeper leaked into pairing: $pairs")
  }

  test("identical-vector flood emits one pair per copy, not quadratic") {
    // 200 copies of one vector inside the horizon: without the
    // exact-dup collapse this emits bands × F²/2 ≈ 160k rows and
    // holds 200 vector copies in every band's state; with it, output
    // is exactly F-1 rows (keeper, copy) and state holds ONE entry.
    val tmp = Files.createTempDirectory("embed-flood").toString
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val rnd = new scala.util.Random(7)
    val v = Array.fill(64)(rnd.nextGaussian().toFloat)
    (0 until 200).map(i => (i.toLong, t(i % 30), v))
      .toDF("vec_id", "ts", "vec").write.parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in").schema).parquet(s"$tmp/in")
    val q = EmbedStream.nearDupPairs(spark, stream, horizonMinutes = 60,
        tau = 0.95)
      .writeStream.format("memory").queryName("embdup_flood")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("embdup_flood")
      .select("id_a", "id_b", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // TOTAL rows (not distinct pairs) bounded: one per copy, all to
    // the first-seen keeper (id 0 — earliest ts, tie-broken by id)
    assert(rows.length === 199, s"flood not collapsed: ${rows.length} rows")
    assert(rows.map(_._1).forall(_ == 0L))
    assert(rows.map(_._2).toSet === (1L to 199L).toSet)
    assert(rows.map(_._3).forall(_ >= 0.999))
  }
}
