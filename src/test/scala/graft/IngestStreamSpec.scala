package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import graft.streaming.IngestStream

class IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: Seq[String] = {
    val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    chars ++ chars.map("##" + _) ++ Seq("the", "##ing", "ing")
  }

  test("streaming ingest prep is bit-equal to the batch expressions") {
    val tmp = Files.createTempDirectory("ingest-stream").toString
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "source")
    docs.write.parquet(s"$tmp/in")

    val stream = spark.readStream.schema(docs.schema).parquet(s"$tmp/in")
    val q = IngestStream.prepare(stream, "doc_id", "text", "source", vocab)
      .writeStream.format("memory").queryName("ingest_t")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("ingest_t")
      .select("doc_id", "quality", "tokens", "n_unk")
      .as[(Long, Double, Seq[String], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val expect = IngestStream.prepare(docs, "doc_id", "text", "source", vocab)
      .select("doc_id", "quality", "tokens", "n_unk")
      .as[(Long, Double, Seq[String], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === expect.keySet)
    // bit-equal: same quality doubles, same token sequences
    for ((k, v) <- expect) assert(got(k) === v, s"doc $k")
    assert(got.nonEmpty) // the gate semantics are covered below
  }

  test("UNK-fraction gate drops garbage documents") {
    val docs = Seq((1L, "the ing thing", "s"),
                   (2L, "üéñ üé ü", "s"))
      .toDF("doc_id", "text", "source")
    val out = IngestStream.prepare(docs, "doc_id", "text", "source", vocab,
                                   minQuality = 0.0, maxUnkFrac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L)) // doc 2: every word [UNK] -> dropped
  }
}
