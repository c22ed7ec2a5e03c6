package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Dedup, MaterialDemand}

/** Operators must behave on degenerate inputs — empty frames, empty
  * strings — not just the happy path. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("material pipeline on empty input yields empty output") {
    val empty = Seq.empty[(java.sql.Date, Long, String, Double)]
      .toDF("date", "shop_id", "product_name", "demand")
    assert(MaterialDemand.productToMaterial(empty).count() === 0)
  }

  test("CDC merge with empty change set returns the target unchanged") {
    val target = Seq((1L, 10.0, "O")).toDF("order_key", "total_price", "status")
    val noChanges = Seq.empty[(Long, String, Double, String)]
      .toDF("order_key", "op", "total_price", "status")
    val out = Cdc.mergeApply(target, noChanges, "order_key")
      .as[(Long, Double, String)].collect().toSet
    assert(out === Set((1L, 10.0, "O")))
  }

  test("CDC upsert into an empty target inserts everything") {
    val empty = Seq.empty[(Long, Double, String)]
      .toDF("order_key", "total_price", "status")
    val updates = Seq((5L, 50.0, "N")).toDF("order_key", "total_price", "status")
    assert(Cdc.upsert(empty, updates, "order_key")
      .as[(Long, Double, String)].collect().toSet === Set((5L, 50.0, "N")))
  }

  test("query-based CDC checkpoint filter is exclusive of the checkpoint") {
    val ch = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-02 00:00:00"))
    ).toDF("id", "last_updated")
    val got = Cdc.changesSince(ch, "last_updated",
      Timestamp.valueOf("2024-01-01 00:00:00")).select("id").as[Long].collect()
    assert(got.toSeq === Seq(2L))
  }

  test("dedup ops tolerate empty and whitespace-only documents") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real content here")).toDF("doc_id", "text")
    assert(Dedup.exact(docs, "doc_id", "text").count() === 2) // "" and "   " normalize equal
    assert(Dedup.withSimhash(docs, "doc_id", "text").count() === 3)
    // minhash must not throw on degenerate shingle sets
    Dedup.minhashPairs(docs, "doc_id", "text").count()
  }

  test("cosine of zero vectors is NULL, not a job-killing ANSI error") {
    val df = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val c = df.as("a").crossJoin(df.as("b"))
      .select(Dedup.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(c.count(_.isEmpty) === 3)      // any pair touching the zero vector
    assert(c.flatten.contains(1.0))       // unit vector with itself
  }
}
