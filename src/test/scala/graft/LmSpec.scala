package graft

import org.apache.spark.sql.functions._
import graft.operators.Lm

/** Bigram-LM scoring: hand-checked novelty counts, the id-spine
  * guarantee, and the end-to-end property that reference-slice
  * documents get a lower mean NLL than out-of-domain ones. */
class LmSpec extends SparkSpec {
  import spark.implicits._

  test("novelty counts unseen bigrams and hit mass exactly (hand check)") {
    // ref doc: "a b a b" -> bigrams (a,b) x2, (b,a) x1
    val docs = Seq((1L, "a b a b", "en"), (2L, "a b c", "xx"), (3L, "z", "xx"))
      .toDF("doc_id", "text", "lang")
    val ref = Lm.fitBigrams(docs.where(col("lang") === "en"), "doc_id", "text")
    val out = Lm.novelty(docs, "doc_id", "text", ref)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => (k, (a, b, c)) }.toMap
    // doc1: 3 bigrams, all seen; hit mass = 2+1+2 = 5
    assert(out(1L) === ((3L, 0L, 5L)))
    // doc2: (a,b) seen (c12=2), (b,c) unseen
    assert(out(2L) === ((2L, 1L, 2L)))
    // doc3: single token -> zero bigrams, row kept
    assert(out(3L) === ((0L, 0L, 0L)))
  }

  test("meanNll: seen bigrams beat unseen, smoothing handles OOV contexts") {
    val docs = Seq((1L, "a b a b", "en"), (2L, "q r s", "xx"))
      .toDF("doc_id", "text", "lang")
    val en = docs.where(col("lang") === "en")
    val out = Lm.meanNll(docs, "doc_id", "text",
        Lm.fitBigrams(en, "doc_id", "text"))
      .as[(Long, Option[Double], Long)].collect()
      .map(r => (r._1, r._2)).toMap
    // V = 2 contexts (a, b). doc1 bigrams: (a,b) c12=2 c1=2 -> p=3/4;
    // (b,a) c12=1 c1=1 -> p=2/3. mean nll = -(2*ln(3/4)+ln(2/3))/3
    val expect1 = -(2 * math.log(3.0 / 4) + math.log(2.0 / 3)) / 3
    assert(math.abs(out(1L).get - expect1) < 1e-12)
    // doc2: all unseen contexts -> p = 1/2 each
    val expect2 = -math.log(1.0 / 2)
    assert(math.abs(out(2L).get - expect2) < 1e-12)
    assert(out(1L).get < out(2L).get)
  }

  test("end-to-end: en docs have lower mean NLL than non-en on average") {
    val docs = Tables.documents(spark, sfDir)
    val en = docs.where(col("lang") === "en")
    val scored = Lm.meanNll(docs, "doc_id", "text",
        Lm.fitBigrams(en, "doc_id", "text"))
      .join(docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
            "doc_id")
      .where(col("mean_nll").isNotNull)
    val means = scored.groupBy("is_en").agg(avg("mean_nll"))
      .as[(Boolean, Double)].collect().toMap
    assert(means(true) < means(false),
      s"en mean ${means(true)} must be below non-en ${means(false)}")
  }
}
