package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance weighting: hand-checked fit counts, planted-ratio
  * scoring, and the end-to-end property that target-slice documents
  * outscore the rest under the fitted ratios. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("fit counts hashed unigrams+bigrams exactly (hand check)") {
    val docs = Seq((1L, "a b", true), (2L, "a", false))
      .toDF("id", "text", "is_t")
    // grams: doc1 -> "a","b","a b"; doc2 -> "a"
    val out = Dsir.fit(docs, "text", col("is_t"))
      .as[(Int, Long, Long)].collect()
    assert(out.map(_._3).sum === 4L)     // 4 raw grams
    assert(out.map(_._2).sum === 3L)     // 3 from the target doc
    // the "a" bucket must carry one target and one raw-only occurrence
    val aBucket = out.find(r => r._3 - r._2 === 1L)
    assert(aBucket.isDefined)
  }

  test("score folds the planted ratio table exactly") {
    val docs = Seq((1L, "x y")).toDF("id", "text")
    val ratios = Array.fill(256)(0.0)
    // find the buckets the three grams of "x y" land in
    val buckets = docs.select(
      transform(Dsir.grams(col("text")), g => Dsir.bucket(g, 256)).as("bs"))
      .as[Seq[Int]].head()
    assert(buckets.length === 3)
    buckets.distinct.foreach(b => ratios(b) = 2.0)
    val score = Dsir.score(docs, "id", "text", ratios)
      .select("score").as[Double].head()
    assert(score === buckets.map(b => ratios(b)).sum)
  }

  test("end-to-end: target-slice docs outscore the rest on average") {
    val docs = Tables.documents(spark, sfDir)
    val flag = col("lang") === "en"
    val ratios = Dsir.logRatios(Dsir.fit(docs, "text", flag))
    val scored = Dsir.score(docs, "doc_id", "text", ratios)
      .join(docs.select(col("doc_id"), flag.as("is_en")), "doc_id")
    val means = scored.groupBy("is_en").agg(avg("score"))
      .as[(Boolean, Double)].collect().toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} must exceed non-en ${means(false)}")
  }

  test("selection is stable under repartition") {
    val docs = Tables.documents(spark, sfDir)
    val a = Dsir.select(docs, "doc_id", "text", col("lang") === "en", 50)
      .select("doc_id").as[Long].collect().toSeq
    val b = Dsir.select(docs.repartition(7), "doc_id", "text",
                        col("lang") === "en", 50)
      .select("doc_id").as[Long].collect().toSeq
    assert(a.toSet === b.toSet)
  }

  test("bucket draws 32 bits: >256 distinct buckets at 10k, bit-compatible at 256") {
    val grams = (0 until 20000).map(i => Tuple1(s"gram-$i")).toDF("g")
    // the paper's 10k buckets must actually materialize beyond 256 —
    // the old 2-hex window silently collapsed them
    val distinct10k = grams.select(Dsir.bucket(col("g"), 10000).as("b"))
      .distinct().count()
    assert(distinct10k > 256, s"only $distinct10k distinct buckets at 10k")
    // and mod 256 the widened window reproduces the historical 2-hex
    // formula exactly (256 = 16^2), so existing oracles are unmoved
    val mismatch = grams.select(
        Dsir.bucket(col("g"), 256).as("wide"),
        (conv(substring(md5(col("g")), 31, 2), 16, 10).cast("int") % 256).as("legacy"))
      .where(col("wide") =!= col("legacy")).count()
    assert(mismatch === 0L)
  }
}
