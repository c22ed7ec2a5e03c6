package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Priority sampling (Duffield-Lund-Thorup): exact-k per group,
  * engine-portable determinism, the uniform-weight reduction, and the
  * weight-monotonicity property a weighted sampler must satisfy. */
class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd",
                       (i % 5) + 1L)).toDF("id", "grp", "w")

  test("keeps exactly k per group, whole group (est_w == w) when smaller") {
    val out = Sampling.prioritySample(docs(100), "grp", "id", "w", k = 10)
    val sizes = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(sizes === Map("even" -> 10L, "odd" -> 10L))
    // a group smaller than k survives whole, with no HT inflation
    val tiny = Sampling.prioritySample(docs(6), "grp", "id", "w", k = 10)
    assert(tiny.count() === 6)
    assert(tiny.where(col("est_w") =!= col("w").cast("double")).count() === 0)
  }

  test("kept set is a pure function of ids — stable under repartition") {
    val a = Sampling.prioritySample(docs(200), "grp", "id", "w", 15)
      .select("id").as[Long].collect().toSet
    val b = Sampling.prioritySample(docs(200).repartition(7), "grp", "id", "w", 15)
      .select("id").as[Long].collect().toSet
    assert(a === b)
  }

  test("uniform weights reduce to deterministic hash top-k (smallest buckets)") {
    val flat = docs(120).withColumn("w", lit(3L))
    val kept = Sampling.prioritySample(flat, "grp", "id", "w", 8)
      .select("grp", "id").as[(String, Long)].collect().toSet
    // with equal w, q = c/(b+1) ranks by bucket asc (ties by id)
    val expected = flat
      .withColumn("b", Sampling.bucket65536(col("id")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy(col("b"), col("id"))))
      .where(col("rk") <= 8)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(kept === expected)
  }

  test("raising a kept row's weight never evicts it") {
    val base = docs(150)
    val keptBefore = Sampling.prioritySample(base, "grp", "id", "w", 12)
      .select("id").as[Long].collect().toSet
    val target = keptBefore.head
    val boosted = base.withColumn("w",
      when(col("id") === target, col("w") * 7).otherwise(col("w")))
    val keptAfter = Sampling.prioritySample(boosted, "grp", "id", "w", 12)
      .select("id").as[Long].collect().toSet
    assert(keptAfter.contains(target))
  }

  test("est_w is max(w, tau) with tau the (k+1)-th priority") {
    val df = docs(60).where(col("grp") === "odd")
    val k = 5
    val pri = df
      .withColumn("q", col("w").cast("double") * lit(65537.0) /
        (Sampling.bucket65536(col("id")) + lit(1L)).cast("double"))
      .orderBy(col("q").desc, col("id"))
      .as[(Long, String, Long, Double)].collect()
    val tau = pri(k)._4
    val out = Sampling.prioritySample(df, "grp", "id", "w", k)
      .select("id", "est_w").as[(Long, Double)].collect().toMap
    assert(out.keySet === pri.take(k).map(_._1).toSet)
    for ((id, estW) <- out) {
      val w = pri.find(_._1 == id).get._3.toDouble
      assert(estW === math.max(w, tau))
    }
  }

  test("token-budget cap: per-source prefix in md5 order, budget inclusive") {
    val df = (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", 10L)).toDF("id", "src", "tok")
    val kept = Sampling.capTokensPerSource(df, "src", "id", "tok", budget = 55L)
      .collect().map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
    // 10-token docs, budget 55 -> exactly 5 fit per source (50 <= 55 < 60)
    assert(kept("a").length === 5 && kept("b").length === 5)
    // the kept set is the md5-order PREFIX: recompute expected directly
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val expA = (1 to 40).filter(_ % 2 == 0).map(_.toLong)
      .sortBy(id => (md5(id.toString), id)).take(5).toSet
    assert(kept("a").map(_._2).toSet === expA)
    // stability under repartition
    val again = Sampling.capTokensPerSource(
      df.repartition(7), "src", "id", "tok", budget = 55L)
      .collect().map(_.getLong(0)).toSet
    assert(again === kept.values.flatten.map(_._2).toSet)
    // a doc that would straddle the budget is dropped, not truncated
    val one = Seq((1L, "s", 60L), (2L, "s", 30L)).toDF("id", "src", "tok")
    val k1 = Sampling.capTokensPerSource(one, "src", "id", "tok", budget = 50L)
    assert(k1.count() <= 1) // 60-token doc can never fit
    intercept[IllegalArgumentException](
      Sampling.capTokensPerSource(one, "src", "id", "tok", budget = 0L))
  }

  test("stratified split: exact per-stratum counts at any stratum size") {
    // strata of size 10, 7, and 1 — exact floors, no binomial wobble
    val df = ((1 to 10).map(i => (i.toLong, "big")) ++
              (11 to 17).map(i => (i.toLong, "mid")) ++
              Seq((18L, "tiny"))).toDF("id", "src")
    val out = Sampling.stratifiedSplit(df, "src", "id", 80, 10)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val counts = out.groupBy(identity).view.mapValues(_.length).toMap
    // n=10: train 8, val 1, test 1
    assert(counts(("big", "train")) === 8)
    assert(counts(("big", "val")) === 1 && counts(("big", "test")) === 1)
    // n=7: floor(7*0.8)=5 train, floor(7*0.9)-5=1 val, 1 test
    assert(counts(("mid", "train")) === 5)
    assert(counts(("mid", "val")) === 1 && counts(("mid", "test")) === 1)
    // n=1: floors are 0 -> the lone row is test, never silently lost
    assert(counts(("tiny", "test")) === 1)
    assert(out.length === 18)
    // deterministic under repartition
    val again = Sampling.stratifiedSplit(df.repartition(5), "src", "id", 80, 10)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val first = Sampling.stratifiedSplit(df, "src", "id", 80, 10)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(again === first)
    intercept[IllegalArgumentException](
      Sampling.stratifiedSplit(df, "src", "id", 90, 20))
  }
}
