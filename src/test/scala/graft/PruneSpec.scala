package graft

import org.apache.spark.sql.functions._
import graft.operators.Prune

/** Bloom-pruned semi join: exactness vs the plain semi join (bloom
  * false positives must all be removed by the exact join), empty-dim
  * behavior, and the plan shape that makes it a scan-stage prune. */
class PruneSpec extends SparkSpec {

  private def fact = Tables.lineitem(spark, sfDir)
  private def dim = Tables.orders(spark, sfDir)
    .where(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"))

  test("bloom semi join returns exactly the plain semi join's rows") {
    val bloomed = Prune.bloomSemiJoin(fact, "l_orderkey", dim, "o_orderkey",
                                      expectedKeys = 10000L)
      .select(col("l_orderkey"), col("l_linenumber"))
    val plain = fact.as("f").join(dim.as("d"),
        col("f.l_orderkey") === col("d.o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("bloom semi join with a tiny sketch still returns exact rows") {
    // 64 bits for ~300 keys ≈ every probe a false positive: the prune
    // passes nearly everything through and the exact join must do all
    // the work — correctness can't depend on the sketch's quality
    val bloomed = Prune.bloomSemiJoin(fact, "l_orderkey", dim, "o_orderkey",
                                      expectedKeys = 1L, fpp = 0.99)
      .agg(count(lit(1)), sum(col("l_extendedprice").cast("decimal(25,6)")))
    val plain = fact.as("f").join(dim.as("d"),
        col("f.l_orderkey") === col("d.o_orderkey"), "left_semi")
      .agg(count(lit(1)), sum(col("l_extendedprice").cast("decimal(25,6)")))
    assert(bloomed.head == plain.head)
  }

  test("empty dim prunes everything (no crash, zero rows)") {
    val none = dim.where(lit(false))
    val out = Prune.bloomSemiJoin(fact, "l_orderkey", none, "o_orderkey",
                                  expectedKeys = 100L)
    assert(out.isEmpty)
  }

  test("the prune is a scalar-subquery filter ahead of the join") {
    val p = Prune.bloomSemiJoin(fact, "l_orderkey", dim, "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"no bloom filter in plan\n$p")
    assert(p.contains("Subquery"), s"bloom not bound as scalar subquery\n$p")
    // the filter must sit below the join: the first might_contain
    // occurrence comes after the join node in top-down plan text
    val joinIdx = p.indexOf("Join")
    val bloomIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
           s"prune not below the join\n$p")
  }

  test("null fact keys are dropped, exactly like the plain semi join") {
    // might_contain(bloom, null) is null → the prune drops null-keyed
    // fact rows; an equi semi join never matches them either, so the
    // two must agree
    val withNulls = fact.withColumn("l_orderkey",
      when(col("l_linenumber") === 1, lit(null)).otherwise(col("l_orderkey")))
    val bloomed = Prune.bloomSemiJoin(withNulls, "l_orderkey", dim,
                                      "o_orderkey", expectedKeys = 10000L)
    val plain = withNulls.as("f").join(dim.as("d"),
        col("f.l_orderkey") === col("d.o_orderkey"), "left_semi")
    assert(bloomed.count() === plain.count())
    assert(bloomed.where(col("l_orderkey").isNull).isEmpty)
  }

  test("temp view does not leak from bloomSemiJoin") {
    Prune.bloomSemiJoin(fact, "l_orderkey", dim, "o_orderkey").count()
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("__graft_bloom_semi_dim")))
  }

  test("auto-size (expectedKeys=0 default) sizes from the dim count") {
    // no caller guess: the default self-sizes with one dim count —
    // results must still be exactly the plain semi join's
    val bloomed = Prune.bloomSemiJoin(fact, "l_orderkey", dim, "o_orderkey")
      .agg(count(lit(1)), sum(col("l_extendedprice").cast("decimal(25,6)")))
    val plain = fact.as("f").join(dim.as("d"),
        col("f.l_orderkey") === col("d.o_orderkey"), "left_semi")
      .agg(count(lit(1)), sum(col("l_extendedprice").cast("decimal(25,6)")))
    assert(bloomed.head == plain.head)
  }

  test("concurrent calls on one session bind each call's own dim") {
    // r5 defect: a fixed temp-view name let two threads interleave
    // create/drop and build a sketch from the WRONG dim — silently
    // missing rows. With per-call unique names both results must be
    // exact under concurrent construction.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dimA = dim
    val dimB = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "5-LOW").select(col("o_orderkey"))
    val runs = (1 to 4).map { i =>
      Future {
        val d = if (i % 2 == 0) dimA else dimB
        Prune.bloomSemiJoin(fact, "l_orderkey", d, "o_orderkey").count()
      }
    }
    val counts = Await.result(Future.sequence(runs), 120.seconds)
    val expectA = fact.as("f").join(dimA.as("d"),
      col("f.l_orderkey") === col("d.o_orderkey"), "left_semi").count()
    val expectB = fact.as("f").join(dimB.as("d"),
      col("f.l_orderkey") === col("d.o_orderkey"), "left_semi").count()
    counts.zipWithIndex.foreach { case (c, idx) =>
      val want = if ((idx + 1) % 2 == 0) expectA else expectB
      assert(c === want, s"concurrent call ${idx + 1} returned $c, want $want")
    }
  }

  test("a sketch the session conf would clamp is refused, not degraded") {
    // 10^9 keys at 3% needs ~7.3e9 bits >> default maxNumBits 64M:
    // Spark would silently clamp (real fpp →1, pruning stops helping).
    // The operator must refuse with an actionable message instead.
    val ex = intercept[IllegalArgumentException] {
      Prune.bloomSemiJoin(fact, "l_orderkey", dim, "o_orderkey",
                          expectedKeys = 1000000000L)
    }
    assert(ex.getMessage.contains("maxNumBits"))

    // the maxNumItems clamp band (r6 advice): 5M keys at 3% need
    // ~36.5M bits — inside maxNumBits=64M — but exceed the default
    // maxNumItems=4M, where BloomFilterAggregate would silently
    // mis-size its hash-function count. Must also refuse.
    val ex2 = intercept[IllegalArgumentException] {
      Prune.bloomSemiJoin(fact, "l_orderkey", dim, "o_orderkey",
                          expectedKeys = 5000000L)
    }
    assert(ex2.getMessage.contains("maxNumItems"))
  }

  test("wrong SQL arity gets a readable error, not IndexOutOfBounds") {
    graft.functions.GraftFunctions.register(spark)
    val ex = intercept[Throwable] {
      spark.sql("SELECT graft_might_contain(1)").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(!causes(ex).exists(_.isInstanceOf[IndexOutOfBoundsException]),
           s"arity error surfaced as IndexOutOfBounds: $ex")
    assert(causes(ex).exists(c => Option(c.getMessage)
             .exists(_.contains("expects 2 arguments"))),
           s"no readable arity message in: $ex")
  }
}
