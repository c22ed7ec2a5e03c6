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
    assert(!spark.catalog.tableExists("__graft_bloom_semi_dim"))
  }
}
