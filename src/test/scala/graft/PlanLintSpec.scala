package graft

import org.apache.spark.sql.functions._
import graft.plans.PlanLint

/** The plan linter must flag the patterns that die at 100 TB and stay
  * quiet on the shapes this engine's own operators use. */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def kinds(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanLint.lint(df).map(_.kind).toSet

  test("flags a cartesian product (and the broadcast-NL form of a small cross)") {
    val a = (1 to 10).toDF("x")
    val b = (1 to 10).toDF("y")
    // small cross joins plan as broadcast nested loop — also flagged
    assert((kinds(a.crossJoin(b)) intersect
      Set("cartesian_product", "nested_loop_join")).nonEmpty)
    // the true shuffle-replicate cartesian
    val cart = a.hint("shuffle_replicate_nl").crossJoin(b)
    assert(kinds(cart).contains("cartesian_product"))
  }

  test("flags a broadcast nested loop join (non-equi condition)") {
    val a = (1 to 100).toDF("x")
    val b = (1 to 100).toDF("y")
    val theta = a.join(broadcast(b), col("x") < col("y"))
    assert(kinds(theta).contains("nested_loop_join"))
  }

  test("flags a global window, accepts a partitioned one") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "g")
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy(col("id"))))
    assert(kinds(global).contains("global_window"))
    val partitioned = df.withColumn("rn",
      row_number().over(Window.partitionBy(col("g")).orderBy(col("id"))))
    assert(!kinds(partitioned).contains("global_window"))
  }

  test("counts shuffles; an aggregation costs exactly one exchange") {
    val df = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val counts = PlanLint.lint(df)
      .filter(_.kind == "shuffle_count").head.detail.toInt
    assert(counts === 1, s"expected 1 shuffle, linter saw $counts")
  }

  test("requireClean throws on dirty plans, passes clean ones") {
    val a = (1 to 5).toDF("x")
    val e = intercept[IllegalStateException](
      PlanLint.requireClean(a.crossJoin((1 to 5).toDF("y"))))
    assert(e.getMessage.contains("cartesian_product") ||
           e.getMessage.contains("nested_loop_join"))
    PlanLint.requireClean( // must not throw
      Tables.orders(spark, sfDir).groupBy("o_orderstatus").count())
  }

  test("the engine's own flagship passes the hard gate") {
    PlanLint.requireClean(
      Queries.all("pipeline_material_demand")(spark, sfDir))
    PlanLint.requireClean(Queries.all("curate_pipeline")(spark, sfDir))
  }
}
