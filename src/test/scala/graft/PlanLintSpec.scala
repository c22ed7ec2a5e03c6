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

  test("lintExecuted sees a runtime SMJ->BHJ conversion lint() cannot") {
    // static broadcasts off, adaptive broadcasts on: the INITIAL plan
    // must sort-merge, and AQE converts to broadcast-hash at runtime
    // once the built side's actual bytes come in under the adaptive
    // threshold — the conversion only exists in the final plan
    val conf = spark.conf
    val staticBefore = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val adaptiveBefore =
      conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
      val joined = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderstatus")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      def bc(fs: Seq[PlanLint.Finding]): Int =
        fs.find(_.kind == "broadcast_count").get.detail.toInt
      val initial = bc(PlanLint.lint(joined))
      assert(initial === 0,
        s"initial plan already broadcasts ($initial) - test setup broken")
      val executed = bc(PlanLint.lintExecuted(joined))
      assert(executed > 0,
        "AQE SMJ->BHJ conversion invisible to the executed-plan lint")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", staticBefore)
      adaptiveBefore match {
        case Some(v) =>
          conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("skewFindings lifts hot keys from Skew.report into findings") {
    // 1000 rows on one key + 10 singletons: max/mean >> 4
    val hot = (1 to 1000).map(_ => "hot") ++ (1 to 10).map(i => s"k$i")
    val df = hot.toDF("k")
    val fs = PlanLint.skewFindings(df, "k")
    assert(fs.nonEmpty && fs.head.kind === "skewed_key")
    assert(fs.head.detail.contains("k=hot"))
    // uniform data stays quiet
    assert(PlanLint.skewFindings(
      (1 to 100).map(i => s"u$i").toDF("k"), "k").isEmpty)
  }
}
