package graft

import org.apache.spark.sql.functions._
import graft.plans.{Bounds, PlanLint}

/** Bounds.declare: a no-op on inputs within the declaration, a LOUD
  * raise past it, and the structure PlanLint's boundedness classifier
  * reads. */
class BoundsSpec extends SparkSpec {
  import spark.implicits._

  test("declare is a value-level no-op when the bound holds") {
    val df = (1 to 10).toDF("x")
    val got = Bounds.declare(df, 10, "ten rows").as[Int].collect().sorted
    assert(got.toSeq === (1 to 10))
    // and under the bound too
    assert(Bounds.declare(df, 1000, "roomy").count() === 10)
  }

  test("declare holds when EliminateLimits elides the limit (multi-partition range)") {
    // r15 ADVICE repro: Range's maxRows is statically provable, so the
    // optimizer DELETES declare's limit(n+1) before physical planning;
    // without the coalesce(1) the id guard then saw partition-offset
    // ids (partition >= 1 starts at 2^33 > n) and raised on a HELD
    // declaration. The guard must be independent of the limit
    // surviving optimization.
    val df = spark.range(0, 40, 1, 4).toDF("x")
    assert(Bounds.declare(df, 64, "forty rows, four partitions")
      .count() === 40)
    // the optimized plan really has no GlobalLimit (the repro premise)
    val declared = Bounds.declare(df, 64, "forty rows, four partitions")
    assert(!declared.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("globallimit"),
      "premise: EliminateLimits removes the declared limit here")
  }

  test("declare raises loudly when the declaration lies") {
    val df = (1 to 50).toDF("x")
    val e = intercept[Exception] {
      Bounds.declare(df, 10, "a lying declaration").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("a lying declaration")),
      s"raise must name the declaration; got: ${msgs(e).mkString(" | ")}")
  }

  test("declare rejects bounds the classifier could not use") {
    intercept[IllegalArgumentException] {
      Bounds.declare((1 to 3).toDF("x"), PlanLint.BoundedRows.toInt + 1, "too big")
    }
    intercept[IllegalArgumentException] {
      Bounds.declare((1 to 3).toDF("x"), 0, "empty")
    }
  }

  test("lintFull honors a declared bound even after AQE erases it from the final plan") {
    // the source_overlap shape: a checkpointed small table (structure
    // gone), declared, theta-self-joined. AQE's stats-based
    // EliminateLimits drops the declare's GlobalLimit from the FINAL
    // plan once the stage materializes - the reconciled lint must
    // still classify the join bounded from the INITIAL plan.
    val per = Bounds.declare(
      Tables.supplier(spark, sfDir).where(col("s_suppkey") < 20)
        .select(col("s_suppkey").as("k"), col("s_name").as("nm"))
        .localCheckpoint(true),
      64, "small grid")
    val grid = per.as("a").join(per.as("b"),
      col("a.k") < col("b.k"))
    val kinds = PlanLint.lintFull(grid).map(_.kind).toSet
    assert(!kinds.contains("nested_loop_join"), s"got $kinds")
    assert(kinds.contains("nested_loop_join_bounded"))
  }

  test("a declared side makes a theta/cross join classify bounded") {
    // unprovable without the declaration: a filtered parquet scan
    val big = Tables.orders(spark, sfDir)
    val probe = Tables.supplier(spark, sfDir)
      .where(col("s_suppkey") < 5).select(col("s_suppkey"))
    val undeclared = big.crossJoin(broadcast(probe))
    assert(PlanLint.lint(undeclared).map(_.kind)
      .contains("nested_loop_join"))
    val declared = big.crossJoin(
      broadcast(Bounds.declare(probe, 5, "probe set")))
    val kinds = PlanLint.lint(declared).map(_.kind).toSet
    assert(kinds.contains("nested_loop_join_bounded") &&
           !kinds.contains("nested_loop_join"), s"got $kinds")
  }
}
