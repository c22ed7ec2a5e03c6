package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: run PlanLint over every registered query and print
  * findings of the never-right-at-scale kinds.
  *
  * Two modes:
  *   - default: lint the INITIAL optimized plan (cheap, pre-flight);
  *   - `--executed`: lint the FINAL adaptive plan via
  *     [[graft.plans.PlanLint.lintExecuted]] — actually runs every
  *     query so AQE's runtime re-planning (SMJ→BHJ conversions, skew
  *     splits, partition coalescing) is what gets walked. Also
  *     surfaces `skew_join_split` (informational-positive: AQE fixed
  *     a skew at runtime — the join to look at before 100 TB).
  *
  * Usage: runMain graft.tools.LintSweep [sfDir] [--executed]
  */
object LintSweep {
  def main(args: Array[String]): Unit = {
    val executed = args.contains("--executed")
    val sfDir = args.filterNot(_.startsWith("--"))
      .headOption.getOrElse("/root/testdata/sf0.001")
    val cores = if (executed) 16 else 4
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bad = Set("cartesian_product", "nested_loop_join", "global_window",
                  "global_sort")
    val interesting = if (executed) bad + "skew_join_split" else bad
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val fs = (if (executed) graft.plans.PlanLint.lintExecuted(df)
                  else graft.plans.PlanLint.lint(df))
          .filter(f => interesting(f.kind))
        if (fs.nonEmpty)
          println(s"LINT $name: " +
            fs.map(f => f.kind).groupBy(identity)
              .map { case (k, v) => s"$k x${v.size}" }.mkString(", "))
      } catch { case t: Throwable => println(s"LINT $name: ERROR $t") }
      graft.Blocks.freeAll(spark)
    }
    println("LINT sweep done")
    spark.stop()
  }
}
