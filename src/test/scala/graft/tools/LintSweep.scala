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
    // LINTSWEEP_ONLY=a,b narrows re-runs while triaging findings
    val onlyQ = sys.env.get("LINTSWEEP_ONLY").map(_.split(",").toSet)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => onlyQ.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        // --executed reconciles BOTH plans (PlanLint.lintFull): the
        // INITIAL plan is authoritative for structural boundedness
        // (AQE's stats-based EliminateLimits erases declared bounds
        // from the final plan), the FINAL plan contributes what
        // runtime re-planning introduced (skew splits, strategy
        // conversions into kinds the initial plan never carried).
        val fs = (if (executed)
                    graft.plans.PlanLint.lintFull(fn(spark, sfDir))
                  else graft.plans.PlanLint.lint(fn(spark, sfDir)))
          .filter(f => interesting(f.kind))
        if (fs.nonEmpty)
          println(s"LINT $name: " +
            fs.map(f => s"${f.kind} [${f.detail}]").mkString(", "))
      } catch { case t: Throwable => println(s"LINT $name: ERROR $t") }
      graft.Blocks.freeAll(spark)
    }
    println("LINT sweep done")
    spark.stop()
  }
}
