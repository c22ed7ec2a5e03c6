package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: run PlanLint over every registered query's initial
  * plan and print findings of the never-right-at-scale kinds. */
object LintSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bad = Set("cartesian_product", "nested_loop_join", "global_window",
                  "global_sort")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val fs = graft.plans.PlanLint.lint(fn(spark, sfDir))
          .filter(f => bad(f.kind))
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
