package graft.tools

import org.apache.spark.sql.SparkSession
import graft._

/** Scratch: dump a query's executed plan (test scope). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("dedup_containment")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val df = Queries.all(name)(spark, dir)
    if (args.contains("--bnlj")) {
      // debug: print maxRowsOf for each BNLJ side in the initial plan
      import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      root.foreach {
        case j: BroadcastNestedLoopJoinExec =>
          println(s"BNLJ build=${j.buildSide} " +
            s"left=${graft.plans.PlanLint.maxRowsOf(j.left)} " +
            s"right=${graft.plans.PlanLint.maxRowsOf(j.right)} " +
            s"leftNode=${j.left.nodeName} rightNode=${j.right.nodeName}")
        case _ => ()
      }
      spark.stop(); return
    }
    if (args.contains("--executed")) {
      // run it so AQE finalizes, then print the FINAL adaptive plan
      spark.sparkContext.runJob(df.queryExecution.toRdd,
        (_: Iterator[_]) => ())
      println(df.queryExecution.executedPlan.toString)
    } else println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
