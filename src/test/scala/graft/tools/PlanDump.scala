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
    println(Queries.all(name)(spark, dir).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
