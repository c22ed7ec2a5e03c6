package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.functions.TextFunctions

/** One-off decomposition probe for the dedup_substring 1000× row
  * (17.8k task-s in one stage, zero spill): times each sub-pipeline
  * of Corpus.exciseDupSubstrings in isolation to find the burner.
  * Usage: Test/runMain graft.tools.SubstrProbe /tmp/sf1000x
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1000x")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"PROBE $label%-28s rows=$n%12d sec=${(System.nanoTime() - t0) / 1e9}%8.2f")
    }
    val k = 20
    val docs = Tables.documents(spark, dir)
    val normed = docs.select(col("doc_id"),
      TextFunctions.normalize(col("text")).as("__t"))
    t("scan_count")(docs.count())
    t("normalize_scan")(normed.select(sum(length(col("__t")))).head().getLong(0))
    t("md5_scan")(normed.select(md5(col("__t"))).where(col("`md5(__t)`").isNotNull).count())
    val texts = normed
      .groupBy(md5(col("__t")).as("__fp"), col("__t"))
      .agg(count(lit(1)).as("__w"))
      .repartition(32)
    t("collapse")(texts.count())
    val textsC = texts.localCheckpoint()
    val withG = textsC.where(length(col("__t")) >= k)
      .select(col("__fp"), col("__w"), expr(
        s"transform(sequence(1, length(__t) - ${k - 1}), " +
        s"i -> md5(substring(__t, i, $k)))").as("__gs"))
    t("grams_per_unique")(withG.select(explode(col("__gs"))).count())
    val dup = withG
      .select(col("__w"), explode(array_distinct(col("__gs"))).as("__g"))
      .groupBy(col("__g")).agg(sum(col("__w")).as("__c"))
      .where(col("__c") >= 2).select(col("__g"))
    t("dup_gram_table")(dup.count())
    val pos = withG.select(col("__fp"), posexplode(col("__gs")))
      .toDF("__fp", "__i0", "__g")
    val dupStarts = pos.join(dup, "__g")
      .groupBy(col("__fp"))
      .agg(sort_array(collect_list(col("__i0") + 1)).as("__ds"))
    t("dup_starts")(dupStarts.count())
    t("full_query") {
      val out = graft.operators.Corpus.exciseDupSubstrings(docs, "doc_id", "text", k)
      out.select(xxhash64(out.columns.map(col): _*).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head().getLong(0)
    }
    spark.stop()
  }
}
