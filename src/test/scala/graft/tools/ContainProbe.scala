package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.functions.TextFunctions

/** Scratch timing probe for containmentPairs' stages (test scope). */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val base = docs.select(col("doc_id").as("id"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      array_distinct(
        split(TextFunctions.normalize(col("text")), " ")).as("tk"))
    val groups = t("groups-ckpt") {
      base.select("id", "fp").groupBy("fp")
        .agg(min("id").as("gid"), count(lit(1)).as("w"))
        .localCheckpoint()
    }
    val toks = base.select("id", "tk")
      .join(groups.select(col("gid").as("id"), col("w"))
              .hint("shuffle_hash"), "id")
      .select(col("id").as("doc"), col("w"), explode(col("tk")).as("tok"))
      .where(length(col("tok")) > 0)
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val vocab = toks.groupBy("tok").agg(sum(col("w")).as("df"))
      .crossJoin(broadcast(nDocs))
      .where(col("df") * 5 <= col("n_docs") * 1)
      .select(col("tok"), col("df"))
    val rare = t("rare-ckpt") {
      toks.select("doc", "tok").join(vocab, "tok").localCheckpoint()
    }
    val sizes = rare.groupBy("doc").agg(count(lit(1)).as("n_a"))
    val kw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("df"), col("tok"))
    val probes = rare.withColumn("rn", row_number().over(kw))
      .where(col("rn") <= 16).select("doc", "tok")
    t("probes-count")(probes.count())
    val candsRaw = probes.as("a")
      .join(rare.select(col("doc"), col("tok")).as("b").hint("merge"),
        col("a.tok") === col("b.tok") && col("a.doc") =!= col("b.doc"))
      .select(col("a.doc").as("ga"), col("b.doc").as("gb"))
      .distinct()
    t("cands-count")(println("cands=" + candsRaw.count()))
    val verified = candsRaw.hint("shuffle_hash")
      .join(rare.select(col("doc").as("ga"), col("tok")), "ga")
      .hint("shuffle_hash")
      .join(rare.select(col("doc").as("gb"), col("tok")), Seq("gb", "tok"))
      .groupBy("ga", "gb").agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("doc", "ga"), "ga")
      .where(col("shared") * 2 >= col("n_a") * 1)
    t("verified-count")(println("verified=" + verified.count()))
    t("e2e-fresh") { graft.operators.Dedup.containmentPairs(
      Tables.documents(spark, dir), "doc_id", "text").count() }
    Blocks.freeAll(spark)
    t("e2e-fresh2") { graft.operators.Dedup.containmentPairs(
      Tables.documents(spark, dir), "doc_id", "text").count() }
    spark.stop()
  }
}
