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
    val metrics = new Scale100.StageMetrics
    spark.sparkContext.addSparkListener(metrics)
    def t(label: String)(body: => Long): Unit = {
      Thread.sleep(500); metrics.reset()
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val m = metrics.snapshot.map { case (k, v) => s"$k=$v" }.mkString(" ")
      println(f"PROBE $label%-28s rows=$n%12d sec=$sec%8.2f $m")
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
    // ---- r16 A/B: the zero-copy xxhash64 gram stage vs the md5 HOF
    // (the winnow 15.7x lesson ported — same gram walk, CharGramHashes
    // hashes straight off the base buffer instead of one
    // UTF8String.substring + MessageDigest per position). NOTE: no
    // freeAll before this point — withGx still reads textsC's blocks.
    val withGx = textsC.where(length(col("__t")) >= k)
      .select(col("__fp"), col("__w"),
        graft.functions.GraftFunctions.charGramHashes(col("__t"), k).as("__gs"))
    t("grams_per_unique_xx")(withGx.select(explode(col("__gs"))).count())
    // grams-stage A/B repeats (warm-cache B/B2 pairs so the one-shot
    // JIT/codegen constants don't decide a small-absolute row)
    t("grams_per_unique_md5_2")(withG.select(explode(col("__gs"))).count())
    t("grams_per_unique_xx_2")(withGx.select(explode(col("__gs"))).count())
    graft.Blocks.freeAll(spark)
    t("full_query_xx") {
      val out = graft.operators.Corpus.exciseDupSubstringsXx(docs, "doc_id", "text", k)
      out.select(xxhash64(out.columns.map(col): _*).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head().getLong(0)
    }
    graft.Blocks.freeAll(spark)
    // result-identity at 1000x: the two forms must excise the same
    // spans (hash-collision-free at this corpus size) - compare the
    // per-corpus fold of (doc_id, clean_text, n_removed)
    t("xx_equals_md5") {
      val a = graft.operators.Corpus.exciseDupSubstrings(docs, "doc_id", "text", k)
        .select(xxhash64(col("doc_id"), col("clean_text"), col("n_removed")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
      graft.Blocks.freeAll(spark)
      val b = graft.operators.Corpus.exciseDupSubstringsXx(docs, "doc_id", "text", k)
        .select(xxhash64(col("doc_id"), col("clean_text"), col("n_removed")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
      println(s"PROBE fold_md5=$a fold_xx=$b identical=${a == b}")
      if (a == b) 1L else 0L
    }
    spark.stop()
  }
}
