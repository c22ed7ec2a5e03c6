package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Queries}

/** One-off result+timing check for individual queries at a given dir. */
object QuickProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val df = n match {
        case "bpe_sound_agg" =>
          Queries.all("bpe_encode_sound")(spark, dir)
            .agg(sum(length(col("pieces"))).as("total_piece_chars"))
        case "nfc_agg" =>
          Queries.all("nfc_normalize_sound")(spark, dir)
            .agg(sum(col("n_composed")).as("tc"), sum(length(col("norm_text"))).as("tl"))
        case "grep_scan_baseline" =>
          // the full-scan contains() form the trigram index competes
          // with (4-pattern sweep, one pass)
          graft.Tables.documents(spark, dir)
            .select(col("doc_id"), col("text"))
            .select(col("doc_id"), explode(array(
              Seq(("0", "merge part window"), ("1", "batch batch batch"),
                  ("2", "customer line"), ("3", "zzzz never present")).map {
                case (pid, p) => when(col("text").contains(p), lit(pid))
              }: _*)).as("pid"))
            .where(col("pid").isNotNull)
            .groupBy(col("pid")).agg(count(lit(1)).as("n"))
        case "inv_gen_only" =>
          // r19 inv-append decomposition: the posting-stream GENERATION
          // (normalize + split + termCounts + posexplode) over the tier
          // batch-0 slice, consumed by a fold — no shuffle, no write.
          // Compares against the full append stage to apportion
          // generation vs layout+write cost.
          val b = spark.read.parquet(s"$dir/__docs_curate_salted")
          val cut = b.agg(expr("percentile_approx(doc_id, 0.3333, 100000)"))
            .head.getLong(0)
          b.where(col("doc_id") <= cut)
            .select(col("doc_id"),
              split(graft.functions.TextFunctions.normalize(col("text")),
                " ").as("toks"))
            .select(col("doc_id"), size(col("toks")).as("dl"),
              posexplode(graft.functions.GraftFunctions.termCounts(col("toks"))))
            .select(col("doc_id"), col("dl"),
              col("col.term").as("term"), col("col.tf").as("tf"))
            .agg(count(lit(1)).as("n"),
              sum(xxhash64(col("term")).cast("decimal(38,0)")).as("h"))
        case other => Queries.all(other)(spark, dir)
      }
      val t0 = System.nanoTime()
      val rows = df.collect()
      println(f"QUICK $n: ${(System.nanoTime() - t0) / 1e9}%.2f s -> " +
        rows.take(5).mkString("; "))
    }
    spark.stop()
  }
}
