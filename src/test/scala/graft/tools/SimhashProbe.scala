package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Production-SimHash recall probe (test scope — tooling, not engine
  * code). `dedup_simhash_sound` proves the chunk-join machinery on
  * planted arithmetic signatures; what it cannot measure is the
  * SIGNATURE's sensitivity on real text — how often a small edit to a
  * real document keeps hamming(SimHash64) within the maxHamming=3
  * cut. This probe measures exactly that, the way RecallProbe does
  * for IVF: for each document, plant a near-dup copy with j tokens
  * replaced (j = 1, 2, 4, 8, 16 at evenly spaced positions —
  * SimHash is a bag-of-tokens signature, so WHICH tokens change
  * matters, not where), run the full production simhashPairs over
  * originals ∪ copies, and report the fraction of planted
  * (original, copy) pairs recovered. The pigeonhole bucketing is
  * complete at hamming <= 3, so any loss measured here is signature
  * sensitivity, not candidate-generation loss.
  *
  * Run: java -cp test-classes:classes:spark-jars graft.tools.SimhashProbe [sfDir]
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // distinct-text originals with enough tokens that a 16-token edit
    // is still a NEAR-dup, not a rewrite
    val docs = Tables.documents(spark, dir)
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .where(size(split(col("text"), "\\s+")) >= 32)
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val offset = 1L << 40 // copy ids far above any real doc_id

    for (j <- Seq(1, 2, 4, 8, 16)) {
      // replace j tokens at evenly spaced positions with junk tokens
      // unique per (copy, position) so no replacement collides with a
      // real token elsewhere in the doc
      val copies = docs.select(
        (col("doc_id") + offset).as("doc_id"),
        array_join(expr(
          s"""transform(split(text, '\\\\s+'), (t, i) ->
             |  IF(i % CAST(ceil(size(split(text, '\\\\s+')) / $j.0D) AS INT) = 0
             |     AND i < size(split(text, '\\\\s+'))
             |     AND CAST(i / ceil(size(split(text, '\\\\s+')) / $j.0D) AS INT) < $j,
             |     concat('zqzq', i), t))""".stripMargin), " ").as("text"))
      val corpus = docs.union(copies)
      val found = Dedup.simhashPairs(corpus, "doc_id", "text")
        .where(col("doc_b") - col("doc_a") === offset)
        .count()
      println(f"SIMHASH_RECALL $dir edits=$j%2d recall=${found.toDouble / nDocs}%.3f ($found/$nDocs)")
      // simhashPairs localCheckpoints its member table — clearCache()
      // alone would leave those blocks resident across iterations
      graft.Blocks.freeAll(spark)
    }
    spark.stop()
  }
}
