package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** BPE merge training (Sennrich et al. 2016) over the ##-continuation
  * alphabet, so the learned pieces feed `graft_wordpiece` directly.
  *
  * The Spark-first decomposition mirrors how production tokenizer
  * trainers actually run: the CORPUS-scale work is one explode →
  * partial-agg shuffle producing the distinct-word count dictionary
  * (vocabulary-bounded — millions of rows for a 100 TB corpus, not
  * billions), optionally truncated to the `maxWords` most frequent
  * (TakeOrdered heads); the merge LOOP then runs on the driver over
  * that weighted dictionary — corpus-size-independent, exactly where
  * HuggingFace/SentencePiece run it. Each iteration takes the
  * highest-count adjacent pair (ties: lexicographically smallest
  * (left, right) — deterministic across runs and platforms) and
  * rewrites the dictionary. The naive recount per iteration is
  * O(dict·len) — fine to tens of thousands of merges over a
  * million-word dictionary; the classic incremental pair-index
  * optimization drops it to O(affected words) and changes no
  * output.
  *
  * `bpe_train_sound` gates the loop itself: a planted corpus whose
  * full merge sequence is hand-derived (VALUES-literal oracle).
  */
object Bpe {

  /** (left, right, merged, pairCount) per merge, in rank order. */
  final case class Merge(left: String, right: String,
                         merged: String, count: Long)

  /** Word-count dictionary: the one corpus-scale step. */
  def wordCounts(docs: DataFrame, textCol: String,
                 maxWords: Int = 1000000): DataFrame =
    docs.select(explode(split(TextFunctions.normalize(col(textCol)), " "))
        .as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(maxWords)

  /** Driver-side merge loop over a (word, count) dictionary. */
  def train(dict: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1 && numMerges <= 65536,
            s"numMerges out of [1, 65536]: $numMerges")
    // symbol sequences in ## space: "low" -> [l, ##o, ##w]
    var words: Array[(Array[String], Long)] = dict.toArray.map {
      case (w, n) =>
        val syms = w.toCharArray.zipWithIndex.map { case (c, i) =>
          if (i == 0) c.toString else "##" + c
        }
        (syms, n)
    }
    val merges = Vector.newBuilder[Merge]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        counts.merge((syms(i), syms(i + 1)), n, _ + _)
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestN = 0L
        counts.forEach { (p, n) =>
          val better = n > bestN || (n == bestN && (best == null ||
            p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))
          if (better) { best = p; bestN = n }
        }
        val merged = best._1 + best._2.stripPrefix("##")
        merges += Merge(best._1, best._2, merged, bestN)
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) { out += merged; i += 2 }
              else { out += syms(i); i += 1 }
            }
            (out.toArray, n)
          }
        }
        k += 1
      }
    }
    merges.result()
  }

  /** End to end: dictionary from the corpus, loop on the driver. The
    * collect is bounded by `maxWords` (documented cap — the standard
    * trainer shape). */
  def trainFrom(docs: DataFrame, textCol: String, numMerges: Int,
                maxWords: Int = 1000000): Seq[Merge] =
    train(wordCounts(docs, textCol, maxWords).collect()
            .map(r => (r.getString(0), r.getLong(1))).toSeq,
          numMerges)
}
