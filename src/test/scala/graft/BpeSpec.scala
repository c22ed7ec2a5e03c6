package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Wordpiece}

/** BPE training: the hand-derived Sennrich-example merge sequence,
  * dictionary correctness, and the train→wordpiece composition. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val dict = Seq("low" -> 5L, "lower" -> 2L,
                         "newest" -> 6L, "widest" -> 3L)

  test("merge sequence matches the hand derivation, ties lex-broken") {
    val ms = Bpe.train(dict, 8)
    assert(ms.map(m => (m.merged, m.count)) === Seq(
      ("##es", 9L), ("##est", 9L), ("##ow", 7L), ("low", 7L),
      ("##ew", 6L), ("##ewest", 6L), ("newest", 6L), ("##dest", 3L)))
    // merge 1 is the (##e, ##s) vs (##s, ##t) tie at 9 — lex order
    assert(ms.head.left === "##e" && ms.head.right === "##s")
  }

  test("training stops cleanly when no pairs remain") {
    val ms = Bpe.train(Seq("ab" -> 1L), 100)
    assert(ms.map(_.merged) === Seq("ab"))
  }

  test("wordCounts builds the normalized dictionary with the cap") {
    val docs = Seq("The the  THE", "low low").toDF("text")
    val wc = Bpe.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(wc === Map("the" -> 3L, "low" -> 2L))
    val capped = Bpe.wordCounts(docs, "text", maxWords = 1)
      .as[(String, Long)].collect().toSeq
    assert(capped === Seq("the" -> 3L))
  }

  test("learned pieces compose with wordpiece greedy tokenization") {
    // alphabet + the learned merges = a vocab; "lowest" (never seen
    // whole) should decompose into learned subwords, not characters
    val ms = Bpe.train(dict, 8)
    val alphabet = dict.flatMap(_._1.toCharArray).distinct.flatMap(c =>
      Seq(c.toString, "##" + c))
    val vocab = alphabet ++ ms.map(_.merged)
    val toks = Seq("lowest").toDF("text")
      .select(Wordpiece.tokenizeNative(col("text"), vocab).as("t"))
      .as[Seq[String]].head()
    assert(toks === Seq("low", "##est"))
  }
}
