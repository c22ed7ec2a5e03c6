package graft

import org.apache.spark.sql.functions._
import graft.operators.{Unigram, Wordpiece}

/** Unigram-LM (SentencePiece-style) Viterbi-EM trainer (#64c). The
  * planted end-to-end sequence is driver-gated by `unigram_train_sound`
  * (VALUES-literal oracle from an independent exact-fraction
  * reference); this spec proves the invariants and the composition
  * into the native WordPiece tokenizer. */
class UnigramSpec extends SparkSpec {

  private val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("seed keeps every single char and truncates multi-char by frequency then lex") {
    val s = Unigram.seed(dict, maxPieceLen = 3, maxSeed = 8)
    val chars = s.filter(_.piece.length == 1).map(_.piece).toSet
    assert(chars === "lowernstid".toSet.map((c: Char) => c.toString))
    val multi = s.filter(_.piece.length > 1)
    assert(multi.size === 8)
    // es/est/st (9) and we (8) must beat ew (6); er (2) must be cut
    assert(multi.map(_.piece).contains("est"))
    assert(!multi.map(_.piece).contains("er"))
    // substring weighting: 'e' occurs 1x in lower, 2x in newest, 1x in widest
    assert(s.find(_.piece == "e").get.count === 2L + 12L + 3L)
  }

  test("segment maximizes the exact product and breaks ties deterministically") {
    val counts = Map("ab" -> 4L, "a" -> 2L, "b" -> 2L, "c" -> 1L)
    // "ab": piece (4/9) beats a|b (4/81)
    assert(Unigram.segment("ab", counts, 9L) === Some(Vector("ab")))
    // exact score tie: aa as one piece (1/4) vs a|a ((2/4)^2 = 1/4)
    // — fewer pieces wins
    val tie = Map("aa" -> 1L, "a" -> 2L)
    assert(Unigram.segment("aa", tie, 4L) === Some(Vector("aa")))
    // unsegmentable word -> None
    assert(Unigram.segment("xz", counts, 9L) === None)
  }

  test("EM reaches the hand-checked fixed point on the planted corpus") {
    val out = Unigram.train(dict, maxPieceLen = 3, maxSeed = 8, rounds = 2)
    val expect = Seq("d" -> 3L, "e" -> 2L, "est" -> 9L, "ew" -> 6L, "i" -> 3L,
      "l" -> 0L, "low" -> 7L, "n" -> 6L, "o" -> 0L, "r" -> 2L, "s" -> 0L,
      "t" -> 0L, "w" -> 3L)
    assert(out.map(p => p.piece -> p.count) === expect)
    // fixed point: a third round changes nothing
    val out3 = Unigram.train(dict, maxPieceLen = 3, maxSeed = 8, rounds = 3)
    assert(out3 === out)
  }

  test("every word stays segmentable after each round and counts conserve mass") {
    val out = Unigram.train(dict, maxPieceLen = 3, maxSeed = 8, rounds = 2)
    val counts = out.map(p => p.piece -> p.count).toMap
    val total = out.map(_.count).sum
    for ((w, n) <- dict) {
      val seg = Unigram.segment(w, counts, total)
      assert(seg.isDefined, s"'$w' unsegmentable after training")
    }
    // each word's best-seg pieces, weighted by word count, must equal
    // the published counts exactly (the M-step definition)
    val recount = new scala.collection.mutable.HashMap[String, Long]
    for ((w, n) <- dict; p <- Unigram.segment(w, counts, total).get)
      recount(p) = recount.getOrElse(p, 0L) + n
    for (p <- out)
      assert(recount.getOrElse(p.piece, 0L) === p.count, s"count drift on '${p.piece}'")
  }

  test("vocabSize truncation keeps all chars plus top multi-char pieces") {
    val out = Unigram.train(dict, maxPieceLen = 3, maxSeed = 8, rounds = 2,
                            vocabSize = 12)
    val chars = out.filter(_.piece.length == 1)
    assert(chars.size === 10)              // all 10 distinct chars survive
    assert(out.size === 12)
    assert(out.filter(_.piece.length > 1).map(_.piece).toSet === Set("est", "low"))
  }

  test("composition: learned pieces feed graft_wordpiece as a ##-vocabulary") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val learned = Unigram.train(dict, maxPieceLen = 3, maxSeed = 8, rounds = 2)
    val vocab = Unigram.asWordpieceVocab(learned.filter(p => p.count > 0))
    val toks = Wordpiece.tokenizeNative(col("text"), vocab)
    val got = Seq("newest lower", "low widest").toDF("text")
      .select(concat_ws(" ", toks).as("t")).as[String].collect()
    // longest-match over {est, ew, low, chars...} reproduces the
    // training segmentations wherever greedy == viterbi here
    assert(got(0) === "n ##ew ##est low ##e ##r")
    assert(got(1) === "low w ##i ##d ##est")
  }

  test("trainFrom runs the one corpus shuffle then converges on real data") {
    val out = Unigram.trainFrom(Tables.documents(spark, sfDir), "text",
      maxPieceLen = 4, maxSeed = 300, rounds = 1, vocabSize = 200,
      maxWords = 5000)
    assert(out.nonEmpty)
    assert(out.map(_.piece).distinct.size === out.size)
    assert(out.forall(_.count >= 0))
    assert(out.exists(p => p.piece.length > 1 && p.count > 0),
      "no multi-char piece earned usage on real text")
  }
}
