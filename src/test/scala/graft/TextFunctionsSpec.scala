package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.as("v")).first().get(0)

  test("token counts handle whitespace edge cases") {
    assert(one(TextFunctions.wsTokenCount(col("text")), "a  b\tc\nd") === 4)
    assert(one(TextFunctions.wsTokenCount(col("text")), "   ") === 0)
    assert(one(TextFunctions.wsTokenCount(col("text")), "") === 0)
    // BPE-ish: "don't stop-2" → don + ' + t + stop + - + 2
    assert(one(TextFunctions.bpeTokenCount(col("text")), "don't stop-2") === 6)
  }

  test("langId picks the dominant stopword language, zh on CJK") {
    assert(one(TextFunctions.langId(col("text")), "the cat of the house and dog") === "en")
    assert(one(TextFunctions.langId(col("text")), "der hund und die katze ist") === "de")
    assert(one(TextFunctions.langId(col("text")), "el perro la casa de que los") === "es")
    assert(one(TextFunctions.langId(col("text")), "le chien et les chats des") === "fr")
    assert(one(TextFunctions.langId(col("text")), "中文 text") === "zh")
  }

  test("quality score stays in [0,1] and ranks clean text above noise") {
    val clean = one(TextFunctions.qualityScore(col("text")),
      "the quick brown fox jumps over the lazy dog").asInstanceOf[Double]
    val noise = one(TextFunctions.qualityScore(col("text")),
      "@@@ ### !!! 123 %%% ^^^ &&&").asInstanceOf[Double]
    assert(clean > noise)
    assert(clean >= 0.0 && clean <= 1.0 && noise >= 0.0 && noise <= 1.0)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val a = one(TextFunctions.fingerprint(col("text")), "Hello   World")
    val b = one(TextFunctions.fingerprint(col("text")), "  hello world ")
    val c = one(TextFunctions.fingerprint(col("text")), "hello worlds")
    assert(a === b)
    assert(a !== c)
  }

  test("Wordpiece greedy longest-match, ## continuations, whole-word UNK") {
    import graft.operators.Wordpiece
    val vocab = Seq("the", "##re", "t", "h", "e", "r", "##h", "##e", "##r",
                    "a", "##a", "b", "##b")
    def toks(s: String): Seq[String] =
      Seq(s).toDF("text")
        .select(Wordpiece.tokenize(col("text"), vocab).as("t"))
        .as[Seq[String]].head()
    // longest match wins: "there" -> "the" + "##re", not t/h/e/r/e
    assert(toks("there") === Seq("the", "##re"))
    // continuation must use ## entries: "ab" -> a + ##b
    assert(toks("ab") === Seq("a", "##b"))
    // an unmatchable char anywhere fails the WHOLE word
    assert(toks("axb") === Seq("[UNK]"))
    assert(toks("ab axb the") === Seq("a", "##b", "[UNK]", "the"))
    // empty and whitespace-only inputs produce no tokens
    assert(toks("") === Seq.empty)
    assert(toks("   ") === Seq.empty)
  }

  test("native graft_wordpiece is identical to the HOF formulation") {
    import graft.operators.Wordpiece
    val vocab = Seq("the", "##re", "t", "h", "e", "r", "##h", "##e", "##r",
                    "a", "##a", "b", "##b")
    def both(s: String): (Seq[String], Seq[String]) = {
      val row = Seq(s).toDF("text")
        .select(Wordpiece.tokenize(col("text"), vocab).as("hof"),
                Wordpiece.tokenizeNative(col("text"), vocab).as("nat"))
        .as[(Seq[String], Seq[String])].head()
      row
    }
    for (s <- Seq("there", "ab", "axb", "ab axb the", "", "   ",
                  "There  THE\tab")) {
      val (hof, nat) = both(s)
      assert(hof === nat, s"input '$s'")
    }
    // and on real documents — every doc, full token sequences
    val docs = Tables.documents(spark, sfDir)
    val mismatch = docs.select(
        Wordpiece.tokenize(col("text"), vocab).as("hof"),
        Wordpiece.tokenizeNative(col("text"), vocab).as("nat"))
      .where(col("hof") =!= col("nat")).count()
    assert(mismatch === 0)
  }

  test("graft_unicode_normalize: NFC composes, NFKC folds compatibility forms") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    def norm(s: String, form: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(GraftFunctions.unicodeNormalize(col("t"), form))
        .as[String].head()
    // decomposed e + combining acute composes to U+00E9
    assert(norm("café", "NFC") === "café")
    assert(norm("café", "NFD") === "café")
    // NFKC folds fullwidth ASCII and the fi ligature; NFC must NOT
    assert(norm("\uFF28\uFF49", "NFKC") === "Hi")
    assert(norm("\uFF28\uFF49", "NFC") === "\uFF28\uFF49")
    assert(norm("\uFB01le", "NFKC") === "file")
    // ASCII fast path is the identity
    assert(norm("plain ascii 123", "NFC") === "plain ascii 123")
    // nulls propagate; bad form fails readably
    val n = Seq(Tuple1(null: String)).toDF("t")
      .select(GraftFunctions.unicodeNormalize(col("t"), "NFC"))
      .collect().head
    assert(n.isNullAt(0))
    val bad = intercept[Exception](norm("x\u0301", "NFX"))
    assert(bad.getMessage.contains("NFX") ||
           bad.getCause != null && bad.getCause.getMessage.contains("NFX"))
  }
}
