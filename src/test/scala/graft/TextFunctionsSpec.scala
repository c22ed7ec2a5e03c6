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
}
