package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All four text-quality components in ONE byte-level scan:
  * `struct<alpha_ratio, punct_ratio, stopword_ratio, quality>`.
  *
  * Why native: the composed form in [[graft.functions.TextFunctions]]
  * runs THREE independent `regexp_count` passes (letters, punctuation,
  * stopwords) plus a fourth for the token denominator — measured at
  * 100× (500k docs) that regex CPU dominates 4 of the 6 slowest
  * non-graph queries (`quality_filter` 17.3 s, `quality_filter_approx`
  * 19.2 s, `sample_by_classifier` 18.0 s, `perceptron_filter` 17.9 s —
  * SCALE100_r11.json), ~2.2M task-ms total. Here the whole struct is
  * one compiled method called from inside WholeStageCodegen.
  *
  * Exactness contract — every component reproduces the regex
  * formulation BIT-FOR-BIT (the driver oracle recomputes them in
  * DuckDB SQL, so this is load-bearing):
  *   - `regexp_count(text, '[A-Za-z]')` — ASCII-letter code points.
  *   - `regexp_count(text, '[^A-Za-z0-9\s]')` — code points that are
  *     neither ASCII alphanumeric nor `\s` = [ \t\n\x0B\f\r]. Every
  *     non-ASCII code point satisfies this (it is exactly one
  *     non-continuation UTF-8 lead byte, so byte-level counting is
  *     code-point-exact).
  *   - `regexp_count(text, '\S+')` — maximal runs of non-`\s` code
  *     points; continuation bytes extend the current run for free.
  *   - `regexp_count(lower(text), '\b(the|of|and|to|in)\b')` — since
  *     `\b` sits only at `\w`=[A-Za-z0-9_] run edges and none of the
  *     five words is a proper prefix that could match mid-run, the
  *     count equals the number of MAXIMAL word runs byte-equal to one
  *     of the five words. Lowering goes through the same
  *     `UTF8String.toLowerCase` the `lower()` expression uses.
  *   - `length(text)` = code points = non-continuation bytes.
  *   - quality = alpha*0.5 + stop*0.3 + (1.0-punct)*0.2 in the same
  *     left-associated IEEE-754 order as the Column formulation.
  *
  * The struct shape (not four scalar expressions) means a projection
  * of all four components costs one scan even without Spark's
  * subexpression elimination; with it, sibling GetStructFields share
  * the single evaluation.
  */
case class TextQualityStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextQualityStats.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_quality_stats expects a string column, got ${child.dataType.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): TextQualityStats =
    copy(child = newChild)

  /** Whole-row scan — public so generated code can call it. */
  def doStats(u: UTF8String): InternalRow = {
    val b = u.getBytes
    var letters = 0
    var punct = 0
    var nChars = 0
    var wsTokens = 0
    var inRun = false
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) {
        nChars += 1
        val isSpace = c == 0x20 || (c >= 0x09 && c <= 0x0d)
        val isLetter = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        val isDigit = c >= '0' && c <= '9'
        if (isLetter) letters += 1
        else if (!isDigit && !isSpace) punct += 1
        if (isSpace) inRun = false
        else if (!inRun) { wsTokens += 1; inRun = true }
      } else if (c >= 0xc0) { // UTF-8 lead byte: one non-ASCII code point
        nChars += 1
        punct += 1 // non-ASCII is never [A-Za-z0-9] and never Java \s
        if (!inRun) { wsTokens += 1; inRun = true }
      } // 0x80–0xbf: continuation byte of the lead we already counted
      i += 1
    }

    // Stopword hits over the lowered bytes: count maximal \w runs
    // byte-equal to the/of/and/to/in. Non-ASCII bytes (lead or
    // continuation) are non-\w in Java regex, so they end runs —
    // byte-level is exact.
    val lb = u.toLowerCase.getBytes
    var stop = 0
    var runStart = -1
    i = 0
    while (i <= lb.length) {
      val isWord = i < lb.length && {
        val c = lb(i) & 0xff
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_' ||
          (c >= 'A' && c <= 'Z')
      }
      if (isWord) { if (runStart < 0) runStart = i }
      else if (runStart >= 0) {
        val len = i - runStart
        if (len == 2) {
          val c0 = lb(runStart); val c1 = lb(runStart + 1)
          if ((c0 == 'o' && c1 == 'f') || (c0 == 't' && c1 == 'o') ||
              (c0 == 'i' && c1 == 'n')) stop += 1
        } else if (len == 3) {
          val c0 = lb(runStart); val c1 = lb(runStart + 1); val c2 = lb(runStart + 2)
          if ((c0 == 't' && c1 == 'h' && c2 == 'e') ||
              (c0 == 'a' && c1 == 'n' && c2 == 'd')) stop += 1
        }
        runStart = -1
      }
      i += 1
    }

    val denomChars = math.max(nChars, 1).toDouble
    val denomToks = math.max(wsTokens, 1).toDouble
    val alpha = letters.toDouble / denomChars
    val punctR = punct.toDouble / denomChars
    val stopR = stop.toDouble / denomToks
    val quality = alpha * 0.5 + stopR * 0.3 + (1.0 - punctR) * 0.2
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](alpha, punctR, stopR, quality))
  }

  override def nullSafeEval(input: Any): Any =
    doStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("qs", this, classOf[TextQualityStats].getName)
    val childGen = child.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = ${childGen.isNull};
         |InternalRow ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $self.doStats(${childGen.value});
         |}
       """
    ev.copy(code = code)
  }
}

object TextQualityStats {
  val Schema: StructType = StructType(Seq(
    StructField("alpha_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))
}
