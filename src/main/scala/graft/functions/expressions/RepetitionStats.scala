package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Duplicated n-gram fractions (n = 2, 3) over a token array in ONE
  * native scan: `struct<dup_2gram_frac double, dup_3gram_frac double>`.
  *
  * Why native: the composed HOF form builds, per row and per n,
  * `transform(sequence(...), i -> concat_ws(" ", slice(toks, i, n)))`
  * then `array_distinct` — interpreted lambdas allocating a string per
  * gram and a quadratic-ish distinct pass. Measured at the 1000× tier
  * (5M docs) the two gram projections dominated `text_repetition` at
  * 151 s wall / 4,784 task-s, zero shuffle — pure lambda CPU
  * (SCALE1000.md). Here both fractions come from one compiled method
  * inside WholeStageCodegen.
  *
  * Exactness contract (the DuckDB oracle recomputes the HOF
  * formulation, so this must be value-identical):
  *   - gram i (1-based, i ≤ max(size-n+1, 1)) is the space-join of
  *     `slice(toks, i, n)` — up to n tokens, fewer only in the
  *     size < n case where the single gram joins the whole array.
  *   - Tokens come from `split(text, " ")`, so they cannot contain
  *     the join delimiter: space-join equality ⇔ token-sequence
  *     equality, and the distinct count over joined strings equals
  *     `size(array_distinct(grams))` exactly.
  *   - frac = 1.0 − distinct/m with m = max(size-n+1, 1), the same
  *     single IEEE division and subtraction as the Column form
  *     (`lit(1.0) - size(array_distinct(g)).cast("double")/size(g)`).
  *     size < n ⇒ m = 1, one gram, frac = 0.0 — identical.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_repetition_stats expects array<string>, got ${other.simpleString}")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  private def dupFrac(toks: Array[UTF8String], n: Int): Double = {
    val size = toks.length
    val m = math.max(size - n + 1, 1)
    val seen = new java.util.HashSet[UTF8String](m * 2)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < m) {
      // slice(toks, i+1, n): up to n tokens from i; shorter only when
      // size < n (then m = 1 and the gram is the whole array)
      val end = math.min(i + n, size)
      var g = if (size == 0) UTF8String.EMPTY_UTF8 else toks(i)
      var j = i + 1
      while (j < end) { g = UTF8String.concat(g, space, toks(j)); j += 1 }
      seen.add(g)
      i += 1
    }
    1.0 - seen.size().toDouble / m.toDouble
  }

  /** Public so generated code can call it. */
  def doStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          "graft_repetition_stats: null token at position " + i)
      toks(i) = arr.getUTF8String(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dupFrac(toks, 2), dupFrac(toks, 3)))
  }

  override def nullSafeEval(input: Any): Any =
    doStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rs", this, classOf[RepetitionStats].getName)
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

object RepetitionStats {
  val Schema: StructType = StructType(Seq(
    StructField("dup_2gram_frac", DoubleType, nullable = false),
    StructField("dup_3gram_frac", DoubleType, nullable = false)))
}
