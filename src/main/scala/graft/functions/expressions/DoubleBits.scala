package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** IEEE-754 bit casts between DOUBLE and BIGINT — the order-preserving
  * bridge that lets a positive double ride inside an integer sort key.
  *
  * For positive finite doubles the raw bit pattern, read as a signed
  * long, is MONOTONE in the double's value (sign bit 0, then biased
  * exponent, then mantissa — lexicographic by construction, Goldberg
  * 1991 §1.2). That makes `(Long.MaxValue − bits(score)) · 2^k + id`
  * a single fixed-width key that sorts exactly like
  * (score DESC, id ASC) — the argmax-with-tie-break shape that
  * otherwise needs a struct ordering, and a struct in an aggregation
  * buffer forces SortAggregate (UnsafeRow can't mutate it in place):
  * at the 1000× tier `tfidf_top_term`'s partial sort of ~500M join
  * rows spilled 6.4 GB for an aggregation whose groups are per-doc.
  * With the key primitive (LONG arithmetic into DECIMAL(38,0) — both
  * UnsafeRow-mutable) the same argmax plans as HashAggregate: zero
  * sort, zero spill, map-side combine to ~|docs| rows.
  *
  * Both directions are exact bit moves (`doubleToRawLongBits` /
  * `longBitsToDouble`), so a score decoded from the winning key is
  * BIT-identical to the score that was encoded — the oracle
  * hash-compare tolerates nothing less. Negative/NaN inputs are the
  * caller's responsibility: the monotonicity contract above holds for
  * positive finite values only (tf/df is always > 0).
  */
case class DoubleBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_double_bits expects a double, got ${child.dataType.simpleString}")

  override protected def withNewChildInternal(newChild: Expression): DoubleBits =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToRawLongBits($c)")
}

/** Inverse of [[DoubleBits]] — see its doc for the contract. */
case class LongBitsDouble(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bits_double expects a bigint, got ${child.dataType.simpleString}")

  override protected def withNewChildInternal(newChild: Expression): LongBitsDouble =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Double.longBitsToDouble(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.longBitsToDouble($c)")
}
