package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct-intersection cardinality of two SORTED string arrays —
  * VALUE-IDENTICAL to `size(array_intersect(a, b))` whenever both
  * inputs are sorted ascending (duplicates allowed; `sort_array` over
  * `collect_set` output is the canonical producer), pinned in
  * ExpressionSpec against the built-in composition.
  *
  * Why it exists (guide §1.2 step 2 — per-task work):
  * `array_intersect` builds a hash set over one side and MATERIALIZES
  * the intersection array per row, only for `size(...)` to count and
  * discard it — in `SetJoin.prefixJaccardSelfJoin`'s verify stage that
  * is one hash set + one output array per candidate pair, the
  * allocation churn behind the suite's intermittent GC storms on
  * `jaccard_join_exact`. Sorted inputs admit a zero-allocation merge
  * walk: O(|a|+|b|) compares, no per-row heap objects.
  *
  * Null elements sort FIRST under `sort_array(..., asc)` and
  * `array_intersect` counts a shared null once — mirrored here by the
  * leading-null check (never exercised by `collect_set` producers,
  * which drop nulls; handled so the expression has array_intersect
  * semantics, not a narrower contract). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_intersect_count expects two array<string> columns, " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  /** Public so generated code can call it. */
  def doCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    // nulls sort first; a null common to both counts once
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    var n = if (i > 0 && j > 0) 1 else 0
    var last: UTF8String = null
    while (i < na && j < nb) {
      // r19 advice: a null AFTER a non-null element violates the
      // sorted-input contract (nulls sort first) — without this guard
      // it would NPE on compareTo deep in generated code with no hint
      // of the cause. Current producers (sort_array over collect_set)
      // never hit it.
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "graft_sorted_intersect_count: null element after a non-null " +
            "one - inputs must be sorted ascending (nulls first), e.g. " +
            "sort_array output")
      val ua = a.getUTF8String(i)
      val ub = b.getUTF8String(j)
      val c = ua.compareTo(ub)
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else {
        if (last == null || ua.compareTo(last) != 0) { n += 1; last = ua }
        i += 1
        j += 1
      }
    }
    n
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    doCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sic", this, classOf[SortedIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.doCount($a, $b);")
  }
}

/** Every ordered index pair (i < j) of an array, as
  * `array<struct<pa, pb>>` — VALUE-IDENTICAL (same pairs, same order)
  * to the interpreted nested-HOF expansion
  * `flatten(transform(xs, (x, i) -> transform(slice(xs, i + 2,
  * size(xs)), y -> struct(x AS pa, y AS pb))))` it replaces in
  * `basket_affinity`'s per-basket pair explode (pinned in
  * ExpressionSpec). The HOF form interprets two lambda layers and
  * allocates a slice copy + inner array per element; this emits the
  * n·(n−1)/2 structs in one flat loop. Element type follows the
  * child's element type. */
case class OrderedPairs(child: Expression) extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType // unreachable past checkInputDataTypes
  }

  override def dataType: DataType = {
    val n = child.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
    ArrayType(StructType(Seq(
      StructField("pa", elemType, nullable = n),
      StructField("pb", elemType, nullable = n))), containsNull = false)
  }

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if !et.isInstanceOf[ArrayType] &&
        !et.isInstanceOf[StructType] && !et.isInstanceOf[MapType] =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ordered_pairs expects an array of atomic type, got ${t.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)

  /** Public so generated code can call it. */
  def doPairs(arr: ArrayData): ArrayData = {
    val et = elemType
    val n = arr.numElements()
    val total = n.toLong * (n - 1) / 2
    // r19 advice: name the function and the remedy instead of a terse
    // require message — a 65536-element basket is analyzable user data,
    // not an internal invariant breach.
    if (total > Int.MaxValue)
      throw new org.apache.spark.SparkException(
        s"graft_ordered_pairs: input array of $n elements expands to " +
          s"$total pairs, past the 2^31-1 array limit - filter oversized " +
          "groups (e.g. size(col) < 65536) before expanding pairs")
    // r19 advice: UTF8String/binary results of arr.get are VIEWS into
    // the input buffer; copy them so the emitted structs stay valid
    // under a buffering consumer (numeric elements are value types and
    // need no copy).
    val copyViews = et == StringType || et == BinaryType
    def elem(idx: Int): Any =
      if (arr.isNullAt(idx)) null
      else arr.get(idx, et) match {
        case u: UTF8String if copyViews => u.clone()
        case b: Array[Byte] if copyViews => b.clone()
        case v => v
      }
    val out = new Array[AnyRef](total.toInt)
    var p = 0
    var i = 0
    while (i < n) {
      val a = elem(i)
      var j = i + 1
      while (j < n) {
        out(p) = new GenericInternalRow(Array[Any](a, elem(j))): InternalRow
        p += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    doPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("opr", this, classOf[OrderedPairs].getName)
    val childGen = child.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = ${childGen.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $self.doPairs(${childGen.value});
         |}
       """
    ev.copy(code = code)
  }
}
