package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term frequencies: `array<string>` of tokens →
  * `array<struct<term string, tf bigint>>`, one entry per DISTINCT
  * token in first-occurrence order.
  *
  * Why native: term frequency is a PER-DOCUMENT statistic, but the
  * composed form that computes it — `explode(tokens)` then
  * `groupBy(doc_id, term).count()` — turns it into a corpus-wide
  * aggregation: at the 1000× tier (5M docs, ~1B exploded token rows,
  * ~500M distinct (doc, term) groups) the hash aggregate overflows to
  * sort-based fallback and spilled 53.7 GB mem / 8.3 GB disk inside
  * `InvertedIndex.build` (SCALE1000.md). One hash map per row inside
  * WholeStageCodegen computes the identical counts with ZERO shuffle —
  * the only exchange left in an index build is the bucket-clustering
  * repartition the layout actually requires.
  *
  * Exactness contract: `tf(term)` equals the row count the
  * explode+groupBy form produces for (doc, term) — a pure occurrence
  * count over the same token array, compared as UTF8String bytes (the
  * same equality groupBy uses). Entry ORDER is first-occurrence and
  * deterministic, but callers must not depend on it beyond
  * determinism — the index write re-sorts by (bucket, term) anyway.
  *
  * Null elements inside the array cannot occur from `split()` (its
  * only producer); they are counted under a shared null key would be
  * ambiguous in the struct shape, so they are rejected loudly instead
  * of silently dropped.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TermCounts.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_term_counts expects array<string>, got ${other.simpleString}")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)

  /** One scan of the token array — public so generated code can call it. */
  def doCount(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // LinkedHashMap: first-occurrence iteration order, O(1) updates.
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long](
      math.max(16, n / 2))
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          "graft_term_counts: null token at position " + i)
      val t = arr.getUTF8String(i)
      val prev = counts.get(t)
      counts.put(t, if (prev == null) 1L else prev.longValue() + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    doCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tc", this, classOf[TermCounts].getName)
    val childGen = child.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = ${childGen.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $self.doCount(${childGen.value});
         |}
       """
    ev.copy(code = code)
  }
}

object TermCounts {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
}
