package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encoding over pre-NORMALIZED text (lowercased,
  * single-space separated — compose with `TextFunctions.normalize`),
  * applying a trained merge list in the ##-continuation alphabet
  * [[graft.operators.Bpe]] produces, so train → encode round-trips
  * inside the engine.
  *
  * Semantics are the standard apply (Sennrich et al. 2016 `apply_bpe`,
  * same as HF tokenizers): per word, start from characters
  * [c₀, ##c₁, …] and repeatedly merge the adjacent pair with the
  * LOWEST merge rank, all occurrences left-to-right non-overlapping,
  * until no adjacent pair has a rank. Min-rank-first (not one
  * sequential pass per rank) matters: a low-rank pair can only become
  * adjacent AFTER a higher-rank merge fires, and the standard apply
  * still merges it.
  *
  * Why native: the per-word loop is data-dependent control flow that
  * higher-order functions would interpret per symbol (the
  * graft_wordpiece lesson — 13× at 100×); here it is one compiled
  * method with a HashMap rank probe per adjacent pair, called from
  * WholeStageCodegen. Per-word cost is O(len · merges-applied),
  * independent of the total merge-table size, so production 32k-merge
  * vocabularies ride the same code path.
  *
  * `merges` is a foldable array<string> of "left right" pairs in rank
  * order (the serialization [[graft.operators.Bpe.Merge]] prints);
  * the merged symbol is left + right-without-##.
  */
case class BpeEncodeTokens(text: Expression, merges: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(text, merges)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpeEncodeTokens =
    copy(text = newChildren(0), merges = newChildren(1))

  override def nullable: Boolean = true
  override def foldable: Boolean = text.foldable
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = text.dataType == StringType &&
      (merges.dataType match {
        case ArrayType(StringType, _) => merges.foldable
        case _ => false
      })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_bpe_encode expects (string text, constant array<string> " +
        "\"left right\" merges), got (" +
        Seq(text, merges).map(_.dataType.simpleString).mkString(", ") + ")")
  }

  /** (left, right) → (rank, mergedSymbol). */
  @transient private lazy val rankTable
      : java.util.HashMap[(String, String), (Int, String)] = {
    val ad = merges.eval().asInstanceOf[ArrayData]
    val m = new java.util.HashMap[(String, String), (Int, String)](
      ad.numElements() * 2)
    var i = 0
    while (i < ad.numElements()) {
      val s = ad.getUTF8String(i).toString
      val sp = s.indexOf(' ')
      require(sp > 0 && sp < s.length - 1,
        s"graft_bpe_encode: merge ${i} is not \"left right\": '$s'")
      val l = s.substring(0, sp)
      val r = s.substring(sp + 1)
      val merged = l + (if (r.startsWith("##")) r.substring(2) else r)
      // first rank wins on duplicates (a duplicate later rank is dead)
      m.putIfAbsent((l, r), (i, merged))
      i += 1
    }
    m
  }

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Whole-row encode — public so generated code can call it. */
  def doEncode(u: UTF8String): ArrayData = {
    val s = u.toString
    if (s.isEmpty) return Empty
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    val len = s.length
    var start = 0
    while (start < len) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = len
      if (end > start) encodeWord(s, start, end, out)
      start = end + 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(s: String, from: Int, to: Int,
                         out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    var syms = new Array[String](to - from)
    var i = from
    while (i < to) {
      syms(i - from) =
        if (i == from) String.valueOf(s.charAt(i)) else "##" + s.charAt(i)
      i += 1
    }
    var done = false
    while (!done && syms.length > 1) {
      // the adjacent pair with the lowest rank
      var best = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val hit = rankTable.get((syms(j), syms(j + 1)))
        if (hit != null && hit._1 < best) best = hit._1
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k + 1 < syms.length) {
            val hit = rankTable.get((syms(k), syms(k + 1)))
            if (hit != null && hit._1 == best) {
              next += hit._2; k += 2
            } else { next += syms(k); k += 1 }
          } else { next += syms(k); k += 1 }
        }
        syms = next.toArray
      }
    }
    var p = 0
    while (p < syms.length) { out += UTF8String.fromString(syms(p)); p += 1 }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null else doEncode(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpe", this, classOf[BpeEncodeTokens].getName)
    val childGen = text.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = ${childGen.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $self.doEncode(${childGen.value});
         |}
       """
    ev.copy(code = code)
  }
}
