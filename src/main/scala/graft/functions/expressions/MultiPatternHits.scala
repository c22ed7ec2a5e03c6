package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All-pattern substring occurrence counts in ONE text pass:
  * `(text string, patterns array<string> FOLDABLE)` →
  * `array<struct<pattern string, hits bigint>>`, one entry per pattern
  * with ≥1 occurrence, in pattern-declaration order. `hits` counts
  * EVERY occurrence position, overlapping included (`"a a"` hits
  * `"a a a"` twice — position semantics, not the non-overlapping
  * greedy count `replace()` arithmetic gives).
  *
  * Why native: the composed form — one `contains()`/`locate()` column
  * per pattern — rescans the text P times, so a C4-style blocklist
  * gate (Raffel et al. 2020 §2.2: drop docs matching a curated
  * lexicon) or a many-needle decontamination sweep pays O(P·n) per
  * document. A byte-level Aho-Corasick automaton (Aho & Corasick
  * 1975) built ONCE per JVM from the foldable pattern list matches
  * all P patterns in O(n + matches): at a 100 TB corpus with a
  * several-hundred-entry lexicon that is the difference between one
  * scan and several hundred.
  *
  * Bytes, not chars: patterns and text are matched as UTF-8 bytes.
  * Exact substring equality over valid UTF-8 is byte-equality (UTF-8
  * never embeds one codepoint's encoding inside another's), so the
  * byte automaton is semantics-identical to char matching while
  * reading `UTF8String` storage directly — no per-row String decode.
  *
  * Bounds, stated loudly: the dense transition table costs
  * `states × 256 × 4` bytes where states ≤ total pattern bytes + 1;
  * the build rejects lexicons past [[MultiPatternHits.MaxPatternBytes]]
  * total bytes (64 MB table) rather than silently ballooning every
  * task JVM. Empty and duplicate patterns are rejected — an empty
  * needle "matches" at every position and duplicates would emit
  * ambiguous struct rows.
  */
case class MultiPatternHits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = MultiPatternHits.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_multi_match: patterns must be a foldable literal array " +
            "(the automaton is built once per JVM, not per row)")
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_multi_match expects (string, array<string>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiPatternHits =
    copy(left = newLeft, right = newRight)

  /** Pattern list from the foldable child, validated once. */
  @transient private lazy val patterns: Array[UTF8String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    require(arr != null, "graft_multi_match: patterns array is null")
    val out = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < out.length) {
      require(!arr.isNullAt(i),
        s"graft_multi_match: null pattern at position $i")
      val p = arr.getUTF8String(i)
      require(p.numBytes() > 0,
        s"graft_multi_match: empty pattern at position $i")
      out(i) = p.clone()
      i += 1
    }
    require(out.map(_.toString).distinct.length == out.length,
      "graft_multi_match: duplicate patterns")
    require(out.map(_.numBytes().toLong).sum <= MultiPatternHits.MaxPatternBytes,
      s"graft_multi_match: lexicon exceeds ${MultiPatternHits.MaxPatternBytes} " +
        "total pattern bytes — the dense automaton would balloon task JVMs")
    out
  }

  /** Built once per deserialized expression instance (≈ once per task
    * JVM and plan) — the per-row cost is the text scan alone. */
  @transient private lazy val automaton =
    new MultiPatternHits.Automaton(patterns.map(_.getBytes))

  /** One automaton pass; public so generated code can call it. */
  def doMatch(text: UTF8String): ArrayData = {
    val counts = automaton.countAll(text.getBytes)
    var nonZero = 0
    var i = 0
    while (i < counts.length) { if (counts(i) > 0L) nonZero += 1; i += 1 }
    val rows = new Array[Any](nonZero)
    var j = 0
    i = 0
    while (i < counts.length) {
      if (counts(i) > 0L) {
        rows(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](patterns(i), counts(i)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def nullSafeEval(textVal: Any, patternsVal: Any): Any =
    doMatch(textVal.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mm", this, classOf[MultiPatternHits].getName)
    val textGen = left.genCode(ctx)
    val code =
      code"""
         |${textGen.code}
         |boolean ${ev.isNull} = ${textGen.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $self.doMatch(${textGen.value});
         |}
       """
    ev.copy(code = code)
  }
}

object MultiPatternHits {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("pattern", StringType, nullable = false),
    StructField("hits", LongType, nullable = false))), containsNull = false)

  /** Dense-table bound: 65536 pattern bytes → a 64 MB goto table. */
  val MaxPatternBytes = 65536L

  /** Classic Aho-Corasick with a dense byte-transition table and
    * fail-chain outputs merged at build time (each state carries every
    * pattern ending at it, directly or via suffix links), so the match
    * loop is a table walk plus output-array adds — no per-row chasing. */
  final class Automaton(patternBytes: Array[Array[Byte]]) extends Serializable {
    private val nPatterns = patternBytes.length
    private val maxStates = patternBytes.map(_.length).sum + 1
    private val goto = Array.fill(maxStates * 256)(-1)
    private val outBuild =
      Array.fill(maxStates)(List.empty[Int])
    private var nStates = 1

    // trie
    {
      var p = 0
      while (p < nPatterns) {
        val bytes = patternBytes(p)
        var s = 0
        var i = 0
        while (i < bytes.length) {
          val c = bytes(i) & 0xff
          if (goto(s * 256 + c) == -1) {
            goto(s * 256 + c) = nStates
            nStates += 1
          }
          s = goto(s * 256 + c)
          i += 1
        }
        outBuild(s) = p :: outBuild(s)
        p += 1
      }
    }

    // BFS fail links; densify goto and merge fail-chain outputs in
    // BFS order (parents settle before children — the standard
    // construction invariant)
    private val outputs: Array[Array[Int]] = {
      val fail = new Array[Int](nStates)
      val queue = new java.util.ArrayDeque[Integer]()
      var c = 0
      while (c < 256) {
        val t = goto(c)
        if (t == -1) goto(c) = 0
        else { fail(t) = 0; queue.add(t) }
        c += 1
      }
      while (!queue.isEmpty) {
        val s = queue.poll().intValue()
        outBuild(s) = outBuild(s) ::: outBuild(fail(s))
        c = 0
        while (c < 256) {
          val t = goto(s * 256 + c)
          if (t == -1) goto(s * 256 + c) = goto(fail(s) * 256 + c)
          else { fail(t) = goto(fail(s) * 256 + c); queue.add(t) }
          c += 1
        }
      }
      outBuild.take(nStates).map(_.toArray)
    }

    /** Occurrence count per pattern index over one byte string. */
    def countAll(text: Array[Byte]): Array[Long] = {
      val counts = new Array[Long](nPatterns)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = goto(s * 256 + (text(i) & 0xff))
        val out = outputs(s)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }
}
