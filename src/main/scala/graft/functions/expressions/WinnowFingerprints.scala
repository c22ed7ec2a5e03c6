package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer et al. 2003) of a document in ONE
  * native scan: distinct window-minima of the k-gram md5 stream,
  * `array<string>` of lowercase hex digests.
  *
  * Why native: the composed form materializes the full hash stream as
  * an array column (`transform(sequence(...), i -> md5(substring(text,
  * i, k)))`), then for every window position evaluates an interpreted
  * `array_min(slice(...))` lambda — O(n·w) interpreted work plus an
  * array_distinct pass, all outside codegen. `winnow_fingerprint` was
  * the slowest non-graph 100× entry at 38.4 s (SCALE100.md) with zero
  * shuffle — pure lambda CPU. Here the window minimum runs as the
  * classic O(n) monotonic deque over the digest stream inside one
  * compiled method.
  *
  * Exactness contract (the DuckDB oracle and CorpusSpec's driver-side
  * reference both recompute the HOF formulation):
  *   - gram i (1-based, i ≤ numChars−k+1) digests the UTF-8 bytes of
  *     the CODE-POINT substring [i, i+k) — `UTF8String.substring`, the
  *     same slicing `substring(text, i, k)` performs.
  *   - digests are lowercase md5 hex, byte-identical to Spark's
  *     `md5()` (commons-codec md5Hex semantics).
  *   - window j (1 ≤ j ≤ grams−w+1) takes the MINIMUM digest of
  *     positions [j, j+w) — string min = binary compare, identical to
  *     `array_min` on ASCII hex.
  *   - output = the distinct minima, first-occurrence order (order is
  *     irrelevant downstream: the operator explodes and the oracle
  *     compares sorted sets; `array_distinct` also keeps first
  *     occurrence).
  *   - fewer than one full window (numChars < k+w−1) ⇒ empty array —
  *     callers filter those rows out anyway, mirroring the HOF form's
  *     precondition.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"bad winnow params k=$k w=$w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects a string column, got ${child.dataType.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  @transient private lazy val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val HexChars = "0123456789abcdef".getBytes("US-ASCII")

  private def md5Hex(bytes: Array[Byte]): UTF8String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    val hex = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = HexChars((d(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** Public so generated code can call it. */
  def doWinnow(u: UTF8String): ArrayData = {
    val nChars = u.numChars()
    val grams = nChars - k + 1
    val windows = grams - w + 1
    if (windows < 1) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[UTF8String](grams)
    var i = 0
    while (i < grams) {
      hs(i) = md5Hex(u.substring(i, i + k).getBytes)
      i += 1
    }
    // monotonic deque of indices: front is the window minimum;
    // ties keep the EARLIER index (strict < eviction), which picks the
    // same digest VALUE array_min picks — equal strings are equal
    val deque = new Array[Int](grams)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i < grams) {
      while (tail > head && hs(deque(tail - 1)).compareTo(hs(i)) > 0) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hs(deque(head)))
      i += 1
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    doWinnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wn", this, classOf[WinnowFingerprints].getName)
    val childGen = child.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = ${childGen.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $self.doWinnow(${childGen.value});
         |}
       """
    ev.copy(code = code)
  }
}
