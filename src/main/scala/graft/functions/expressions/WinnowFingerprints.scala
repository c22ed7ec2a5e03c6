package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer et al. 2003) of a document in ONE
  * native scan: distinct window-minima of the k-gram digest stream,
  * `array<bigint>` of 60-bit md5 prefixes.
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
  * Why LONG digests (r13; r12 emitted 32-char lowercase hex): the
  * fingerprint is a dedup-candidate key — any consistent hash order
  * works, and collisions only cost a verify that follows anyway. At
  * 1000× the hex form materialized 554M × 32-byte strings (2,198
  * task-s, the suite's largest CPU item — SCALE1000.md); an 8-byte
  * long is 4× fewer bytes in materialization, shuffle, and compare,
  * and the deque compares primitives instead of UTF8Strings. 60 bits
  * (the first 15 hex chars), not 64: the value stays non-negative, so
  * the DuckDB oracle recomputes it portably as
  * `('0x' || substr(md5(gram), 1, 15))::BIGINT` with identical sign
  * and order semantics. Collision math at 60 bits: P(any collision
  * among n grams) ≈ n²/2^61 — at n = 10^9 that is ~0.4, but a
  * collision merely selects one extra/fewer CANDIDATE pair; winnowing
  * feeds a verify, never a verdict.
  *
  * Exactness contract (the DuckDB oracle and CorpusSpec's driver-side
  * reference both recompute this formulation):
  *   - gram i (1-based, i ≤ numChars−k+1) digests the UTF-8 bytes of
  *     the CODE-POINT substring [i, i+k) — `UTF8String.substring`, the
  *     same slicing `substring(text, i, k)` performs.
  *   - the digest is the FIRST 60 BITS of the md5, i.e. bytes 0..6
  *     then the high nibble of byte 7 — numerically equal to parsing
  *     the first 15 lowercase-hex chars of `md5()` as a base-16
  *     integer. Always ≥ 0.
  *   - window j (1 ≤ j ≤ grams−w+1) takes the MINIMUM digest of
  *     positions [j, j+w) — signed long compare ≡ unsigned here, and
  *     ≡ string-min over the 15-char hex prefixes (fixed width, same
  *     alphabet order).
  *   - output = the distinct minima, first-occurrence order (order is
  *     irrelevant downstream: the operator explodes and the oracle
  *     compares sorted sets).
  *   - fewer than one full window (numChars < k+w−1) ⇒ empty array —
  *     callers filter those rows out anyway.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"bad winnow params k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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

  /** First 60 bits of the md5 digest: bytes 0..6, then the high
    * nibble of byte 7 — exactly parseLong(hex.take(15), 16). */
  private def top60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Public so generated code can call it. */
  def doWinnow(u: UTF8String): ArrayData = {
    val nChars = u.numChars()
    val grams = nChars - k + 1
    if (grams - w + 1 < 1) return new GenericArrayData(Array.empty[Long])
    // r19 batch 3: the gram walk joins the zero-copy discipline the xx
    // form already had — ONE boundary pass + byte-range updates over
    // one private copy, instead of a per-gram `UTF8String.substring`
    // re-walk that re-counts code points from the string head and
    // allocates a string + byte array per gram (the O(len²) r15 wall,
    // still paid here until now). The digest stays MessageDigest —
    // HotSpot intrinsifies MD5.implCompress, and the r19 hand-rolled
    // replacement measured 2.2× worse warm and was reverted — but
    // digests into a reusable buffer instead of allocating 16 bytes
    // per gram. Same bytes, same md5, same fingerprint stream
    // (ExpressionSpec's HOF parity pins it).
    val bytes = u.getBytes
    val offs = Grams.charBoundaryOffsets(UTF8String.fromBytes(bytes), nChars)
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val hs = new Array[Long](grams)
    var i = 0
    while (i < grams) {
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      md.digest(dig, 0, 16)
      hs(i) = top60(dig)
      i += 1
    }
    WinnowFingerprints.winnowStream(hs, w)
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

object WinnowFingerprints {
  /** Winnow a pre-computed digest stream: distinct window minima via
    * the O(n) monotonic deque — the shared core of all three entry
    * points (md5, xxhash64, planted hashes). The deque's front is the
    * window minimum; ties keep the EARLIER index (strict > eviction),
    * which picks the same digest VALUE the window min picks — equal
    * longs are equal. */
  def winnowStream(hs: Array[Long], w: Int): ArrayData = {
    val grams = hs.length
    if (grams - w + 1 < 1) return new GenericArrayData(Array.empty[Long])
    val deque = new Array[Int](grams)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < grams) {
      while (tail > head && hs(deque(tail - 1)) > hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hs(deque(head)))
      i += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
}

/** [[WinnowFingerprints]] with the PRODUCTION digest: xxhash64 of the
  * gram's UTF-8 bytes (seed 42, Spark's own `xxhash64` constant)
  * instead of an md5 prefix. The md5 form exists because DuckDB can
  * recompute it — the hash-exact oracle — but md5 EVALUATION is the
  * winnow wall at scale (~2B JCA digest calls, 2,204 task-s at 1000×,
  * SCALE1000.md r13: the representational long-vs-hex change moved
  * nothing because the digest dominates). xxhash64 is a few dozen
  * arithmetic ops per gram, no MessageDigest machinery. A fingerprint
  * is a dedup-CANDIDATE key — any consistent hash works; collisions
  * only cost a verify that follows anyway — so the digest swap is
  * semantics-preserving for the operator's contract. Correctness
  * split: the deque/distinct core is hash-exactly gated through the
  * md5 twin (`winnow_fingerprint`) and the planted-stream twin
  * ([[WinnowFromHashes]], `winnow_xx_sound`); xxhash64 itself is
  * Spark's tested primitive (XXH64). */
case class WinnowXxFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"bad winnow params k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_xx expects a string column, got ${child.dataType.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowXxFingerprints =
    copy(child = newChild)

  /** Public so generated code can call it.
    *
    * Gram semantics are identical to the md5 form — the UTF-8 bytes of
    * the CODE-POINT substring [i, i+k) — but computed WITHOUT the
    * per-gram `UTF8String.substring` the md5 path pays: the first
    * xx cut measured only 1.24× (1,937 → 1,560 task-s at 1000×)
    * because each substring call re-walks code points from the string
    * head and allocates, and THAT — not the digest — had become the
    * wall. One boundary-offset pass per string (the same
    * numBytesForFirstByte walk numChars/substring use, so the byte
    * ranges are identical by construction) lets every gram hash
    * straight off the base buffer, zero-copy. */
  def doWinnow(u: UTF8String): ArrayData = {
    val nChars = u.numChars()
    val grams = nChars - k + 1
    if (grams - w + 1 < 1) return new GenericArrayData(Array.empty[Long])
    val base = u.getBaseObject
    val start = u.getBaseOffset
    // byte offset of each code-point boundary, one linear pass
    // (shared with CharGramHashes/WordGramHashes — see Grams)
    val offs = Grams.charBoundaryOffsets(u, nChars)
    val hs = new Array[Long](grams)
    var i = 0
    while (i < grams) {
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        base, start + offs(i), offs(i + k) - offs(i), 42L)
      i += 1
    }
    WinnowFingerprints.winnowStream(hs, w)
  }

  override def nullSafeEval(input: Any): Any =
    doWinnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wnx", this, classOf[WinnowXxFingerprints].getName)
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

/** Winnow a CALLER-PROVIDED digest stream (`array<bigint>` → distinct
  * window minima): the planted-parameter sound-twin entry point (the
  * simhash pattern). The engine-specific digest is bypassed, so a
  * DuckDB oracle can recompute the window-min + distinct semantics
  * over the same planted stream exactly — this is what hash-gates the
  * deque core that [[WinnowXxFingerprints]] shares. */
case class WinnowFromHashes(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"bad winnow param w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_winnow_from_hashes expects array<bigint>, got ${other.simpleString}")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFromHashes =
    copy(child = newChild)

  /** Public so generated code can call it. Null digests are the
    * caller's contract violation — raise rather than guess an order. */
  def doWinnow(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_winnow_from_hashes: null digest at position $i")
      hs(i) = a.getLong(i)
      i += 1
    }
    WinnowFingerprints.winnowStream(hs, w)
  }

  override def nullSafeEval(input: Any): Any =
    doWinnow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wnh", this, classOf[WinnowFromHashes].getName)
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
