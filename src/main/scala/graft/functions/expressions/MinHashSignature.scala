package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-permutation MinHash signature from two shingle-hash arrays
  * (double hashing): sig[j] = min over shingles of
  * h1 ^ rotl(h2, j % 63 + 1).
  *
  * Same semantics as the HOF formulation (k zip_with+array_min passes,
  * k array allocations per row) but one fused pass with a k-long
  * accumulator — no allocation beyond the output array.
  */
case class MinHashSignature(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  // rotations repeat at 63, so permutations j and j+63 would be
  // identical — silently capping the signature's independence
  require(k >= 1 && k <= 63,
    s"graft_minhash supports 1 <= k <= 63 independent permutations, got $k")

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash expects two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val h1 = a.asInstanceOf[ArrayData]
    val h2 = b.asInstanceOf[ArrayData]
    val n = math.min(h1.numElements(), h2.numElements())
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = h1.getLong(i)
      val y = h2.getLong(i)
      var j = 0
      while (j < k) {
        val r = j % 63 + 1
        val v = x ^ ((y << r) | (y >>> (64 - r)))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val r = ctx.freshName("r")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    int $r = $j % 63 + 1;
         |    long $v = $x ^ (($y << $r) | ($y >>> (64 - $r)));
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
}
