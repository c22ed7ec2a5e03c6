package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd sign-LSH bucket: bit i of the result is set iff
  * `vec · planes(i) > 0`, for up to 64 hyperplanes.
  *
  * The higher-order-function formulation (`aggregate(sequence(...),
  * acc -> acc + if(graft_dot(...) > 0, 1<<i, 0))`) is interpreted per
  * plane per row AND drags a ~2000-element nested plane literal
  * through analysis in every plan copy — measured ~1.4 s of cold-plan
  * overhead per dedup/ANN query. This expression folds the plane
  * matrix once into a codegen reference object and runs one fused
  * primitive loop (m × dim multiply-adds) per row.
  *
  * The plane matrix arrives as a FOLDABLE array<array<double>> literal
  * (second child), evaluated once at resolution time — mirrors how
  * MinHashSignature takes its constant k.
  *
  * Semantics match the HOF form bit-for-bit: sequential double
  * accumulation per plane, strict `> 0` test, and a plane whose
  * dimension mismatches the vector contributes no bit (the HOF's
  * `graft_dot` returned NULL there, and `if(NULL)` is false).
  */
case class SignBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val planesOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => right.foldable
      case _ => false
    }
    if (!vecOk || !planesOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_signbucket expects (array<float|double> vec, " +
          "constant array<array<double>> planes), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}" +
          (if (!right.foldable) " (planes not constant)" else ""))
    else if (planes.length > 64)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_signbucket: at most 64 planes, got ${planes.length}")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  /** Plane matrix, materialized once from the foldable literal. */
  private lazy val planes: Array[Array[Double]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any, unused: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val f = isFloat
    var bucket = 0L
    var i = 0
    while (i < planes.length) {
      val pl = planes(i)
      if (pl.length == dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) {
          acc += (if (f) x.getFloat(j).toDouble else x.getDouble(j)) * pl(j)
          j += 1
        }
        if (acc > 0.0) bucket |= (1L << i)
      }
      i += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val dim = ctx.freshName("dim")
      val bucket = ctx.freshName("bucket")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val pl = ctx.freshName("pl")
      val acc = ctx.freshName("acc")
      s"""
         |int $dim = $v.numElements();
         |long $bucket = 0L;
         |for (int $i = 0; $i < $planesRef.length; $i++) {
         |  double[] $pl = $planesRef[$i];
         |  if ($pl.length == $dim) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += ((double) $v.$get($j)) * $pl[$j];
         |    }
         |    if ($acc > 0.0) $bucket |= (1L << $i);
         |  }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignBucket =
    copy(left = newLeft, right = newRight)
}
