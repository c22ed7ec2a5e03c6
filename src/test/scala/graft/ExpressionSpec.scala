package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Native codegen expressions must be value-identical to their
  * reference HOF formulations. */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot equals the HOF dot product bit-for-bit") {
    val df = Seq(
      (Array(1.5f, -2.0f, 3.25f), Array(0.5f, 4.0f, -1.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f))
    ).toDF("a", "b")
    val out = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)").as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) => assert(n === h) }
  }

  test("graft_simhash equals the HOF per-bit vote formulation") {
    val df = Seq(
      Tuple1(Array(0x1234567890abcdefL, 0x0fedcba987654321L, 0x1111111111111111L)),
      Tuple1(Array(-1L, 0L, Long.MaxValue, Long.MinValue)),
      Tuple1(Array(42L))
    ).toDF("hashes")
    val out = df.select(
      GraftFunctions.simhash(col("hashes")).as("native"),
      expr("""aggregate(sequence(0, 63), 0L, (acc, i) ->
             |  acc + if(2 * aggregate(hashes, 0,
             |             (a, h) -> a + int(shiftright(h, i) & 1)) > size(hashes),
             |           shiftleft(1L, i), 0L))""".stripMargin).as("hof"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, h) => assert(n === h) }
  }

  test("graft_signbucket equals the HOF aggregate-over-dots formulation") {
    val planes = graft.operators.Dedup.hyperplanes(12, 4)
    val df = Seq(
      Tuple1(Array(1.5f, -2.0f, 3.25f, 0.5f)),
      Tuple1(Array(-0.1f, 0.0f, 0.3f, -4.0f)),
      Tuple1(Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec").withColumn("planes", typedLit(planes))
    val out = df.select(
      GraftFunctions.signBucket(col("vec"), planes).as("native"),
      expr("""aggregate(sequence(0, 11), 0L, (acc, i) ->
             |  acc + if(graft_dot(vec, element_at(planes, i + 1)) > 0D,
             |           shiftleft(1L, i), 0L))""".stripMargin).as("hof"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, h) => assert(n === h) }
  }

  test("graft_minhash equals the HOF zip_with/array_min formulation") {
    val df = Seq(
      (Array(10L, -5L, 77L, 123456789L), Array(3L, 99L, -1000L, 7L))
    ).toDF("h1", "h2")
    val k = 8
    val hofCols = (0 until k).map { j =>
      val rot = j % 63 + 1
      array_min(zip_with(col("h1"), col("h2"), (a, b) =>
        a.bitwiseXOR(shiftleft(b, rot).bitwiseOR(shiftrightunsigned(b, 64 - rot)))))
    }
    val out = df.select(
      GraftFunctions.minhashSignature(col("h1"), col("h2"), k).as("native"),
      array(hofCols: _*).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (n, h) => assert(n === h) }
  }
}
