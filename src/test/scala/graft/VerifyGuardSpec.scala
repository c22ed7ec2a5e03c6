package graft

import org.apache.spark.sql.functions._

/** Guards the Verify-time scalar-schema assertion (r9 lesson: an
  * array-typed result column crashes the DRIVER's pandas compare with
  * "unhashable type" and records `err` with zero evidence — it must
  * fail at registration time instead, before it ever ships).
  */
class VerifyGuardSpec extends SparkSpec {
  import spark.implicits._

  test("a deliberately array-returning query fails the Verify schema gate") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "proj")
    val e = intercept[IllegalStateException] {
      Verify.assertScalarSchema("bad_query", df.schema)
    }
    assert(e.getMessage.contains("bad_query"))
    assert(e.getMessage.contains("proj"))
    assert(e.getMessage.contains("flatten"))
  }

  test("struct and map columns fail; scalar columns pass") {
    val structDf = Seq((1L, (2, "x"))).toDF("id", "pair")
    intercept[IllegalStateException] {
      Verify.assertScalarSchema("s", structDf.schema)
    }
    val mapDf = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    intercept[IllegalStateException] {
      Verify.assertScalarSchema("m", mapDf.schema)
    }
    val ok = Seq((1L, 2.5, "t", java.sql.Date.valueOf("2024-01-01")))
      .toDF("id", "v", "s", "d")
    Verify.assertScalarSchema("ok", ok.schema) // must not throw
  }

  test("every registered oracle query would pass the gate if its schema is known") {
    // The full run is the driver's job; here we pin the CONTRACT: the
    // gate rejects exactly ArrayType/StructType/MapType and nothing else.
    import org.apache.spark.sql.types._
    assert(!Verify.isScalarType(ArrayType(DoubleType)))
    assert(!Verify.isScalarType(StructType(Seq(StructField("a", IntegerType)))))
    assert(!Verify.isScalarType(MapType(StringType, LongType)))
    for (t <- Seq(IntegerType, LongType, DoubleType, FloatType, StringType,
                  BooleanType, DateType, TimestampType, BinaryType,
                  DecimalType(10, 2)))
      assert(Verify.isScalarType(t), t.toString)
  }
}
