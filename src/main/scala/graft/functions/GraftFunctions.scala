package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import graft.functions.expressions.DotProduct

/** Registration of graft's native Catalyst expressions into a session's
  * function registry, so they're usable from both the Column API
  * (via [[dot]]) and SQL. Idempotent per session. */
object GraftFunctions {

  val DotName = "graft_dot"

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(DotName)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[DotProduct].getName, DotName),
        (children: Seq[Expression]) => DotProduct(children(0), children(1)))
    }
  }

  /** Codegen'd dot product. Registers on the active session if needed
    * (Column construction happens on the driver, so the active session
    * is always the right one). */
  def dot(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(DotName, a, b)
  }

  /** Cosine similarity on top of the native dot product. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
