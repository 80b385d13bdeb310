package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Column-level entry points for graft's custom Catalyst expressions.
  *
  * Spark 4 removed the public Column(Expression) bridge, so custom
  * expressions are exposed the supported way: registered in the session's
  * FunctionRegistry (also injectable via [[GraftSessionExtensions]]) and
  * invoked with `call_function` — the plan still contains the native
  * codegen'd expression, no UDF boxing.
  */
object GraftFunctions {

  val Fp64Name = "graft_fp64"

  private val fp64Builder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, s"$Fp64Name takes exactly 1 argument")
    RollingHash64(children.head)
  }

  private val fp64Info =
    new ExpressionInfo(classOf[RollingHash64].getName, Fp64Name)

  /** Idempotently register graft functions in this session's registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(Fp64Name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(ident, fp64Info, fp64Builder)
    }
  }

  /** 64-bit polynomial rolling-hash fingerprint of a string column.
    * Requires [[register]] (or the session extension) on the session first.
    */
  def fp64(c: Column): Column = call_function(Fp64Name, c)
}
