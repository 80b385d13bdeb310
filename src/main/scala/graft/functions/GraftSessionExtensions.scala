package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook so graft's native expressions and rules are
  * available in any session built with
  * `.config("spark.sql.extensions", "graft.functions.GraftSessionExtensions")`.
  * (Imperative alternatives: [[GraftFunctions.register]] and
  * `spark.experimental.extraOptimizations += SizeGuardRule(spark)`.)
  */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.Fp64Name),
      new ExpressionInfo(classOf[RollingHash64].getName, GraftFunctions.Fp64Name),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash64(children.head),
    ))
    ext.injectOptimizerRule(session => graft.plans.SizeGuardRule(session))
  }
}
