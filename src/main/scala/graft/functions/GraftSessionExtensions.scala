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
    GraftFunctions.builders.foreach { case (name, className, builder) =>
      ext.injectFunction((FunctionIdentifier(name), new ExpressionInfo(className, name), builder))
    }
    ext.injectOptimizerRule(session => graft.plans.SizeGuardRule(session))
    // ANALYZE→planner bridge: fresh `_zstats` live row/byte stats are
    // stamped onto zlayout scan relations so broadcast-vs-shuffle
    // decisions see post-tombstone sizes (see ZStatsRule)
    ext.injectOptimizerRule(session => graft.plans.ZStatsRule(session))
    // SQL surface for the lakehouse verbs: SELECT/VERSION AS OF/DELETE
    // FROM/MERGE INTO over `zlayout.`/path`` tables (see ZLayoutSqlRule)
    ext.injectResolutionRule(session => graft.plans.ZLayoutSqlRule(session))
  }
}
