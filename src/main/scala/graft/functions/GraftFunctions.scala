package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-level entry points for graft's custom Catalyst expressions. */
object GraftFunctions {

  /** 64-bit polynomial rolling-hash fingerprint of a string column. */
  def fp64(c: Column): Column =
    ExpressionUtils.column(RollingHash64(ExpressionUtils.expression(c)))
}
