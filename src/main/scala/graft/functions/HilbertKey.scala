package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve distance of two `bits`-wide integer lanes — the
  * codegen'd kernel form of [[graft.operators.ZOrder.hilbertKey2]]'s
  * algebra (one tight xy2d rotation loop per row). The staged Column
  * form exists for the oracle's stage-for-stage CTE replay and is
  * spec-pinned equal to this kernel; the LAYOUT path uses the kernel
  * because a 16-level CASE-projection tree is codegen-hostile (the r16
  * bench measured it ~13× slower than the q24 Morton projection on the
  * same rows).
  */
case class HilbertKey2Expr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert_key2 requires (BIGINT, BIGINT), got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_key2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertKey2Expr.d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertKey2Expr.d($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey2Expr =
    copy(left = newLeft, right = newRight)
}

object HilbertKey2Expr {
  /** The classic xy2d rotation loop (s-1 reflection variant —
    * ZOrderSpec proves bijectivity + unit-step adjacency, the defining
    * Hilbert invariants, on the full grid).
    */
  def d(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val nx = if (rx == 1L) s - 1 - y else y
        val ny = if (rx == 1L) s - 1 - x else x
        x = nx
        y = ny
      }
      i -= 1
    }
    d
  }
}
