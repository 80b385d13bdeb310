package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
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

/** 3-D Hilbert curve distance of three `bits`-wide integer lanes — the
  * codegen'd kernel form of Skilling's transpose algorithm
  * ([[graft.operators.ZOrder.withHilbert3Key]] is the staged Column
  * twin, kept for the oracle's stage-for-stage CTE replay and
  * spec-pinned equal to this kernel; the LAYOUT path uses the kernel
  * for the same reason the 2-D path does — a (bits−1)·3-level
  * CASE-projection tree is codegen-hostile).
  */
case class HilbertKey3Expr(
    first: Expression, second: Expression, third: Expression, bits: Int)
    extends TernaryExpression {
  require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert_key3 requires (BIGINT, BIGINT, BIGINT), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_key3"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    HilbertKey3Expr.d(a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.HilbertKey3Expr.d($a, $b, $c, $bits);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HilbertKey3Expr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertKey3Expr {
  /** Skilling AxesToTranspose (inverse undo → Gray encode → trailing
    * correction) followed by the transpose interleave — ZOrderSpec
    * proves bijectivity + unit-step adjacency on the full 3-D grid and
    * pins this kernel equal to the staged algebra and to the pure
    * reference.
    */
  def d(x0: Long, y0: Long, z0: Long, bits: Int): Long = {
    var a = x0
    var b = y0
    var c = z0
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      if ((a & q) != 0) a ^= p // exchanging X0 with itself: invert only
      if ((b & q) != 0) a ^= p
      else { val t = (a ^ b) & p; a ^= t; b ^= t }
      if ((c & q) != 0) a ^= p
      else { val t = (a ^ c) & p; a ^= t; c ^= t }
      q >>= 1
    }
    b ^= a
    c ^= b
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((c & q) != 0) t ^= q - 1
      q >>= 1
    }
    a ^= t
    b ^= t
    c ^= t
    var d = 0L
    var i = 0
    while (i < bits) {
      d |= ((a >> i) & 1L) << (3 * i + 2)
      d |= ((b >> i) & 1L) << (3 * i + 1)
      d |= ((c >> i) & 1L) << (3 * i)
      i += 1
    }
    d
  }
}
