package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes:
  * h = h*31 + b, seeded with a large odd constant. Used for document
  * fingerprinting (SURVEY.md §2 north-star text ops). A native Catalyst
  * expression with codegen so it stays inside whole-stage codegen in the
  * hot path (vs a Scala UDF, which would box and break the codegen span).
  *
  * Only public/stable-ish Catalyst surface is used (UnaryExpression +
  * checkInputDataTypes override) — no `private[sql]` types like
  * `AbstractDataType`/`ExpectsInputTypes` helpers that broke round 1.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash64 requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.RollingHash64.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  final val Seed = 1125899906842597L

  def hash(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      i += 1
    }
    h
  }
}
