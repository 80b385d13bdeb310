package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** 64-bit perceptual dHash of an image payload (BINARY → BIGINT,
  * null when no JDK reader decodes it) — the per-row fingerprint stage of
  * image near-dup. The kernel ([[graft.multimodal.Multimodal.dhash64]])
  * decodes with the JDK readers and hashes the 8×8 luma gradient grid;
  * this expression keeps the whole decode+hash inside the codegen'd
  * narrow pipeline — no UDF, no shuffle, images never leave their
  * partition. Candidate generation downstream is hamming-banded
  * (the simhash pigeonhole machinery), never all-pairs.
  *
  * Nullability is OUTPUT-side (a non-null payload can still be
  * undecodable), so this hand-rolls doGenCode instead of
  * nullSafeCodeGen, which only propagates input nulls.
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dhash64 requires BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dhash64"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else graft.multimodal.Multimodal.dhash64(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("dh")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed = graft.multimodal.Multimodal.dhash64(${childGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}
