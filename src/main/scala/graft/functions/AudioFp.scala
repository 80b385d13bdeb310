package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** 64-bit audio perceptual fingerprint of a WAV payload (BINARY →
  * BIGINT, null when the payload is not decodable mono PCM16 of ≥576
  * samples) — the per-row fingerprint stage of audio near-dup, the audio
  * twin of [[DHash64]]. The kernel
  * ([[graft.multimodal.Multimodal.audioFp64]]) does the real RIFF/WAVE
  * decode and the Haitsma–Kalker band-energy-difference hash over an
  * integer-exact Walsh–Hadamard spectrum; this expression keeps
  * decode+hash inside the codegen'd narrow pipeline — no UDF, no
  * shuffle, audio bytes never leave their partition. Candidate
  * generation downstream is hamming-banded (the simhash pigeonhole),
  * never all-pairs — shape-pinned on mm_audio_dedup.
  *
  * Output-side nullability → hand-rolled doGenCode (the DHash64
  * pattern).
  */
case class AudioFp64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_audio_fp64 requires BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_fp64"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else graft.multimodal.Multimodal.audioFp64(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("afp")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed = graft.multimodal.Multimodal.audioFp64(${childGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): AudioFp64 =
    copy(child = newChild)
}

/** 64-bit video perceptual fingerprint of an AVI payload (BINARY →
  * BIGINT, null when the container doesn't decode or holds no frames) —
  * the video corner of the near-dup triangle: real AVI/DIB decode, then
  * the shared 8×8 dHash grid over frame 0's exact-integer (b+g+r) luma.
  * Same output-side nullability / codegen pattern as [[AudioFp64]].
  */
case class VideoFp64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.VideoFpName} requires BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = GraftFunctions.VideoFpName

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else graft.multimodal.Multimodal.videoFp64(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("vfp")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed = graft.multimodal.Multimodal.videoFp64(${childGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): VideoFp64 =
    copy(child = newChild)
}
