package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Bpe

/** Total trained-BPE token count of a text column — the tokenizer-token
  * denomination for budgets/chunking/packing (vs the whitespace and
  * pre-tokenizer counts in [[graft.text.TextAnalysis]]).
  *
  * The merge table is a plan constant: [[GraftFunctions.bpeCount]] passes
  * it as a foldable ARRAY<ARRAY<STRING>> literal and the builder freezes it
  * into this expression (the centroid-matrix pattern) — application is a
  * narrow codegen'd per-row kernel, no shuffle, no UDF, no driver round
  * trips. See [[graft.text.Bpe]] for training + the oracle replay.
  */
case class BpeTokenCount(child: Expression, model: Bpe.BpeModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.BpeCountName} requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = GraftFunctions.BpeCountName

  override protected def nullSafeEval(input: Any): Any =
    Bpe.countText(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model, classOf[Bpe.BpeModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.Bpe.countText($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** The text's full trained-BPE token stream (ARRAY<STRING>, word order
  * preserved) — for operators that need the tokens themselves, not just
  * counts (chunking at subword granularity). Same plan-constant merge
  * table as [[BpeTokenCount]].
  */
case class BpeSegment(child: Expression, model: Bpe.BpeModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.BpeSegmentName} requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = GraftFunctions.BpeSegmentName

  override protected def nullSafeEval(input: Any): Any =
    Bpe.segmentText(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model, classOf[Bpe.BpeModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.Bpe.segmentText($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

/** Frozen BYTE-LEVEL BPE token count (see [[graft.text.ByteBpe]]): regex
  * pre-tokenization + byte→unicode mapping + the thousands-of-merges
  * frozen table as a plan constant — the application-scale twin of
  * [[BpeTokenCount]]. Same narrow codegen'd per-row shape.
  */
case class ByteBpeCount(child: Expression, model: Bpe.BpeModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.ByteBpeCountName} requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = GraftFunctions.ByteBpeCountName

  override protected def nullSafeEval(input: Any): Any =
    graft.text.ByteBpe.countText(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("byteBpeModel", model, classOf[Bpe.BpeModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.ByteBpe.countText($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeCount =
    copy(child = newChild)
}

/** The text's frozen byte-level BPE token stream (mapped-space strings,
  * pre-token order preserved) — the application-scale twin of
  * [[BpeSegment]].
  */
case class ByteBpeSegment(child: Expression, model: Bpe.BpeModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.ByteBpeSegmentName} requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = GraftFunctions.ByteBpeSegmentName

  override protected def nullSafeEval(input: Any): Any =
    graft.text.ByteBpe.segmentText(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("byteBpeModel", model, classOf[Bpe.BpeModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.ByteBpe.segmentText($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeSegment =
    copy(child = newChild)
}

/** Mapped-space token stream back to the original text — frozen-BPE
  * detokenization (concat + byte-unmap; see [[graft.text.ByteBpe.detok]]).
  * segment → detok is the identity on any text, which the
  * doc_bpe_roundtrip_v3 gate pins corpus-wide.
  */
case class ByteBpeDetok(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.ByteBpeDetokName} requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.ByteBpeDetokName

  override protected def nullSafeEval(input: Any): Any =
    graft.text.ByteBpe.detok(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.ByteBpe.detok($c);")

  override protected def withNewChildInternal(newChild: Expression): ByteBpeDetok =
    copy(child = newChild)
}

/** The text's frozen-BPE TOKEN-ID stream (ARRAY<INT>, the LM-ready
  * form) — ids 0..255 are the byte base vocabulary, 256+k is merge k's
  * output (see [[graft.text.ByteBpe.vocabOf]]). The id table derives
  * from the plan-constant model once per (deserialized) expression
  * instance and rides codegen as a reference object.
  */
case class ByteBpeIds(child: Expression, model: Bpe.BpeModel)
    extends UnaryExpression {

  @transient private lazy val vocab: java.util.HashMap[String, Integer] =
    graft.text.ByteBpe.vocabOf(model)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.ByteBpeIdsName} requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = GraftFunctions.ByteBpeIdsName

  override protected def nullSafeEval(input: Any): Any =
    graft.text.ByteBpe.idsOf(input.asInstanceOf[UTF8String], model, vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("byteBpeModel", model, classOf[Bpe.BpeModel].getName)
    val vocabRef = ctx.addReferenceObj("byteBpeVocab", vocab, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.ByteBpe.idsOf($c, $modelRef, $vocabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeIds =
    copy(child = newChild)
}
