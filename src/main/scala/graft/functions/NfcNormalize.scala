package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[NfcNormalize]], also directly usable from chunk kernels. */
object TextNorm {

  /** Unicode NFC canonical composition. The common case — text already in
    * NFC, which includes all ASCII — is detected with `isNormalized` and
    * returns the input UTF8String untouched (no String round-trip, no
    * allocation), so the expression costs one quick-check scan per row on
    * clean corpora and only pays the composition on rows that need it.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization of a string column — the canonicalization
  * step every text-dedup pipeline needs before hashing (the same logical
  * text can arrive composed or decomposed; fingerprints must agree).
  * Spark has no built-in normalizer; this is the native codegen'd form
  * (mirrors DuckDB's `nfc_normalize`, which the oracle uses).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNorm.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
