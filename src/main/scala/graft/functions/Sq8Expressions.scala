package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Int8 scalar quantization (SQ8) kernels for embedding storage: each
  * vector component maps to one unsigned byte on the vector's own
  * [lo, hi] range — 8× smaller than the ARRAY<DOUBLE> list rows the
  * float IVF index stores (4× smaller than float32), which at 100 TB of
  * embeddings is the difference between an index that fits the page
  * cache and one that doesn't. Search never materializes the dequantized
  * array: [[Sq8Dot]] fuses dequantize+multiply+accumulate into one
  * codegen'd loop over the code bytes.
  *
  * Contract (all three expressions share it):
  *   code[i] = round((x[i] - lo) * 255 / (hi - lo)), half-up, so the
  *   reconstruction lo + code[i]*(hi-lo)/255 is within (hi-lo)/510 of
  *   x[i] per component; hi == lo (constant vector) degenerates to
  *   code = 0, reconstruction = lo exactly.
  */
object Sq8Kernels {

  def encode(v: ArrayData, lo: Double, hi: Double): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    val scale = if (hi > lo) 255.0 / (hi - lo) else 0.0
    var i = 0
    while (i < n) {
      out(i) = math.round((v.getDouble(i) - lo) * scale).toInt.toByte
      i += 1
    }
    out
  }

  /** dot(q, dequantize(code, lo, hi)) in one pass, sequential
    * accumulation (the same order every other vector kernel here uses).
    */
  def dot(q: ArrayData, code: Array[Byte], lo: Double, hi: Double): Double = {
    require(q.numElements() == code.length,
      s"sq8 dot dimension mismatch: query ${q.numElements()} vs code ${code.length}")
    val step = (hi - lo) / 255.0
    var s = 0.0
    var i = 0
    while (i < code.length) {
      s += q.getDouble(i) * (lo + (code(i) & 0xff) * step)
      i += 1
    }
    s
  }

  /** L2 norm of the dequantized vector — stored at index-build time so
    * query-time cosine needs no second pass over the codes.
    */
  def nrm(code: Array[Byte], lo: Double, hi: Double): Double = {
    val step = (hi - lo) / 255.0
    var s = 0.0
    var i = 0
    while (i < code.length) {
      val d = lo + (code(i) & 0xff) * step
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }
}

/** vec (ARRAY<DOUBLE>), lo, hi → SQ8 code bytes. */
case class Sq8Encode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_sq8_encode requires (ARRAY<DOUBLE>, DOUBLE, DOUBLE), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = GraftFunctions.Sq8EncodeName

  override protected def nullSafeEval(v: Any, lo: Any, hi: Any): Any =
    Sq8Kernels.encode(v.asInstanceOf[ArrayData], lo.asInstanceOf[Double], hi.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, lo, hi) =>
      s"${ev.value} = graft.functions.Sq8Kernels.encode($v, $lo, $hi);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8Encode = copy(f, s, t)
}

/** qe (ARRAY<DOUBLE>), code (BINARY), lo, hi → dot(qe, dequantized). */
case class Sq8Dot(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType, DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"graft_sq8_dot requires (ARRAY<DOUBLE>, BINARY, DOUBLE, DOUBLE), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString}, ${d.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = GraftFunctions.Sq8DotName

  override protected def nullSafeEval(q: Any, code: Any, lo: Any, hi: Any): Any =
    Sq8Kernels.dot(q.asInstanceOf[ArrayData], code.asInstanceOf[Array[Byte]],
      lo.asInstanceOf[Double], hi.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, code, lo, hi) =>
      s"${ev.value} = graft.functions.Sq8Kernels.dot($q, $code, $lo, $hi);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Sq8Dot = copy(f, s, t, q)
}

/** code (BINARY), lo, hi → L2 norm of the dequantized vector. */
case class Sq8Nrm(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_sq8_nrm requires (BINARY, DOUBLE, DOUBLE), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = GraftFunctions.Sq8NrmName

  override protected def nullSafeEval(code: Any, lo: Any, hi: Any): Any =
    Sq8Kernels.nrm(code.asInstanceOf[Array[Byte]], lo.asInstanceOf[Double], hi.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, lo, hi) =>
      s"${ev.value} = graft.functions.Sq8Kernels.nrm($code, $lo, $hi);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8Nrm = copy(f, s, t)
}
