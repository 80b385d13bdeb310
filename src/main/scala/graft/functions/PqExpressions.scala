package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Product quantization (PQ) kernels for embedding storage — the
  * compression step past SQ8: the vector splits into `m` contiguous
  * subspaces of `dsub = dim/m` components, each subspace quantizes to the
  * index of its nearest centroid in a per-subspace codebook of `ksub`
  * entries, and the stored row is just `m` code bytes — for the harness
  * operating point (dim=64 doubles, m=16, ksub=16) that is 16 bytes per
  * vector vs 512 for ARRAY<DOUBLE>: 32×. At 100 TB of embeddings this is
  * the difference between an index that fits in cluster RAM and one that
  * lives on disk.
  *
  * Search is ADC (asymmetric distance computation, Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): the query stays
  * un-quantized; per QUERY we precompute one lookup table
  * `lut[s*ksub + c] = dot(q[s*dsub..], codebook[s][c])`, and each
  * candidate then scores in O(m) table adds — `dot(q, reconstruct(code))
  * = Σ_s lut[s*ksub + code[s]]` EXACTLY (dot distributes over the
  * concatenation of subspaces), so ADC vs explicit reconstruction is a
  * bit-equality, not an approximation (PqSpec pins it). The approximation
  * is purely reconstruct(code) ≈ vector, bounded by codebook training.
  *
  * Codebook layout everywhere: row-major `Array[Array[Double]]` with row
  * `s*ksub + c` holding subspace s's centroid c (a dsub-length array).
  * It rides as a plan constant (`ctx.addReferenceObj`), like the IVF
  * centroid matrices.
  */
object PqKernels {

  /** vector → m code bytes (nearest per-subspace centroid, strict-<
    * lowest-index tie-break, same discipline as IVF assignment).
    */
  def encode(v: ArrayData, codebook: Array[Array[Double]], ksub: Int): Array[Byte] = {
    val dsub = codebook(0).length
    val m = codebook.length / ksub
    require(v.numElements() == m * dsub,
      s"pq encode dimension mismatch: vec ${v.numElements()} vs m*dsub ${m * dsub}")
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val cent = codebook(s * ksub + c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = v.getDouble(s * dsub + j) - cent(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** query → ADC lookup table (m*ksub doubles): lut[s*ksub + c] =
    * dot(q[s*dsub .. (s+1)*dsub), codebook[s][c]). Computed ONCE per
    * query row, pre-join — candidates pay O(m), not O(dim).
    */
  def lut(q: ArrayData, codebook: Array[Array[Double]], ksub: Int): Array[Double] = {
    val dsub = codebook(0).length
    val m = codebook.length / ksub
    require(q.numElements() == m * dsub,
      s"pq lut dimension mismatch: query ${q.numElements()} vs m*dsub ${m * dsub}")
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val cent = codebook(s * ksub + c)
        var d = 0.0
        var j = 0
        while (j < dsub) { d += q.getDouble(s * dsub + j) * cent(j); j += 1 }
        out(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    out
  }

  /** ADC dot: Σ_s lut[s*ksub + code[s]]. ksub is inferred as
    * lut.length / code.length — no extra argument to keep in sync.
    */
  def adcDot(lut: ArrayData, code: Array[Byte]): Double = {
    val m = code.length
    require(m > 0 && lut.numElements() % m == 0,
      s"pq adc shape mismatch: lut ${lut.numElements()} not a multiple of m $m")
    val ksub = lut.numElements() / m
    var sum = 0.0
    var s = 0
    while (s < m) {
      sum += lut.getDouble(s * ksub + (code(s) & 0xff))
      s += 1
    }
    sum
  }

  /** L2 norm of the reconstructed vector — stored at index-build time so
    * query-time cosine needs no second pass (the Sq8Nrm discipline).
    */
  def nrm(code: Array[Byte], codebook: Array[Array[Double]], ksub: Int): Double = {
    val dsub = codebook(0).length
    var sum = 0.0
    var s = 0
    while (s < code.length) {
      val cent = codebook(s * ksub + (code(s) & 0xff))
      var j = 0
      while (j < dsub) { sum += cent(j) * cent(j); j += 1 }
      s += 1
    }
    math.sqrt(sum)
  }
}

/** vec (ARRAY<DOUBLE>) → PQ code bytes; codebook + ksub are plan constants. */
case class PqEncode(child: Expression, codebook: Array[Array[Double]], ksub: Int)
    extends UnaryExpression {
  require(codebook.nonEmpty && ksub >= 1 && ksub <= 256 && codebook.length % ksub == 0,
    s"codebook rows ${codebook.length} must be m*ksub with ksub in [1,256], got ksub $ksub")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = GraftFunctions.PqEncodeName

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], codebook, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernels.encode($c, $ref, $ksub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** query vec (ARRAY<DOUBLE>) → ADC lookup table (ARRAY<DOUBLE>, m*ksub). */
case class PqLut(child: Expression, codebook: Array[Array[Double]], ksub: Int)
    extends UnaryExpression {
  require(codebook.nonEmpty && ksub >= 1 && codebook.length % ksub == 0,
    s"codebook rows ${codebook.length} must be m*ksub, got ksub $ksub")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = GraftFunctions.PqLutName

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(PqKernels.lut(input.asInstanceOf[ArrayData], codebook, ksub))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PqKernels.lut($c, $ref, $ksub));")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** (lut ARRAY<DOUBLE>, code BINARY) → dot(q, reconstruct(code)) in O(m). */
case class PqAdcDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc_dot requires (ARRAY<DOUBLE>, BINARY), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = GraftFunctions.PqAdcDotName

  override protected def nullSafeEval(lut: Any, code: Any): Any =
    PqKernels.adcDot(lut.asInstanceOf[ArrayData], code.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, code) =>
      s"${ev.value} = graft.functions.PqKernels.adcDot($lut, $code);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

/** code (BINARY) → L2 norm of the reconstructed vector. */
case class PqNrm(child: Expression, codebook: Array[Array[Double]], ksub: Int)
    extends UnaryExpression {
  require(codebook.nonEmpty && ksub >= 1 && codebook.length % ksub == 0,
    s"codebook rows ${codebook.length} must be m*ksub, got ksub $ksub")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_nrm requires BINARY, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = GraftFunctions.PqNrmName

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.nrm(input.asInstanceOf[Array[Byte]], codebook, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernels.nrm($c, $ref, $ksub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqNrm =
    copy(child = newChild)
}
