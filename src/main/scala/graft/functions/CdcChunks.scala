package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking kernel: the native single-pass twin of the
  * built-in-HOF formulation (sequence → substr → md5 per window), which
  * allocates a UTF8String AND a MessageDigest per window — ~10× the
  * digest's own cost. This kernel walks the text once, reuses one
  * thread-local digest, and hashes each w-char window as a byte range of
  * the original buffer (char-boundary offsets computed in one scan, so
  * non-ASCII text windows stay CHARACTER-defined like substr's).
  *
  * The boundary rule is IDENTICAL to the HOF form and the DuckDB oracle:
  * a boundary falls after 1-based char position p (p ≥ w) iff the md5 of
  * the w-char window ending at p has a zero high nibble (hex '0…').
  * DedupSpec pins kernel == HOF formulation chunk-for-chunk.
  */
object CdcKernels {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def chunks(text: UTF8String, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    val nChars = text.numChars()
    if (nChars == 0) return new GenericArrayData(Array.empty[Any])
    // char-start byte offsets: off(i) = byte offset of char i; off(nChars) = length
    val off = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (b < bytes.length) {
      off(c) = b
      val first = bytes(b) & 0xff
      b += (if (first < 0x80) 1
            else if (first < 0xe0) 2
            else if (first < 0xf0) 3
            else 4)
      c += 1
    }
    off(nChars) = bytes.length
    val dig = md5.get()
    val out = new java.util.ArrayList[Any]()
    var start = 0 // 0-based char index of the current chunk's first char
    var p = w // 1-based end position of the candidate window
    while (p <= nChars) {
      dig.reset()
      dig.update(bytes, off(p - w), off(p) - off(p - w))
      if ((dig.digest()(0) & 0xf0) == 0) { // hex digest starts with '0'
        out.add(UTF8String.fromBytes(bytes, off(start), off(p) - off(start)))
        start = p
      }
      p += 1
    }
    if (start < nChars)
      out.add(UTF8String.fromBytes(bytes, off(start), off(nChars) - off(start)))
    new GenericArrayData(out.toArray)
  }
}

/** text (STRING) → ARRAY<STRING> of content-defined chunks. */
case class CdcChunks(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = GraftFunctions.CdcChunksName

  override protected def nullSafeEval(input: Any): Any =
    CdcKernels.chunks(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcKernels.chunks($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
