package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First-fit-decreasing bin packing of one shard's documents (see
  * [[graft.text.SequencePacking.packFirstFitDecreasing]] for the operator
  * shape and scale contract).
  *
  * Input: ARRAY<STRUCT<doc_id BIGINT, toks BIGINT, rk STRING>> — one
  * shard's documents with a deterministic tie-rank (md5 of the doc id,
  * the splitColumn discipline). Output: the same documents as
  * ARRAY<STRUCT<doc_id BIGINT, toks BIGINT, bin BIGINT>>.
  *
  * Deterministic FFD: documents sort by (toks DESC, rk ASC, doc_id ASC),
  * then each takes the FIRST bin with remaining capacity >= toks, or
  * opens a new bin. A document longer than seqLen opens its own bin
  * (remaining goes negative, so nothing else ever joins it) — oversized
  * docs are isolated, not dropped or split. UTF8String rank comparison
  * is byte order == DuckDB's VARCHAR order on the hex digests, so the
  * greedy replay in the oracle visits documents in the identical order.
  */
object FfdKernel {

  def pack(items: ArrayData, seqLen: Long): ArrayData = {
    val n = items.numElements()
    val docId = new Array[Long](n)
    val toks = new Array[Long](n)
    val rk = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val r = items.getStruct(i, 3)
      docId(i) = r.getLong(0)
      toks(i) = r.getLong(1)
      rk(i) = r.getUTF8String(2)
      i += 1
    }
    val idx = Array.range(0, n).sortWith { (a, b) =>
      if (toks(a) != toks(b)) toks(a) > toks(b)
      else {
        val c = rk(a).compareTo(rk(b))
        if (c != 0) c < 0 else docId(a) < docId(b)
      }
    }
    // first-fit over remaining capacities: O(n·bins) scan is the
    // textbook form; per-shard n is bounded by the sharding contract, so
    // no tree-of-bins structure is warranted here
    val rem = new scala.collection.mutable.ArrayBuffer[Long]()
    val out = new Array[Any](n)
    var k = 0
    while (k < n) {
      val d = idx(k)
      var placed = -1
      var b = 0
      while (placed < 0 && b < rem.length) {
        if (rem(b) >= toks(d)) placed = b
        b += 1
      }
      if (placed < 0) {
        placed = rem.length
        rem += (seqLen - toks(d))
      } else rem(placed) -= toks(d)
      out(k) = new GenericInternalRow(Array[Any](docId(d), toks(d), placed.toLong))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression wrapping [[FfdKernel.pack]]: the whole per-shard
  * FFD pass runs as one codegen'd call over the shard's collected item
  * array — no UDF, no driver round-trip, per-task state bounded by the
  * largest shard (the same contract as the contiguous packer's window).
  */
case class FfdPack(child: Expression, seqLen: Long) extends UnaryExpression {
  require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, LongType, _, _),
        StructField(_, StringType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ffd_pack requires ARRAY<STRUCT<BIGINT, BIGINT, STRING>>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("toks", LongType, nullable = false),
      StructField("bin", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_ffd_pack"

  override protected def nullSafeEval(input: Any): Any =
    FfdKernel.pack(input.asInstanceOf[ArrayData], seqLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FfdKernel.pack($c, ${seqLen}L);")

  override protected def withNewChildInternal(newChild: Expression): FfdPack =
    copy(child = newChild)
}
