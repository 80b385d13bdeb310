package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy Maximal-Marginal-Relevance selection over ONE query's candidate
  * set (Carbonell & Goldstein '98): at each step pick the candidate
  * maximizing `lam·sim(q,c) − (1−lam)·max_{s∈S} sim(c,s)` (ties → smaller
  * id), the standard diversified-retrieval rerank a curation pipeline
  * runs after top-N ANN retrieval (e.g. assembling an eval set that isn't
  * N near-copies of the same page).
  *
  * Determinism contract: candidates are sorted by id on entry, every
  * pairwise cosine is a left-to-right double dot product, and the argmax
  * breaks ties by id — so the outcome is independent of the incoming
  * array order (collect_list is non-deterministic) and replays
  * bit-exactly in DuckDB's unrolled-CTE oracle (the same sequential-IEEE
  * discipline as emb_cosine_topk; score comparisons are comparisons of
  * bit-identical doubles).
  *
  * Scale shape: runs AFTER retrieval has cut the corpus to N candidates
  * per query, so the O(k·N + N²·dim/2) work is per-group-bounded and
  * embarrassingly parallel across queries — the kernel never sees the
  * corpus. Pairwise sims are computed lazily (only against picked items:
  * k·N dot products, not N²).
  */
object MmrKernel {

  def select(items: ArrayData, k: Int, lam: Double): ArrayData = {
    val n = items.numElements()
    val ids = new Array[Long](n)
    val simq = new Array[Double](n)
    val embs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val r = items.getStruct(i, 3)
      ids(i) = r.getLong(0)
      simq(i) = r.getDouble(1)
      embs(i) = r.getArray(2).toDoubleArray()
      i += 1
    }
    // id-sorted visit order: outcome independent of collect order
    val order = Array.range(0, n).sortBy(ids(_))
    val norms = new Array[Double](n)
    i = 0
    while (i < n) { norms(i) = math.sqrt(dot(embs(i), embs(i))); i += 1 }

    val picked = new Array[Boolean](n)
    // running max sim of each candidate to the picked set
    val maxs = new Array[Double](n)
    val kk = math.min(k, n)
    val out = new Array[Any](kk)
    var r = 0
    while (r < kk) {
      var best = -1
      var bestScore = 0.0
      var oi = 0
      while (oi < n) {
        val c = order(oi)
        if (!picked(c)) {
          val m = if (r == 0) 0.0 else maxs(c)
          val score = lam * simq(c) - (1 - lam) * m
          if (best < 0 || score > bestScore) { best = c; bestScore = score }
        }
        oi += 1
      }
      picked(best) = true
      out(r) = new GenericInternalRow(Array[Any](ids(best), (r + 1).toLong, bestScore))
      // fold the new pick into every survivor's max-sim; a zero-norm
      // embedding (all-zero vector) has no direction, so its cosine is
      // defined as 0.0 — an unguarded 0/0 would be NaN, and one NaN in a
      // running max poisons every later score (selection would silently
      // degrade to id order)
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val den = norms(j) * norms(best)
          val s = if (den == 0.0) 0.0 else dot(embs(j), embs(best)) / den
          if (r == 0 || s > maxs(j)) maxs(j) = s
        }
        j += 1
      }
      r += 1
    }
    new GenericArrayData(out)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}

/** Catalyst expression wrapping [[MmrKernel.select]]: the whole per-query
  * MMR pass is one codegen'd call over the collected candidate array —
  * no UDF, no driver round-trip, per-task state bounded by N candidates.
  */
case class MmrSelect(child: Expression, k: Int, lam: Double) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  require(lam >= 0 && lam <= 1, s"lam must be in [0,1], got $lam")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, DoubleType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mmr_select requires ARRAY<STRUCT<BIGINT, DOUBLE, ARRAY<DOUBLE>>>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("mmr_rank", LongType, nullable = false),
      StructField("mmr_score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_mmr_select"

  override protected def nullSafeEval(input: Any): Any =
    MmrKernel.select(input.asInstanceOf[ArrayData], k, lam)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MmrKernel.select($c, $k, $lam);")

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}
