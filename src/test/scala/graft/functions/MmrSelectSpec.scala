package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR kernel semantics: relevance-first pick, diversity demotion of
  * near-dups, id tie-breaks, input-order independence, and agreement
  * with an independent naive reference on random candidate sets.
  */
class MmrSelectSpec extends AnyFunSuite with SparkSpec {

  private def items(cands: Seq[(Long, Double, Array[Double])]): ArrayData =
    new GenericArrayData(cands.map { case (id, s, e) =>
      new GenericInternalRow(Array[Any](id, s, new GenericArrayData(e)))
    }.toArray[Any])

  private def run(cands: Seq[(Long, Double, Array[Double])], k: Int, lam: Double)
      : Seq[(Long, Long, Double)] = {
    val out = MmrKernel.select(items(cands), k, lam)
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
  }

  /** Naive reference: recompute max-to-picked from scratch each round. */
  private def naive(cands: Seq[(Long, Double, Array[Double])], k: Int, lam: Double)
      : Seq[Long] = {
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Double], b: Array[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val byId = cands.sortBy(_._1)
    var picked = Vector.empty[(Long, Double, Array[Double])]
    (1 to math.min(k, cands.size)).map { _ =>
      val best = byId.filterNot(c => picked.exists(_._1 == c._1)).minBy { c =>
        val m = if (picked.isEmpty) 0.0 else picked.map(p => cos(c._3, p._3)).max
        (-(lam * c._2 - (1 - lam) * m), c._1)
      }
      picked :+= best
      best._1
    }
  }

  test("relevance first, then diversity demotes the near-dup of pick 1") {
    val q = Array(1.0, 0.0, 0.0)
    def simq(v: Array[Double]) =
      v(0) / math.sqrt(v.map(x => x * x).sum) // |q| = 1
    val a = Array(0.9, 0.1, 0.0) // most relevant
    val b = Array(0.9, 0.11, 0.0) // near-dup of a, nearly as relevant
    val c = Array(0.7, 0.0, 0.7) // clearly distinct, less relevant
    val cands = Seq((1L, simq(a), a), (2L, simq(b), b), (3L, simq(c), c))
    val got = run(cands, k = 3, lam = 0.5).map(_._1)
    // pure relevance would give 1, 2, 3; MMR promotes the distinct c
    assert(got === Seq(1L, 3L, 2L))
    val ranks = run(cands, k = 3, lam = 0.5).map(_._2)
    assert(ranks === Seq(1L, 2L, 3L))
  }

  test("lam = 1 reduces to pure relevance ranking with id tie-break") {
    val cands = Seq(
      (5L, 0.9, Array(1.0, 0.0)),
      (3L, 0.9, Array(0.0, 1.0)), // same relevance: smaller id first
      (7L, 0.5, Array(1.0, 1.0)))
    assert(run(cands, 3, lam = 1.0).map(_._1) === Seq(3L, 5L, 7L))
  }

  test("input order does not matter; k > n returns n picks") {
    val rnd = new scala.util.Random(42)
    val cands = (0 until 25).map { i =>
      val e = Array.fill(8)(rnd.nextDouble() - 0.5)
      (i.toLong, rnd.nextDouble(), e)
    }
    val base = run(cands, 10, 0.5)
    assert(run(rnd.shuffle(cands), 10, 0.5) === base)
    assert(run(cands.reverse, 10, 0.5) === base)
    assert(run(cands.take(4), 10, 0.5).map(_._2) === Seq(1L, 2L, 3L, 4L))
  }

  test("a zero-norm candidate does not poison the running max with NaN") {
    // the all-zero vector has no direction: its cosine to anything is
    // defined as 0.0. Unguarded, 0/0 = NaN would enter maxs once the
    // zero vector is picked (or compared against), every later score
    // would be NaN, and selection would silently degrade to id order.
    val cands = Seq(
      (1L, 0.9, Array(1.0, 0.0)),   // picked first (relevance)
      (2L, 0.8, Array(0.0, 0.0)),   // zero vector: sim 0 to everything
      (3L, 0.3, Array(0.95, 0.05)), // near-dup of pick 1: must be demoted
      (4L, 0.25, Array(0.0, 1.0)))  // orthogonal to pick 1
    val got = run(cands, k = 4, lam = 0.5)
    assert(got.forall(t => !t._3.isNaN), "no NaN scores")
    // zero vector scores lam·0.8 − (1−lam)·0 = 0.40 > any alternative
    // second pick; then the orthogonal 4 (0.125) beats the near-dup 3
    // (0.15 − 0.5·~0.999 < 0)
    assert(got.map(_._1) === Seq(1L, 2L, 4L, 3L))
  }

  test("kernel agrees with the naive recompute-from-scratch reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val n = 15 + trial * 5
      val cands = (0 until n).map { i =>
        (i.toLong, rnd.nextDouble() * 2 - 1, Array.fill(6)(rnd.nextDouble() - 0.5))
      }
      assert(run(cands, 8, 0.5).map(_._1) === naive(cands, 8, 0.5), s"trial $trial")
    }
  }

  test("mmrRerank runs distributed end-to-end and matches the kernel") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val emb = (0L until 40L).map { i =>
      (i, Array.fill(6)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val cands = graft.similarity.Ann.bruteForceTopK(
      emb.filter(col("vec_id") < 3), emb, k = 12)
    val got = graft.similarity.Ann.mmrRerank(cands, emb, k = 5, lam = 0.5)
      .orderBy(col("query_id"), col("mmr_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 15) // 3 queries × 5 picks
    // per query: matches the kernel run directly on that query's candidates
    val candRows = cands.join(
        emb.select(col("vec_id").as("neighbor_id"), col("embedding").cast("array<double>").as("ce")),
        "neighbor_id")
      .select("query_id", "neighbor_id", "cos_sim", "ce").collect()
    for (qid <- 0L until 3L) {
      val mine = candRows.filter(_.getLong(0) == qid).map(r =>
        (r.getLong(1), r.getDouble(2), r.getSeq[Double](3).toArray))
      val expect = run(mine.toIndexedSeq, 5, 0.5).map(_._1)
      val gotQ = got.filter(_._1 == qid).sortBy(_._3).map(_._2).toSeq
      assert(gotQ === expect, s"query $qid")
    }
  }
}
