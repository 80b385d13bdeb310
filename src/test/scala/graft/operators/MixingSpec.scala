package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-mixing semantics: md5(id)-deterministic survival, cap and
  * budget honored per block, strict-prefix budget walk.
  */
class MixingSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "s1", "a b c"),      // 3 toks
      (2L, "s1", "d e"),        // 2
      (3L, "s1", "f g h i"),    // 4
      (4L, "s2", "x"),          // 1
      (5L, "s2", "y z"),        // 2
    ).toDF("doc_id", "source", "text")
  }

  private def md5Order(block: String): Seq[Long] =
    docs.filter(col("source") === block)
      .select(col("doc_id"), md5(col("doc_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("doc_id")).collect().map(_.getLong(0)).toSeq

  test("capPerBlock keeps exactly the first `cap` docs in md5 order, per block") {
    val kept = Mixing.capPerBlock(docs, cap = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === (md5Order("s1").take(2) ++ md5Order("s2").take(2)).toSet)
    // cap above block size keeps everything
    assert(Mixing.capPerBlock(docs, cap = 99).count() === 5)
    // determinism: two runs, same survivors
    assert(Mixing.capPerBlock(docs, cap = 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet === kept)
  }

  test("tokenBudgetPerBlock keeps the longest md5-ordered prefix that fits") {
    val toks = Map(1L -> 3L, 2L -> 2L, 3L -> 4L, 4L -> 1L, 5L -> 2L)
    val order = md5Order("s1")
    // budget 5: walk s1's md5 order, cut where the running total passes 5
    val expectS1 = {
      var cum = 0L
      order.takeWhile { id => cum += toks(id); cum <= 5L }
    }
    val got = Mixing.tokenBudgetPerBlock(
      docs, tokens = size(split(col("text"), " ")), budget = 5L)
    val gotS1 = got.filter(col("source") === "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotS1 === expectS1.toSet)
    // s2 fits whole (3 <= 5)
    assert(got.filter(col("source") === "s2").count() === 2)
    // cum_toks is inclusive and within budget on every surviving row
    got.collect().foreach(r => assert(r.getAs[Long]("cum_toks") <= 5L))
    // ONE exchange on the block column (plus the window sort inside it);
    // an executed AdaptiveSparkPlan prints final AND initial plans — count
    // only the final section
    val plan = got.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n === 1, s"expected one block exchange:\n$plan")
  }
}
