package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** QualityTrainer contracts the oracle can't see: the two weight-table
  * plan forms (per-bucket `array(lit…)` vs one array-typed literal) are
  * value-identical, the literal-hazard threshold actually switches
  * forms, and a 65536-bucket model — the allowed maximum — plans and
  * runs end-to-end (train + score) without codegen blowup.
  */
class QualityTrainerSpec extends AnyFunSuite with SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0L until 60L).map { i =>
      val base = s"alpha beta gamma delta tok$i word${i % 7} x${i % 3}"
      val text =
        if (i % 5 == 0) "spam spam spam spam spam spam spam spam spam spam spam"
        else base + " " + base // 14 tokens, low repetition → label 1
      (i, text)
    }.toDF("doc_id", "text")
  }

  test("weight table: literal form == typed-literal form, margin for margin") {
    import spark.implicits._
    // wide enough to cross LiteralWeightMax, prime-ish values incl. negatives
    val n = QualityTrainer.LiteralWeightMax + 1903
    val w = Array.tabulate(n)(i => (i.toLong * 2654435761L % 2000001L) - 1000000L)
    val bkts = (0L until 500L).map(i =>
      (i, Seq(i % n, (i * 31 + 7) % n, (i * 997 + 13) % n))).toDF("id", "bkts")
    def marginWith(forceLiteral: Boolean) =
      aggregate(col("bkts"), lit(12345L),
        (acc, b) => acc + element_at(
          QualityTrainer.weightArray(w, forceLiteral), (b + 1).cast("int")))
    val both = bkts.select(
      col("id"),
      marginWith(forceLiteral = true).as("lit_form"),
      marginWith(forceLiteral = false).as("typed_form"))
    assert(both.filter(col("lit_form") =!= col("typed_form")).count() === 0L)
    // and the threshold actually switches plan representation
    def form(c: org.apache.spark.sql.Column): String = {
      val alias = spark.range(1).select(c.as("w"))
        .queryExecution.analyzed.expressions.head
      alias.children.headOption.getOrElse(alias).getClass.getSimpleName
    }
    assert(form(QualityTrainer.weightArray(Array.fill(16)(1L))) === "CreateArray")
    assert(form(QualityTrainer.weightArray(
      Array.fill(QualityTrainer.LiteralWeightMax + 1)(1L))) === "Literal")
  }

  test("buckets=65536 (max) trains, plans, and scores end-to-end") {
    val model = QualityTrainer.train(corpus, buckets = 65536, iters = 1)
    assert(model.weightsE6.length === 65536)
    val scored = QualityTrainer.score(corpus, model)
    // the plan must materialize (no codegen-size explosion) and be sane
    assert(scored.queryExecution.executedPlan != null)
    val rows = scored.collect()
    assert(rows.length === 60)
    // spam docs are the repetition-labeled negatives; after one step they
    // must not all score identically to the clean docs
    assert(rows.map(_.getLong(1)).distinct.length > 1)
  }

  test("small-bucket train is invariant to the weight-table form (256 == literal path)") {
    val m = QualityTrainer.train(corpus, buckets = 256, iters = 2)
    // 256 <= LiteralWeightMax: the proven oracle-exact literal path
    assert(m.buckets === 256 && m.nDocs === 60L)
    // after 2 steps the classes must separate in margin: positives above
    // negatives on average (pred_pass itself can still be bias-dominated
    // on a corpus this small — the class gap is the trained signal)
    val byClass = QualityTrainer.score(corpus, m)
      .join(QualityTrainer.labels(corpus), "doc_id")
      .groupBy("y").agg(avg("margin_e6").as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byClass(1L) > byClass(0L))
  }
}
