package graft.text

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** bigramNovelty semantics: distinct bigrams per doc, novelty = corpus
  * df 1, degenerate docs report zeros instead of vanishing.
  */
class TextAnalysisSpec extends AnyFunSuite with SparkSpec {

  test("bigramNovelty matches the hand count; single-token and empty docs survive") {
    import spark.implicits._
    val docs = Seq(
      // "a b" and "b c" — "a b" also in doc 2, "b c" only here? no:
      // doc 2 = "a b a b" → distinct bigrams {"a b", "b a"}
      (1L, "a b c"),  // bigrams {a b, b c}
      (2L, "a b a b"), // bigrams {a b, b a}
      (3L, "x"),       // single token → no bigrams
      (4L, ""),        // split("") = [""] → no bigrams
      (5L, "q r"),     // {q r} — unique
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramNovelty(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // df: "a b" -> 2, "b c" -> 1, "b a" -> 1, "q r" -> 1
    assert(got.toSeq === Seq(
      (1L, 2L, 1L), // {a b (df 2), b c (df 1)}
      (2L, 2L, 1L), // {a b (df 2), b a (df 1)}
      (3L, 0L, 0L),
      (4L, 0L, 0L),
      (5L, 1L, 1L),
    ))
  }

  test("bigramNovelty counts distinct bigrams once however often they repeat in a doc") {
    import spark.implicits._
    val docs = Seq((1L, "z z z z z z")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramNovelty(docs).collect().head
    assert((got.getLong(1), got.getLong(2)) === ((1L, 1L))) // just {"z z"}
  }

  test("maxTermCount kernel: multiplicity of the mode, nulls skipped, empty = 0") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: Any*): GenericArrayData =
      new GenericArrayData(ts.map {
        case null => null
        case s: String => UTF8String.fromString(s)
      }.toArray[Any])
    assert(graft.functions.Sketches.maxTermCount(arr("a", "b", "a", "a", "c")) === 3)
    assert(graft.functions.Sketches.maxTermCount(arr("x")) === 1)
    assert(graft.functions.Sketches.maxTermCount(arr()) === 0)
    assert(graft.functions.Sketches.maxTermCount(arr(null, "y", null)) === 1)
  }

  test("maxPairCount kernel equals maxTermCount over built bigram strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val g = graft.functions.GraftFunctions
    g.register(spark)
    // the kernel replaced the HOF form for speed — pin the equivalence
    // on real corpus text (space-split tokens can't alias across pairs)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      g.maxPairCount(TextAnalysis.tokens(col("text"))).as("kernel"),
      g.maxTermCount(TextAnalysis.bigrams(TextAnalysis.tokens(col("text")))).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // degenerate + null-slot semantics
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: Any*): GenericArrayData =
      new GenericArrayData(ts.map {
        case null => null
        case s: String => UTF8String.fromString(s)
      }.toArray[Any])
    assert(graft.functions.Sketches.maxPairCount(arr("a", "b", "a", "b")) === 2) // "a b" twice
    assert(graft.functions.Sketches.maxPairCount(arr("x")) === 0)
    assert(graft.functions.Sketches.maxPairCount(arr()) === 0)
    assert(graft.functions.Sketches.maxPairCount(arr("a", null, "a", "b")) === 1)
  }

  test("repetitionSignals: hand-computed Gopher-style counts, narrow plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat the end"), // "the" x3; bigrams all distinct
      (2L, "spam spam spam spam"),            // top tok 4, "spam spam" x3
      (3L, "unique words only here"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 8L, 3L, 2L, 1L), // 8 tokens; "the" 3x; dups = 8-6; bigrams unique
      (2L, 4L, 4L, 3L, 3L), // "spam spam" appears 3 times
      (3L, 4L, 1L, 0L, 1L),
    ))
    // the scale claim IS the plan: no exchange, no generate/explode
    val plan = TextAnalysis.repetitionSignals(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Generate"), plan)
  }
}
