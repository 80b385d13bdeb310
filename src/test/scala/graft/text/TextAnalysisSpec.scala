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

  test("lmScore: third-implementation check on a hand corpus; edges; e4 margin audit") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"), // bigrams: ab, ba, ab, bc
      (2L, "a b"),       // bigram: ab
      (3L, "x"),         // no bigrams
      (4L, ""),          // split("") = [""] → one token, no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // driver-side recomputation (a third, independent implementation)
    val toks = Seq("a", "b", "a", "b", "c", "a", "b", "x", "")
    val ca = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = toks.distinct.size.toLong
    val cab = Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L)
    def ln(g: String, a: String) = math.log((cab(g) + 1).toDouble / (ca(a) + v).toDouble)
    val s1 = ln("a b", "a") + ln("b a", "b") + ln("a b", "a") + ln("b c", "b")
    val s2 = ln("a b", "a")
    assert(got(1L) === ((4L, math.round(s1 * 10000))))
    assert(got(2L) === ((1L, math.round(s2 * 10000))))
    assert(got(3L) === ((0L, 0L)))
    assert(got(4L) === ((0L, 0L)))
    // e4 rounding margin on the real corpus: every score must sit far
    // from a rounding half-boundary relative to cross-engine float
    // accumulation noise (~1e-13 abs) — the entropy_e4 discipline
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // recompute the raw double via the same pipeline minus rounding
    val scores = {
      import org.apache.spark.sql.functions._
      val toksC = corpus.select(explode(split(col("text"), " ")).as("tok"))
      val uni = toksC.groupBy(col("tok")).agg(count(lit(1)).as("ca"))
      val vocab = toksC.agg(countDistinct(col("tok")).as("v"))
      val wcol = split(col("text"), " ")
      val grams = corpus.select(col("doc_id"),
          slice(wcol, lit(1), greatest(size(wcol) - 1, lit(0))).as("a"),
          slice(wcol, lit(2), greatest(size(wcol) - 1, lit(0))).as("b"))
        .select(col("doc_id"), explode(arrays_zip(col("a"), col("b"))).as("p"))
        .select(col("doc_id"), col("p.a").as("tok"), concat_ws(" ", col("p.a"), col("p.b")).as("g"))
      val bi = grams.groupBy(col("g")).agg(count(lit(1)).as("cab"))
      grams.join(bi, Seq("g")).join(uni, Seq("tok")).crossJoin(broadcast(vocab))
        .groupBy(col("doc_id"))
        .agg(sum(log((col("cab") + 1).cast("double") / (col("ca") + col("v")).cast("double"))).as("s"))
        .select(col("s")).collect().map(_.getDouble(0))
    }
    val minMargin = scores.map { s =>
      val x = math.abs(s * 10000)
      math.abs(x - math.floor(x) - 0.5)
    }.min
    info(f"min distance to an e4 half-boundary: $minMargin%.3e over ${scores.length} docs")
    assert(minMargin > 1e-9, f"half-boundary margin $minMargin%.3e too small for e4 rounding")
  }
}
