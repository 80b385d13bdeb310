package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained-BPE contract: deterministic training (count order, code-point
  * tie-break, min-pair-count stop), left-to-right non-overlapping
  * application in training order, and the codegen'd expression matching
  * the kernel.
  */
class BpeSpec extends AnyFunSuite with SparkSpec {

  test("training merges in count order with lexicographic tie-break") {
    // freq: "abab" x3 -> (a,b)=6, (b,a)=3; "cd" x4 -> (c,d)=4
    val m = Bpe.train(Seq(("abab", 3L), ("cd", 4L)), numMerges = 3)
    // round 1: (a,b)=6 wins; round 2: "ab ab" gives (ab,ab)=3, (c,d)=4 -> (c,d);
    // round 3: (ab,ab)=3 -> merge; round 4 would find nothing >= 2
    assert(m.merges === IndexedSeq(("a", "b"), ("c", "d"), ("ab", "ab")))
    assert(m.tokenCount("abab") === 1)
    assert(m.tokenCount("cd") === 1)
    assert(m.tokenCount("abcd") === 2) // ab + cd
    assert(m.tokenCount("xyz") === 3)  // untouched symbols
  }

  test("ties break by code-point order of a then b") {
    // (a,a) and (b,b) both count 2 -> (a,a) first
    val m = Bpe.train(Seq(("aa", 2L), ("bb", 2L)), numMerges = 1)
    assert(m.merges === IndexedSeq(("a", "a")))
  }

  test("stop below minPairCount: a once-seen pair never merges") {
    val m = Bpe.train(Seq(("xy", 1L)), numMerges = 5)
    assert(m.merges.isEmpty)
    assert(m.tokenCount("xy") === 2)
  }

  test("left-to-right non-overlapping: aaa with (a,a) gives [aa, a]") {
    val segs = Bpe.applyMerges("aaa", IndexedSeq(("a", "a")))
    assert(segs.toSeq === Seq("aa", "a"))
    // and the overlap chain: aaaa -> [aa, aa] -> with (aa,aa) -> [aaaa]
    val segs2 = Bpe.applyMerges("aaaa", IndexedSeq(("a", "a"), ("aa", "aa")))
    assert(segs2.toSeq === Seq("aaaa"))
  }

  test("countText splits on spaces, skipping empties") {
    import org.apache.spark.unsafe.types.UTF8String
    val m = Bpe.BpeModel(IndexedSeq(("a", "b")))
    assert(Bpe.countText(UTF8String.fromString("ab  ab "), m) === 2L)
    assert(Bpe.countText(UTF8String.fromString(""), m) === 0L)
    assert(Bpe.countText(UTF8String.fromString("   "), m) === 0L)
  }

  test("code-point compare orders supplementary chars after BMP (UTF-8 order)") {
    // U+1F600 (surrogate pair in UTF-16) must sort AFTER U+FFFD
    assert(Bpe.cpCompare(new String(Character.toChars(0x1F600)), "�") > 0)
    assert(Bpe.cpCompare("a", "ab") < 0)
    assert(Bpe.cpCompare("ab", "ab") === 0)
  }

  test("expression matches the kernel on a DataFrame and is codegen'd") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.T(spark, "/root/testdata/sf0.001", "documents")
    val model = Bpe.trainOnDocs(docs, numMerges = 16)
    assert(model.merges.size === 16)
    val got = docs
      .select($"doc_id", $"text",
        graft.functions.GraftFunctions.bpeCount($"text", model).as("n"))
      .collect()
    got.foreach { r =>
      val expected = r.getString(1).split(" ").filter(_.nonEmpty)
        .map(w => Bpe.applyMerges(w, model.merges).length.toLong).sum
      assert(r.getLong(2) === expected, s"doc ${r.getLong(0)}")
    }
    // whole-stage codegen must cover the projection (no CodegenFallback)
    val plan = docs.select(
      graft.functions.GraftFunctions.bpeCount($"text", model).as("n"))
      .queryExecution.executedPlan
    val inCodegen = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.collect { case p: org.apache.spark.sql.execution.ProjectExec => p }.nonEmpty => w
    }
    assert(inCodegen.nonEmpty, plan.toString)
  }

  test("segment stream preserves word order and concatenates back to the text") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.T(spark, "/root/testdata/sf0.001", "documents")
    val model = Bpe.trainOnDocs(docs, numMerges = 16)
    val rows = docs.limit(50)
      .select($"text",
        graft.functions.GraftFunctions.bpeSegment($"text", model).as("toks"),
        graft.functions.GraftFunctions.bpeCount($"text", model).as("n"))
      .collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](1)
      // stream length == the count expression (same kernel family)
      assert(toks.length.toLong === r.getLong(2))
      // concatenating the subwords reconstructs the text minus spaces:
      // segmentation never drops, duplicates, or reorders a character
      assert(toks.mkString === r.getString(0).replace(" ", ""))
    }
  }

  test("trained counts never exceed character counts and shrink with merges") {
    val docs = graft.T(spark, "/root/testdata/sf0.001", "documents")
    val m0 = Bpe.trainOnDocs(docs, numMerges = 0)
    val m48 = Bpe.trainOnDocs(docs, numMerges = 48)
    val words = docs.select(explode(split(col("text"), " "))).distinct()
      .collect().map(_.getString(0)).filter(_.nonEmpty)
    words.foreach { w =>
      val chars = Bpe.toSymbols(w).length
      assert(m0.tokenCount(w) === chars)
      assert(m48.tokenCount(w) <= chars)
      assert(m48.tokenCount(w) >= 1)
    }
    // the corpus has repeated words, so 48 merges must compress SOMETHING
    assert(words.map(m48.tokenCount).sum < words.map(m0.tokenCount).sum)
  }

  test("trainFast reproduces the naive trainer exactly, at several table sizes") {
    // word-frequency tables with ties, overlaps ("aaa"), and shared parts
    val wf1 = Seq("aaa" -> 3L, "aab" -> 2L, "abab" -> 2L, "banana" -> 5L,
      "bandana" -> 1L, "cocoa" -> 4L, "cococo" -> 2L)
    for (n <- Seq(0, 1, 5, 50)) {
      assert(Bpe.trainFast(wf1, n).merges === Bpe.train(wf1, n).merges, s"wf1 n=$n")
    }
    // the synthetic byte-level corpus at a few hundred merges
    val wf2 = ByteBpe.trainingText(nDocs = 60, vocabRanks = 400)
      .flatMap(ByteBpe.preTokenize)
      .groupBy(identity).view.map { case (w, occ) => (ByteBpe.mapBytes(w), occ.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(Bpe.trainFast(wf2, 300).merges === Bpe.train(wf2, 300).merges)
    // exhaustion point agrees too
    val fastAll = Bpe.trainFast(wf2, 1000000)
    assert(fastAll.merges === Bpe.train(wf2, 1000000).merges)
  }

  test("rank-based segment == sequential replay on the frozen 4096 and 32k tables") {
    val docs = graft.T(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).collect().map(_.getString(0))
    val extra = Seq("ererer inin stst banana", "caf\u00e9 d\u00e9j\u00e0 \u00fcber", "a1b2 42  x!?;")
    for (model <- Seq(ByteBpe.frozenModel, ByteBpe.frozenModelV3)) {
      (docs.take(60) ++ extra).foreach { text =>
        ByteBpe.preTokenize(text).foreach { w =>
          val mapped = ByteBpe.mapBytes(w)
          assert(model.segment(mapped).toSeq === Bpe.applyMerges(mapped, model.merges).toSeq,
            s"word '$w' (${model.merges.size} merges)")
        }
      }
    }
  }

  test("segment -> detok is the identity on every corpus text") {
    val docs = graft.T(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).collect().map(_.getString(0))
    docs.foreach { text =>
      val toks = ByteBpe.preTokenize(text)
        .flatMap(w => ByteBpe.frozenModelV3.segment(ByteBpe.mapBytes(w)))
      assert(ByteBpe.unmap(toks.mkString) === text)
    }
  }
}
