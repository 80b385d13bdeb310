package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level frozen-BPE tokenizer: mapping bijectivity, pre-tokenizer
  * cross-engine parity cases, frozen-fixture integrity, kernel-vs-model
  * agreement, and the non-ASCII byte-level fallback the verdict asked to
  * spec-test.
  */
class ByteBpeSpec extends AnyFunSuite with SparkSpec {

  test("byteChar/charByte is a bijection over all 256 bytes, control-free") {
    val mapped = (0 until 256).map(ByteBpe.byteChar)
    assert(mapped.distinct.size === 256)
    // no mapped symbol is a control char — the oracle's chr(30)/chr(31)
    // framing can never collide with a symbol
    assert(mapped.forall(c => !Character.isISOControl(c)), "control char leaked into the alphabet")
    (0 until 256).foreach(b => assert(ByteBpe.charByte(ByteBpe.byteChar(b)) === b))
    // printable ASCII is itself; space is the GPT-2 visible 0x120
    assert(ByteBpe.byteChar('a') === 'a')
    assert(ByteBpe.byteChar(' ') === 0x120.toChar)
  }

  test("mapBytes/unmap round-trips ASCII, multi-byte UTF-8, and control bytes") {
    for (s <- Seq("hello", "café", "naïve déjà", "a\tb\nc", "'quoted' (x)", "", "über"))
      assert(ByteBpe.unmap(ByteBpe.mapBytes(s)) === s)
    // é is TWO base symbols (UTF-8 0xC3 0xA9), the byte-level contract
    assert(ByteBpe.mapBytes("é").length === 2)
    assert(ByteBpe.mapBytes("é").toSeq === Seq(0x1c3.toChar, 0x1a9.toChar))
  }

  test("preTokenize: the cross-engine parity cases (leftmost-first, explicit whitespace)") {
    // expectations were produced by DuckDB's RE2 regexp_extract_all on
    // the same pattern — this pins the Java side to the same answers
    val cases = Seq(
      "don't stop, really!?  two  spaces" ->
        Seq("don", "'", "t", " stop", ",", " really", "!?", "  ", "two", "  ", "spaces"),
      "café naïve 12345 x2y2" ->
        Seq("caf", "é", " na", "ï", "ve", " 12345", " x", "2", "y", "2"),
      " leading" -> Seq(" leading"),
      "trail " -> Seq("trail", " "),
      "a\tb\nc" -> Seq("a", "\t", "b", "\n", "c"),
      "" -> Seq(),
      "...---..." -> Seq("...---..."),
      "it's 'quoted' (x)" ->
        Seq("it", "'", "s", " '", "quoted", "'", " (", "x", ")"),
    )
    for ((text, expect) <- cases)
      assert(ByteBpe.preTokenize(text) === expect, s"on ${text.replace("\n", "\\n")}")
  }

  test("frozen fixture: 4096 merges, constituents well-formed") {
    val m = ByteBpe.frozenModel
    assert(m.merges.size === 4096)
    // every merge's symbols are in the mapped alphabet (round-trippable)
    m.merges.take(200).foreach { case (a, b) =>
      assert(a.nonEmpty && b.nonEmpty)
      ByteBpe.unmap(a); ByteBpe.unmap(b) // throws on a non-alphabet char
    }
    // the trainer is deterministic: retraining the first merges from the
    // synthetic corpus reproduces the committed fixture's head
    val retrained = {
      val wf = ByteBpe.trainingText().flatMap(ByteBpe.preTokenize)
        .groupBy(identity).view.map { case (w, occ) => (ByteBpe.mapBytes(w), occ.size.toLong) }
        .toSeq.sortBy(_._1)
      Bpe.train(wf, 16, minPairCount = 2L)
    }
    assert(retrained.merges === m.merges.take(16))
  }

  test("countText == per-pre-token applyMerges over the frozen table, incl. non-ASCII") {
    val model = ByteBpe.frozenModel
    for (text <- Seq(
        "the quick brown fox", "Don't stop -- really!? 12345",
        "café naïve  double  spaced", "", "   ", "x2y2 banana aaaa")) {
      val expect = ByteBpe.preTokenize(text)
        .map(w => Bpe.applyMerges(ByteBpe.mapBytes(w), model.merges).length.toLong).sum
      assert(ByteBpe.countText(UTF8String.fromString(text), model) === expect, s"on '$text'")
      // segments concatenate back to the mapped pre-token stream
      val segs = ByteBpe.segmentText(UTF8String.fromString(text), model)
      val joined = (0 until segs.numElements()).map(i => segs.getUTF8String(i).toString).mkString
      assert(joined === ByteBpe.preTokenize(text).map(ByteBpe.mapBytes).mkString, s"on '$text'")
    }
    // bounds: at least one token per pre-token, at most one per byte
    val t = "señor über crème brûlée 42!"
    val n = ByteBpe.countText(UTF8String.fromString(t), model)
    assert(n >= ByteBpe.preTokenize(t).size)
    assert(n <= t.getBytes("UTF-8").length)
  }

  test("expressions match the kernel on a DataFrame and run codegen'd") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.T(spark, "/root/testdata/sf0.001", "documents")
    val model = ByteBpe.frozenModel
    val got = docs.select($"doc_id", $"text",
      graft.functions.GraftFunctions.byteBpeCount($"text").as("n"),
      graft.functions.GraftFunctions.byteBpeSegment($"text").as("toks"))
      .collect()
    got.foreach { r =>
      val expected = ByteBpe.countText(UTF8String.fromString(r.getString(1)), model)
      assert(r.getLong(2) === expected, s"doc ${r.getLong(0)}")
      assert(r.getSeq[String](3).size.toLong === expected)
    }
    val plan = docs.select(graft.functions.GraftFunctions.byteBpeCount($"text"))
      .queryExecution.executedPlan
    val inCodegen = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.collect { case p: org.apache.spark.sql.execution.ProjectExec => p }.nonEmpty => w
    }
    assert(inCodegen.nonEmpty, plan.toString)
  }
}
