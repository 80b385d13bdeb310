package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.TextAnalysis

/** The Misra-Gries aggregate's two order-invariant guarantees, checked
  * against brute-force counts on adversarial random streams (skewed
  * Zipf-ish alphabet so heavy hitters exist), under arbitrary
  * partition splits of the stream with partial-buffer merges — i.e. the
  * exact update/merge/serialize path Spark's ObjectHashAggregate runs.
  */
class FreqSketchSpec extends AnyFunSuite with SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  // skewed: "h0"/"h1" dominate, long tail of rares → real heavy hitters
  private val item: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("h0", "h1"),
    3 -> Gen.oneOf("m0", "m1", "m2", "m3"),
    2 -> Gen.choose(0, 500).map(i => s"t$i"),
  )
  private val stream: Gen[List[String]] = Gen.listOf(item)

  private def runSketch(parts: List[List[String]], k: Int): Map[String, Long] = {
    val agg = MisraGries(BoundReference(0, StringType, nullable = true), k)
    val partials = parts.map { part =>
      val buf = agg.createAggregationBuffer()
      part.foreach(s => agg.update(buf, InternalRow(UTF8String.fromString(s))))
      // exercise the shuffle path every time
      agg.deserialize(agg.serialize(buf))
    }
    val merged = partials.foldLeft(agg.createAggregationBuffer())(agg.merge)
    val m = agg.eval(merged).asInstanceOf[MapData]
    val keys = m.keyArray()
    val vals = m.valueArray()
    (0 until m.numElements()).map(i =>
      keys.getUTF8String(i).toString -> vals.getLong(i)).toMap
  }

  test("MG guarantees hold under arbitrary partition splits and merges") {
    val gen = for {
      xs <- stream
      k <- Gen.oneOf(1, 2, 4, 8)
      nSplit <- Gen.choose(1, 5)
      cuts <- Gen.listOfN(nSplit - 1, Gen.choose(0, math.max(xs.size, 1)))
    } yield (xs, k, cuts.sorted)
    check(Prop.forAll(gen) { case (xs, k, cuts) =>
      val bounds = (0 +: cuts) :+ xs.size
      val parts = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
      val est = runSketch(parts, k)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toLong
      val noOverestimate = est.forall { case (x, e) => e <= exact(x) && e >= 1 }
      val errorBound = est.forall { case (x, e) => (exact(x) - e) * (k + 1) <= n }
      val heavyPresent = exact.forall { case (x, c) =>
        c * (k + 1) <= n || est.contains(x)
      }
      noOverestimate && errorBound && heavyPresent
    })
  }

  test("eval output is key-sorted and capped at k entries") {
    val parts = List(List.tabulate(200)(i => s"x${i % 37}"))
    val est = runSketch(parts, 8)
    assert(est.size <= 8)
    val agg = MisraGries(BoundReference(0, StringType, nullable = true), 8)
    val buf = agg.createAggregationBuffer()
    parts.head.foreach(s => agg.update(buf, InternalRow(UTF8String.fromString(s))))
    val m = agg.eval(buf).asInstanceOf[MapData]
    val ks = (0 until m.numElements()).map(m.keyArray().getUTF8String(_).toString)
    assert(ks == ks.sorted)
  }

  test("freqTerms end-to-end: heavy terms present, estimates bounded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the cat sat on the mat the end", "s1"),
      (2L, "the dog the log the fog", "s1"),
      (3L, "unique words only here now", "s1"),
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.freqTerms(docs, k = 4).collect().head
    val n = out.getAs[Long]("n_tokens")
    val sketch = out.getAs[Map[String, Long]]("sketch")
    assert(n == 21L)
    // "the" appears 9 times > 21/5 → guaranteed present, est in [9-21/5, 9]
    assert(sketch.contains("the"))
    assert(sketch("the") <= 9L && (9L - sketch("the")) * 5 <= n)
    assert(sketch.size <= 4)
  }
}
