package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the repetition kernels against brute-force
  * references: on arbitrary token arrays (small alphabet, so collisions
  * and repeats are common), maxTermCount equals the true mode
  * multiplicity and maxPairCount equals the true adjacent-pair mode —
  * including the null-slot and degenerate-length corners the gate corpus
  * never exercises.
  */
class TermKernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // small alphabet + occasional nulls → dense repeats, adjacent dups
  private val tokens: Gen[List[String]] = Gen.listOf(
    Gen.frequency(9 -> Gen.oneOf("a", "b", "c", "ab", "ba", ""), 1 -> Gen.const(null)))

  private def arr(ts: List[String]): GenericArrayData =
    new GenericArrayData(ts.map {
      case null => null
      case s => UTF8String.fromString(s)
    }.toArray[Any])

  test("maxTermCount equals the brute-force mode multiplicity") {
    check(Prop.forAll(tokens) { ts =>
      val expect = ts.filter(_ != null).groupBy(identity).map(_._2.size)
        .maxOption.getOrElse(0)
      Sketches.maxTermCount(arr(ts)) == expect
    })
  }

  test("maxPairCount equals the brute-force adjacent-pair mode (null pairs skipped)") {
    check(Prop.forAll(tokens) { ts =>
      val pairs = ts.sliding(2).collect {
        case List(a, b) if a != null && b != null => (a, b)
      }.toList
      val expect = pairs.groupBy(identity).map(_._2.size).maxOption.getOrElse(0)
      Sketches.maxPairCount(arr(ts)) == expect
    })
  }
}
