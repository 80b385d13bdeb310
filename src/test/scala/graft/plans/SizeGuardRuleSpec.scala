package graft.plans

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SizeGuardRuleSpec extends AnyFunSuite with SparkSpec {

  test("queries above the byte budget are rejected before execution; unset = no-op") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SizeGuardRule(spark)
    try {
      // no budget set → everything runs
      assert(spark.range(1000).count() === 1000)

      spark.conf.set("spark.graft.maxEstimatedBytes", "64")
      val e = intercept[Exception](spark.range(1000000).selectExpr("id * 2").count())
      def admission(t: Throwable): Boolean =
        t != null && (t.isInstanceOf[GraftAdmissionException] || admission(t.getCause))
      assert(admission(e), s"expected GraftAdmissionException in cause chain, got $e")

      // tiny plan under a generous budget passes
      spark.conf.set("spark.graft.maxEstimatedBytes", (1L << 40).toString)
      assert(spark.range(10).count() === 10)
    } finally {
      spark.conf.unset("spark.graft.maxEstimatedBytes")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[SizeGuardRule])
    }
  }
}
