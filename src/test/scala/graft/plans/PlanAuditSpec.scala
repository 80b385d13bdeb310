package graft.plans

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The mechanized plan gate: [[PlanAudit.shuffleExchanges]] must agree
  * with every pin on the LIVE registered queries — the same counter and
  * the same query builders [[graft.Bench]] runs per-round, so a plan
  * regression fails here first and in the bench artifact second.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every pinned query plans its pinned exchange count") {
    // cached plans from other suites substitute InMemoryRelations and
    // erase exchanges — measure the plans the fresh Bench JVM would see
    spark.catalog.clearCache()
    val qs = graft.SparkEntry.queries
    val measured = PlanAudit.pinnedExchanges.keys.toSeq.sorted.map { name =>
      assert(qs.contains(name), s"pinned query $name is not registered")
      name -> PlanAudit.shuffleExchanges(qs(name)(spark, dir))
    }
    assert(measured.toMap === PlanAudit.pinnedExchanges)
  }

  test("every pinned shape holds on the live registered queries") {
    spark.catalog.clearCache()
    val qs = graft.SparkEntry.queries
    PlanAudit.pinnedShapes.toSeq.sortBy(_._1).foreach { case (name, check) =>
      assert(qs.contains(name), s"shape-pinned query $name is not registered")
      val s = check(qs(name)(spark, dir))
      assert(s.ok, s"$name shape pin failed: ${s.detail}")
    }
  }

  test("broadcastAntiShape distinguishes broadcast from shuffled anti-joins") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val b = (1 to 10).map(i => i.toLong).toDF("k")
    val good = a.join(org.apache.spark.sql.functions.broadcast(b), Seq("k"), "left_anti")
    assert(PlanAudit.broadcastAntiShape(good).ok)
    val bad = a.join(b.hint("merge"), Seq("k"), "left_anti")
    val s = PlanAudit.broadcastAntiShape(bad)
    assert(!s.ok, s.detail)
  }

  test("counter sees exchanges string parsing would: join + agg shapes") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i, i % 7)).toDF("k", "g")
    val b = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
    // narrow scan: zero
    assert(PlanAudit.shuffleExchanges(a.select($"k" + 1 as "k1")) === 0)
    // hash aggregate: one exchange between partial and final
    assert(PlanAudit.shuffleExchanges(a.groupBy("g").count()) === 1)
    // sort-merge join with broadcast disabled: two (one per side)
    val smj = a.hint("merge").join(b, "k")
    assert(PlanAudit.shuffleExchanges(smj) === 2)
    // broadcast join: zero shuffle exchanges (broadcast is not a shuffle)
    val bj = a.join(org.apache.spark.sql.functions.broadcast(b), "k")
    assert(PlanAudit.shuffleExchanges(bj) === 0)
  }
}
