package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Ordered-funnel semantics: steps only count strictly after the previous
  * step's first completion; stalled funnels stop; reached_stage is the
  * non-null prefix length.
  */
class FunnelSpec extends AnyFunSuite with SparkSpec {

  test("userStages enforces strict step ordering") {
    import spark.implicits._
    val events = Seq(
      // user 1: click@5 precedes the first view@10 (doesn't count);
      // purchase@15 precedes the qualifying click@20 (doesn't count);
      // purchase@30 completes the funnel
      (1L, 5L, "click"), (1L, 10L, "view"), (1L, 15L, "purchase"),
      (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: no view at all -> funnel never starts
      (2L, 5L, "click"), (2L, 10L, "purchase"),
      // user 3: view only -> stage 1
      (3L, 10L, "view"), (3L, 20L, "purchase"),
    ).toDF("user_id", "ts_ns", "event_type")

    val got = Funnel.userStages(events, Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .collect()
      .map(r => (
        r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4)))

    assert(got.toSeq === Seq(
      (1L, Some(10L), Some(20L), Some(30L), 3L),
      (2L, None, None, None, 0L),
      (3L, Some(10L), None, None, 1L),
    ))
  }

  test("funnel plans ONE user_id exchange however many steps it has") {
    import spark.implicits._
    val events = Seq((1L, 5L, "view"), (1L, 9L, "click"), (2L, 3L, "view"))
      .toDF("user_id", "ts_ns", "event_type")
    val plan = Funnel.userStages(events, Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    // the step windows and the per-user rollup share ONE
    // hashpartitioning(user_id) exchange — funnel depth adds window
    // expressions, never shuffles, and there is no per-user event buffer
    // downstream of the window (the rollup reuses the partitioning)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(exchanges.size === 1, s"expected exactly one exchange:\n$plan")
    assert("hashpartitioning\\(user_id".r.findFirstIn(plan).isDefined, plan)
  }

  test("single-step funnel degenerates to first-occurrence") {
    import spark.implicits._
    val events = Seq((1L, 7L, "view"), (1L, 3L, "view"), (2L, 9L, "click"))
      .toDF("user_id", "ts_ns", "event_type")
    val got = Funnel.userStages(events, Seq("view")).orderBy("user_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2)))
    assert(got.toSeq === Seq((1L, Some(3L), 1L), (2L, None, 0L)))
  }
}
