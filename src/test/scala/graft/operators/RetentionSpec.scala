package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Cohort-retention semantics: cohort = first-event period; a user counts
  * once per active period; offsets are relative to the cohort.
  */
class RetentionSpec extends AnyFunSuite with SparkSpec {

  test("cohortRetention matches the hand-computed triangle") {
    import spark.implicits._
    // period length 10: user 1 first active in period 0, again in 0 and 2;
    // user 2 first in period 0 only; user 3 first in period 1, again in 2
    val events = Seq(
      (1L, 1L), (1L, 5L), (1L, 25L),
      (2L, 9L),
      (3L, 12L), (3L, 22L),
    ).toDF("user_id", "ts_ns")
    val got = Retention.cohortRetention(events, periodNs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (0L, 0L, 2L), // cohort 0: users 1 and 2
      (0L, 2L, 1L), // user 1 active two periods later (counted once)
      (1L, 0L, 1L), // cohort 1: user 3
      (1L, 1L, 1L), // user 3 active the next period
    ))
  }

  test("offset 0 always carries the full cohort; boundary nanos bucket exactly") {
    import spark.implicits._
    // 19 and 20 straddle a period boundary with integral division
    val events = Seq((1L, 19L), (1L, 20L), (2L, 20L)).toDF("user_id", "ts_ns")
    val got = Retention.cohortRetention(events, periodNs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 0L, 1L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("cohort window shuffles user_id exactly once; events never reach the rollup") {
    import spark.implicits._
    val events = Seq((1L, 1L), (1L, 25L), (2L, 9L)).toDF("user_id", "ts_ns")
    val plan = Retention.cohortRetention(events, periodNs = 10L)
      .queryExecution.executedPlan.toString
    // exactly ONE exchange partitions on user_id alone (the cohort
    // window); everything after it operates on (user, cohort, offset)
    // distinct rows — bounded by |users|·|periods|, not event volume
    val userOnly = "Exchange hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r
      .findAllIn(plan).toSeq
    assert(userOnly.size === 1, s"expected one user_id-only exchange:\n$plan")
  }

  test("negative timestamps bucket by FLOOR division, not truncation") {
    import spark.implicits._
    // ts -5 sits in period -1 ([-10, 0)), not period 0: `div` alone would
    // truncate -5/10 to 0 and merge it with the [0, 10) bucket — the
    // SQL floor-division (`//`) semantics the oracle uses must win
    val events = Seq((1L, -5L), (1L, 5L), (2L, -15L)).toDF("user_id", "ts_ns")
    val got = Retention.cohortRetention(events, periodNs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // user 1: cohort -1 (ts -5), active again in period 0 → offset 1
    // user 2: cohort -2 (ts -15)
    assert(got.toSeq === Seq((-2L, 0L, 1L), (-1L, 0L, 1L), (-1L, 1L, 1L)))
  }
}
