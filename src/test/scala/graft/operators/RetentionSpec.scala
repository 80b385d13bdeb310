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
}
