package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-phase sessionization must equal the one-shot window form for every
  * bucket size — including adversarial sessions straddling bucket edges.
  */
class SessionizeTwoPhaseSpec extends AnyFunSuite with SparkSpec {

  private val GapNs = 30L * 60 * 1_000_000_000L // 30 min

  test("equals the one-shot ev_sessions on the harness events, multiple bucket sizes") {
    val dir = "/root/testdata/sf0.001"
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_id", "n_events", "start_s", "sess_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          math.round(r.getDouble(4) * 100))).sortBy(identity).toSeq
    val oneShot = canon(graft.SparkEntry.queries("ev_sessions")(spark, dir))
    for (bucketH <- Seq(1L, 6L, 24L)) {
      val two = canon(Sessionize.twoPhase(
        graft.T.events(spark, dir), GapNs, bucketH * 3600 * 1_000_000_000L))
      assert(two === oneShot, s"bucket ${bucketH}h")
    }
  }

  test("adversarial bucket straddling: one session split across 3 buckets re-merges") {
    import spark.implicits._
    val bucketNs = 1000L
    // events 400ns apart crossing two bucket edges: one true session;
    // plus a second session separated by > gap; gap = 500ns
    val ev = Seq(
      (1L, 800L, 1L, 1.0), (1L, 1200L, 2L, 1.0), (1L, 1600L, 3L, 1.0),
      (1L, 2000L, 4L, 1.0), (1L, 2400L, 5L, 1.0),
      (1L, 9000L, 6L, 2.0), // new session
      (2L, 950L, 7L, 5.0), (2L, 1050L, 8L, 5.0), // straddles one edge
    ).toDF("user_id", "ts_ns", "event_id", "value")
    val out = Sessionize.twoPhase(ev, gapNs = 500L, bucketNs = bucketNs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((1L, 1L, 5L), (1L, 2L, 1L), (2L, 1L, 2L)))
  }
}
