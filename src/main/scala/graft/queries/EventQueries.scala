package graft.queries

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table analytics (batch form of the streaming surface in
  * graft.streaming.EventStreams).
  *
  * The source timestamps are nanosecond-precision; Spark timestamps are
  * micro. All comparisons/bucketing therefore run on the raw `ts_ns` long so
  * results are bit-identical to a nanosecond-aware oracle, and outputs carry
  * epoch seconds as BIGINT, never timestamps.
  */
object EventQueries {
  private val NS_PER_HOUR = 3600L * 1000 * 1000 * 1000
  private val NS_PER_30MIN = 30L * 60 * 1000 * 1000 * 1000

  val all: Seq[Q] = Seq(
    // Tumbling 1-hour windows per event type (batch mirror of the
    // structured-streaming windowed aggregation).
    Q(
      "ev_hourly_by_type",
      (s, d) => {
        import s.implicits._
        T.events(s, d)
          .groupBy(
            $"event_type",
            // integral div, not `/`: column `/` is double division and
            // epoch-nanos exceed double's 53-bit mantissa (≈256 ns ulp),
            // which would mis-bucket events near hour boundaries.
            expr(s"(ts_ns div $NS_PER_HOUR) * 3600").as("hour_s"),
          )
          .agg(
            count(lit(1)).as("n_events"),
            // exact cents sum (order-independent; see graft.queries.Fx)
            Fx.sum2($"value").as("total_value"),
            countDistinct($"user_id").as("n_users"),
          )
          .orderBy($"event_type", $"hour_s")
      },
      Some("""
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
               COUNT(*) AS n_events,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2 ORDER BY event_type, hour_s
      """),
    ),
    // Sessionization: a new session starts after a >30 min gap per user.
    // lag + running-sum windows partitioned by user_id — scales as a single
    // shuffle on user_id regardless of total event volume.
    Q(
      "ev_sessions",
      (s, d) => {
        import s.implicits._
        val byUser = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
        T.events(s, d)
          .withColumn("prev_ns", lag($"ts_ns", 1).over(byUser))
          .withColumn(
            "new_sess",
            when($"prev_ns".isNull || $"ts_ns" - $"prev_ns" > NS_PER_30MIN, 1L).otherwise(0L),
          )
          .withColumn("session_id", sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"session_id")
          .agg(
            count(lit(1)).as("n_events"),
            expr("min(ts_ns) div 1000000000").as("start_s"),
            Fx.sum2($"value").as("sess_value"),
          )
          .orderBy($"user_id", $"session_id")
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts, value,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS start_s,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sess_value
        FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_id
      """),
    ),
    // Same sessions through the skew-resistant TWO-PHASE plan
    // (operators/Sessionize): phase 1 bounds per-task load by
    // (user, 6h bucket), phase 2 merges boundary sessions over the far
    // smaller session table. Shares ev_sessions' oracle verbatim —
    // identical semantics, different (100 TB heavy-hitter-safe) shape.
    Q(
      "ev_sessions_twophase",
      (s, d) =>
        graft.operators.Sessionize.twoPhase(
          T.events(s, d),
          gapNs = NS_PER_30MIN,
          bucketNs = 6L * 3600 * 1000 * 1000 * 1000),
      Some("""
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts, value,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS start_s,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sess_value
        FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_id
      """),
    ),
    // The BUILT-IN session-window form (Catalyst's SessionWindow node —
    // also the streaming-native formulation): same 30-min-gap sessions,
    // keyed by (user, window start) instead of ordinal ids. Third batch
    // face of the same semantics (window-function, two-phase, built-in),
    // one oracle family.
    // NOTE: session_window gaps are MICROSECOND-resolution (timestamp
    // arithmetic), so the oracle compares on the micro-truncated ts too —
    // a >gap ns-gap that rounds to exactly gap µs is one session here and
    // the window-function forms above stay on raw ns deliberately.
    Q(
      "ev_session_window",
      (s, d) => {
        import s.implicits._
        T.events(s, d)
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
          .agg(
            count(lit(1)).as("n_events"),
            Fx.sum2($"value").as("sess_value"),
          )
          .select(
            $"user_id",
            unix_timestamp($"w.start").as("start_s"),
            $"n_events",
            $"sess_value",
          )
          .orderBy($"user_id", $"start_s")
      },
      Some("""
        WITH e AS (
          SELECT user_id, value, epoch_us(ts) AS tus, event_id FROM events
        ), flagged AS (
          SELECT user_id, tus, value, event_id,
                 CASE WHEN LAG(tus) OVER w IS NULL
                        OR tus - LAG(tus) OVER w >= 30 * 60 * 1000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        ), sessions AS (
          SELECT user_id, tus, value,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged
        )
        SELECT user_id, MIN(tus) // 1000000 AS start_s, COUNT(*) AS n_events,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sess_value
        FROM sessions GROUP BY user_id, sid ORDER BY user_id, start_s
      """),
    ),
    // Semi-structured extraction from the props JSON payload via regex
    // (portable across engines), aggregated per event type.
    Q(
      "ev_props_extract",
      (s, d) => {
        import s.implicits._
        T.events(s, d)
          .withColumn("k", regexp_extract($"props", "\"k\":\\s*(\\d+)", 1).cast("bigint"))
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n_events"),
            // exact int sum / count: deterministic double, no ROUND(x, d)
            (sum($"k").cast("double") / count($"k")).as("avg_k"),
            max($"k").as("max_k"),
          )
          .orderBy($"event_type")
      },
      Some("""
        WITH e AS (
          SELECT event_type, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
          FROM events
        )
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k,
               MAX(k) AS max_k
        FROM e GROUP BY event_type ORDER BY event_type
      """),
    ),
    // As-of join: for every event, the user's most recent purchase at or
    // before it (graft.operators.AsOfJoin — union-tag + one window, a
    // single shuffle on user_id at any scale). Oracle = DuckDB's native
    // ASOF LEFT JOIN. Lags summed with integral ns division per row.
    Q(
      "ev_asof_last_purchase",
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts_ns".as("p_ts")).distinct()
        graft.operators.AsOfJoin
          .lastAtOrBefore(ev, purchases, Seq("user_id"), "ts_ns", "p_ts", Seq.empty)
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n_events"),
            count($"matched_ts").as("n_matched"),
            coalesce(sum(expr("(ts_ns - matched_ts) div 1000000000")), lit(0L)).as("sum_lag_s"),
          )
          .orderBy($"event_type")
      },
      Some("""
        WITH p AS (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'purchase'),
        j AS (
          SELECT e.event_type, epoch_ns(e.ts) AS ets, epoch_ns(p.ts) AS pts
          FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
        )
        SELECT event_type, COUNT(*) AS n_events, COUNT(pts) AS n_matched,
               CAST(COALESCE(SUM((ets - pts) // 1000000000), 0) AS BIGINT) AS sum_lag_s
        FROM j GROUP BY 1 ORDER BY event_type
      """),
    ),
    // Time-series resampling with forward fill: each user's events onto a
    // dense hourly grid between their first and last activity — gap slots
    // carry the last observed value forward. The grid explodes from
    // per-user (lo, hi) bounds (never a cross join with a calendar
    // table); the fill is one user-partitioned window over grid rows
    // (users × span/granularity ≪ events at production granularities).
    // In-slot "last" is deterministic via (ts, event_id) struct max.
    Q(
      "ev_resample_hourly_ffill",
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d).filter($"user_id" < 10)
          .withColumn("slot", expr(s"ts_ns div $NS_PER_HOUR"))
        val slots = ev.groupBy($"user_id", $"slot")
          .agg(
            count(lit(1)).as("n_events"),
            max(struct($"ts_ns", $"event_id", $"value")).as("last_ev"))
          .select($"user_id", $"slot", $"n_events", $"last_ev.value".as("v"))
        val grid = ev.groupBy($"user_id").agg(min($"slot").as("lo"), max($"slot").as("hi"))
          .select($"user_id", explode(sequence($"lo", $"hi")).as("slot"))
        val w = Window.partitionBy($"user_id").orderBy($"slot")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(slots, Seq("user_id", "slot"), "left")
          .select(
            $"user_id",
            ($"slot" * 3600).as("slot_s"),
            coalesce($"n_events", lit(0L)).as("n_events"),
            last($"v", ignoreNulls = true).over(w).as("last_value"),
          )
          .orderBy($"user_id", $"slot_s")
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 3600000000000 AS slot, epoch_ns(ts) AS tns, event_id, value
          FROM events WHERE user_id < 10
        ), r AS (
          SELECT user_id, slot, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, slot
                                    ORDER BY tns DESC, event_id DESC) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id, slot) AS n_events
          FROM e
        ), sl AS (
          SELECT user_id, slot, n_events, value AS v FROM r WHERE rn = 1
        ), b AS (
          SELECT user_id, MIN(slot) AS lo, MAX(slot) AS hi FROM e GROUP BY 1
        ), g AS (
          SELECT user_id, unnest(generate_series(lo, hi)) AS slot FROM b
        )
        SELECT g.user_id, g.slot * 3600 AS slot_s,
               COALESCE(sl.n_events, 0) AS n_events,
               LAST_VALUE(sl.v IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.slot
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_value
        FROM g LEFT JOIN sl ON g.user_id = sl.user_id AND g.slot = sl.slot
        ORDER BY g.user_id, slot_s
      """),
    ),
    // Forward as-of: time TO the NEXT purchase per event type — the
    // mirror of ev_asof_last_purchase through the same single-shuffle
    // union-tag plan traversed in descending timestamp order.
    Q(
      "ev_asof_next_purchase",
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts_ns".as("p_ts")).distinct()
        graft.operators.AsOfJoin
          .firstAtOrAfter(ev, purchases, Seq("user_id"), "ts_ns", "p_ts", Seq.empty)
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n_events"),
            count($"matched_ts").as("n_matched"),
            coalesce(sum(expr("(matched_ts - ts_ns) div 1000000000")), lit(0L)).as("sum_lead_s"),
          )
          .orderBy($"event_type")
      },
      Some("""
        WITH p AS (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'purchase'),
        j AS (
          SELECT e.event_type, epoch_ns(e.ts) AS ets, epoch_ns(p.ts) AS pts
          FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts
        )
        SELECT event_type, COUNT(*) AS n_events, COUNT(pts) AS n_matched,
               CAST(COALESCE(SUM((pts - ets) // 1000000000), 0) AS BIGINT) AS sum_lead_s
        FROM j GROUP BY 1 ORDER BY event_type
      """),
    ),
    // Sketch surface: HyperLogLog++ distinct-user counts gated against the
    // exact count with a relative-error tolerance. approx_count_distinct's
    // 100 TB value is dropping q3-style Expand+double-agg exchanges; this
    // query makes the sketch's accuracy contract oracle-checkable (the
    // boolean is deterministic: HLL++ is deterministic given the data).
    Q(
      "ev_hll_users",
      (s, d) => {
        import s.implicits._
        T.events(s, d)
          .groupBy($"event_type")
          .agg(
            countDistinct($"user_id").as("n_users"),
            approx_count_distinct($"user_id", 0.02).as("n_approx"),
          )
          .select(
            $"event_type",
            $"n_users",
            (abs($"n_approx" - $"n_users") <= $"n_users" * 0.05).as("hll_within_5pct"),
          )
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, true AS hll_within_5pct
        FROM events GROUP BY event_type ORDER BY event_type
      """),
    ),
    // Quantile sketch gate, same contract as ev_hll_users: exact
    // percentiles (a full sort / Expand at scale) are the oracle face;
    // the KLL-style approx_percentile sketch — the bounded-memory shape
    // that replaces the global sort at 100 TB — must land inside the
    // ±0.01 RANK band around each target, checked against the exact
    // percentiles at p±0.01. approx_percentile(accuracy=10000) guarantees
    // rank error <= n/10000, far inside the n/100 band, so the boolean is
    // deterministic; a value-relative tolerance would be wrong for
    // distributions with mass near zero.
    Q(
      "ev_value_quantiles",
      (s, d) => {
        import s.implicits._
        T.events(s, d)
          .groupBy($"event_type")
          .agg(
            expr("percentile(value, array(0.49D, 0.5D, 0.51D, 0.94D, 0.95D, 0.96D))")
              .as("ex"),
            expr("approx_percentile(value, array(0.5D, 0.95D), 10000)").as("ap"),
          )
          .select(
            $"event_type",
            // Fx discipline: never ROUND(x, d>0) on a hash-compared double —
            // emit e6 integer units via ONE scale-0 round, which is
            // bit-identical cross-engine on the same interpolated double
            // (see Fx.scala's q15 lesson).
            Fx.units($"ex"(1), 6).as("p50_e6"),
            Fx.units($"ex"(4), 6).as("p95_e6"),
            ($"ap"(0) >= $"ex"(0) && $"ap"(0) <= $"ex"(2)).as("p50_sketch_in_band"),
            ($"ap"(1) >= $"ex"(3) && $"ap"(1) <= $"ex"(5)).as("p95_sketch_in_band"),
          )
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type,
               CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value) * 1000000) AS BIGINT) AS p50_e6,
               CAST(ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY value) * 1000000) AS BIGINT) AS p95_e6,
               true AS p50_sketch_in_band,
               true AS p95_sketch_in_band
        FROM events GROUP BY event_type ORDER BY event_type
      """),
    ),
    // JSON-function extraction (the typed twin of the regex form above):
    // get_json_object / DuckDB json_extract over the props payload.
    Q(
      "ev_props_json",
      (s, d) => {
        import s.implicits._
        T.events(s, d)
          .withColumn("k", get_json_object($"props", "$.k").cast("bigint"))
          .groupBy($"event_type")
          .agg(
            count($"k").as("n_with_k"),
            sum($"k").as("sum_k"),
            max($"k").as("max_k"),
          )
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type,
               COUNT(CAST(props->>'k' AS BIGINT)) AS n_with_k,
               CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
               MAX(CAST(props->>'k' AS BIGINT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type
      """),
    ),
    // User funnel: per user first/last event epoch, event-type breadth.
    Q(
      "ev_user_profile",
      (s, d) => {
        import s.implicits._
        T.events(s, d)
          .groupBy($"user_id")
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct($"event_type").as("n_types"),
            expr("min(ts_ns) div 1000000000").as("first_s"),
            expr("max(ts_ns) div 1000000000").as("last_s"),
            Fx.sum2(when($"event_type" === "purchase", $"value").otherwise(0.0)).as("purchase_value"),
          )
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id, COUNT(*) AS n_events,
               COUNT(DISTINCT event_type) AS n_types,
               CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS first_s,
               CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS last_s,
               SUM(CAST(ROUND(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END * 100) AS BIGINT)) / 100.0 AS purchase_value
        FROM events GROUP BY user_id ORDER BY user_id
      """),
    ),
    // Interval-join attribution (batch face of the stream-stream join in
    // streaming/EventStreams.attributedPurchases): each purchase left-
    // joined to the same user's views in the preceding hour. One shuffle
    // on user_id; per-purchase candidate views bounded by the interval —
    // the state-bounded shape Structured Streaming requires, verified
    // here against a plain SQL interval join.
    Q(
      "ev_view_attribution",
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d)
        val v = ev.filter($"event_type" === "view")
          .select($"user_id".as("v_user"), $"ts_ns".as("v_ns"), $"event_id".as("view_id"))
        val p = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts_ns".as("p_ns"), $"event_id".as("p_id"))
        p.join(
            v,
            $"user_id" === $"v_user" && $"v_ns" <= $"p_ns" && $"v_ns" > $"p_ns" - NS_PER_HOUR,
            "left")
          .groupBy($"user_id", $"p_id", $"p_ns")
          .agg(count($"view_id").as("n_views"), max($"v_ns").as("max_v_ns"))
          .select(
            $"user_id", $"p_id",
            expr("p_ns div 1000000000").as("p_s"),
            $"n_views",
            coalesce(expr("max_v_ns div 1000000000"), lit(-1L)).as("last_view_s"),
          )
          .orderBy($"user_id", $"p_id")
      },
      Some("""
        WITH v AS (
          SELECT user_id, ts AS v_ts, event_id AS view_id FROM events WHERE event_type = 'view'
        ), p AS (
          SELECT user_id, ts AS p_ts, event_id AS p_id FROM events WHERE event_type = 'purchase'
        )
        SELECT p.user_id AS user_id, p.p_id,
               CAST(FLOOR(epoch(p.p_ts)) AS BIGINT) AS p_s,
               COUNT(v.view_id) AS n_views,
               COALESCE(CAST(FLOOR(epoch(MAX(v.v_ts))) AS BIGINT), -1) AS last_view_s
        FROM p LEFT JOIN v
          ON p.user_id = v.user_id AND v.v_ts <= p.p_ts AND v.v_ts > p.p_ts - INTERVAL 1 HOUR
        GROUP BY 1, 2, p.p_ts ORDER BY p.user_id, p_id
      """),
    ),
    // Salted skew-join (operators/SkewJoin): events fact joined to the
    // customer dim on a deliberately salted key, then rolled up by market
    // segment. The salt spreads each hot user's rows across saltFactor
    // reducers; the oracle is a PLAIN SQL join — proving the salted plan
    // is semantically invisible (identical output), which is the whole
    // point of the technique at 100 TB.
    Q(
      "ev_salted_segment_rollup",
      (s, d) => {
        import s.implicits._
        val events = T.events(s, d).select($"user_id", $"event_type", $"value")
        val dim = T(s, d, "customer")
          .select($"c_custkey".as("user_id"), $"c_mktsegment".as("segment"))
        graft.operators.SkewJoin.saltedInnerJoin(events, dim, "user_id", saltFactor = 8)
          .groupBy($"segment")
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct($"user_id").as("n_users"),
            Fx.sum2($"value").as("total_value"),
          )
          .orderBy($"segment")
      },
      Some("""
        SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users,
               SUM(CAST(ROUND(e.value * 100) AS BIGINT)) / 100.0 AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY segment
      """),
    ),
    // Streaming exactly-once dedup (streaming/EventStreams
    // .dedupWithinWatermark): the events feed is doubled (simulated
    // at-least-once redelivery), then deduped by event_id through the SAME
    // function the streaming path uses (dropDuplicatesWithinWatermark —
    // state bounded by the watermark horizon, not stream lifetime). The
    // oracle aggregates the ORIGINAL single-delivery table: dedup must
    // restore it exactly.
    Q(
      "ev_stream_dedup",
      (s, d) => {
        import s.implicits._
        val events = T.events(s, d)
          .select($"event_id", $"ts", $"ts_ns", $"event_type", $"user_id", $"value")
        val atLeastOnce = events.unionAll(events)
        graft.streaming.EventStreams.dedupWithinWatermark(atLeastOnce)
          .groupBy(
            $"event_type",
            expr(s"(ts_ns div $NS_PER_HOUR) * 3600").as("hour_s"),
          )
          .agg(
            count(lit(1)).as("n_events"),
            Fx.sum2($"value").as("total_value"),
            countDistinct($"user_id").as("n_users"),
          )
          .orderBy($"event_type", $"hour_s")
      },
      Some("""
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
               COUNT(*) AS n_events,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2 ORDER BY event_type, hour_s
      """),
    ),
    // Ordered funnel (operators/Funnel): view → click → purchase, each
    // step strictly after the previous one's first completion. All steps
    // are min-over-user windows on ONE user_id partitioning — a single
    // shuffle regardless of step count; the oracle chains per-step CTE
    // joins. Null step times coalesce to -1 (house style: no nullable
    // BIGINT in hash-compared output).
    Q(
      "ev_funnel",
      (s, d) => {
        import s.implicits._
        graft.operators.Funnel.userStages(
          T.events(s, d), Seq("view", "click", "purchase"))
          .select(
            $"user_id",
            coalesce(expr("t_1 div 1000000000"), lit(-1L)).as("t1_s"),
            coalesce(expr("t_2 div 1000000000"), lit(-1L)).as("t2_s"),
            coalesce(expr("t_3 div 1000000000"), lit(-1L)).as("t3_s"),
            $"reached_stage",
          )
          .orderBy($"user_id")
      },
      Some("""
        WITH u1 AS (
          SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
          FROM events GROUP BY 1
        ), u2 AS (
          SELECT e.user_id, MIN(CASE WHEN e.event_type = 'click' AND e.ts > u1.t1 THEN e.ts END) AS t2
          FROM events e JOIN u1 USING (user_id) GROUP BY 1
        ), u3 AS (
          SELECT e.user_id, MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > u2.t2 THEN e.ts END) AS t3
          FROM events e JOIN u2 USING (user_id) GROUP BY 1
        )
        SELECT u1.user_id AS user_id,
               COALESCE(CAST(FLOOR(epoch(t1)) AS BIGINT), -1) AS t1_s,
               COALESCE(CAST(FLOOR(epoch(t2)) AS BIGINT), -1) AS t2_s,
               COALESCE(CAST(FLOOR(epoch(t3)) AS BIGINT), -1) AS t3_s,
               CAST((CASE WHEN t1 IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS reached_stage
        FROM u1 JOIN u2 USING (user_id) JOIN u3 USING (user_id)
        ORDER BY user_id
      """),
    ),
    // Cohort retention (operators/Retention): users bucketed by the 7-day
    // epoch period of their first event, counted in each later period
    // they were active. Periods are epoch buckets (origin-free integer
    // division on ts_ns — exact in both engines via epoch_ns), NOT
    // calendar weeks (week-start conventions differ across engines).
    // Single user_id shuffle for the cohort window, like ev_funnel.
    Q(
      "ev_retention",
      (s, d) =>
        graft.operators.Retention.cohortRetention(
          T.events(s, d), periodNs = 7L * 24 * 3600 * 1000 * 1000 * 1000),
      Some("""
        WITH p AS (
          SELECT user_id, epoch_ns(ts) // 604800000000000 AS period FROM events
        ), c AS (
          SELECT user_id, period, MIN(period) OVER (PARTITION BY user_id) AS cohort FROM p
        ), a AS (
          SELECT DISTINCT user_id, cohort, period - cohort AS "offset" FROM c
        )
        SELECT cohort, "offset", COUNT(*) AS n_users
        FROM a GROUP BY 1, 2 ORDER BY cohort, "offset"
      """),
    ),
    // Event-type transition matrix (first-order Markov over per-user
    // journeys): lag() over each user's (ts_ns, event_id)-ordered stream,
    // one agg on the (from, to) pair, then per-from probabilities in
    // exact 1e-6 fixed point over the tiny |types|² table. One events
    // shuffle on user_id; the probability window rides the aggregated
    // matrix, not the facts.
    Q(
      "ev_transitions",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
        val tr = T.events(s, d)
          .withColumn("from_type", lag($"event_type", 1).over(w))
          .filter($"from_type".isNotNull)
          .groupBy($"from_type", $"event_type".as("to_type"))
          .agg(count(lit(1)).as("n_trans"))
        tr.withColumn("p_e6",
            expr("(n_trans * 1000000) div sum(n_trans) over (partition by from_type)"))
          .orderBy($"from_type", $"to_type")
      },
      Some("""
        WITH seq AS (
          SELECT event_type,
                 LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS from_type
          FROM events
        ), tr AS (
          SELECT from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
          FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, n_trans,
               CAST((n_trans * 1000000) // SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS p_e6
        FROM tr ORDER BY from_type, to_type
      """),
    ),
    // MULTI-touch linear attribution — the companion to last-touch
    // ev_view_attribution: each purchase's credit splits equally across
    // every view in its 1-hour lookback, in exact 1e-6 integer credit
    // units (1000000 div n_views per view; truncation identical on
    // both engines, and the per-purchase remainder n_views·credit ≤ 1e6
    // is deliberately NOT redistributed — documented conservation
    // contract). Rollup: credited views per (user, hour).
    Q(
      "ev_attribution_linear",
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d)
        val v = ev.filter($"event_type" === "view")
          .select($"user_id".as("v_user"), $"ts_ns".as("v_ns"), $"event_id".as("view_id"))
        val p = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts_ns".as("p_ns"), $"event_id".as("p_id"))
        val joined = p.join(v,
          $"user_id" === $"v_user" && $"v_ns" <= $"p_ns" && $"v_ns" > $"p_ns" - NS_PER_HOUR)
        val credited = joined
          .withColumn("n_views",
            count(lit(1)).over(Window.partitionBy($"p_id")))
          .withColumn("credit_e6", expr("1000000 div n_views"))
        credited
          .groupBy($"user_id",
            expr(s"(v_ns div $NS_PER_HOUR) * 3600").as("view_hour_s"))
          .agg(count(lit(1)).as("n_credited_views"),
            sum($"credit_e6").as("credit_e6_total"))
          .orderBy($"user_id", $"view_hour_s")
      },
      Some("""
        WITH v AS (
          SELECT user_id AS v_user, epoch_ns(ts) AS v_ns, event_id AS view_id
          FROM events WHERE event_type = 'view'
        ), p AS (
          SELECT user_id, epoch_ns(ts) AS p_ns, event_id AS p_id
          FROM events WHERE event_type = 'purchase'
        ), joined AS (
          SELECT p.user_id, p.p_id, v.v_ns
          FROM p JOIN v ON p.user_id = v.v_user
            AND v.v_ns <= p.p_ns AND v.v_ns > p.p_ns - 3600000000000
        ), credited AS (
          SELECT user_id, v_ns,
                 1000000 // COUNT(*) OVER (PARTITION BY p_id) AS credit_e6
          FROM joined
        )
        SELECT user_id, (v_ns // 3600000000000) * 3600 AS view_hour_s,
               CAST(COUNT(*) AS BIGINT) AS n_credited_views,
               CAST(SUM(credit_e6) AS BIGINT) AS credit_e6_total
        FROM credited GROUP BY 1, 2
        ORDER BY user_id, view_hour_s
      """),
    ),
    // TIME-DECAY attribution completes the trio (last-touch, linear,
    // decay): a view's weight halves per 10 minutes of age at purchase
    // time — w = 2^(5 − age_bucket) over the 6 buckets of the 1-hour
    // lookback, all integers (no float pow anywhere); per-purchase
    // share = (1000000·w) div Σw. Same join + per-purchase window shape
    // as the linear form.
    Q(
      "ev_attribution_decay",
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d)
        val v = ev.filter($"event_type" === "view")
          .select($"user_id".as("v_user"), $"ts_ns".as("v_ns"), $"event_id".as("view_id"))
        val p = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts_ns".as("p_ns"), $"event_id".as("p_id"))
        val joined = p.join(v,
          $"user_id" === $"v_user" && $"v_ns" <= $"p_ns" && $"v_ns" > $"p_ns" - NS_PER_HOUR)
          .withColumn("w",
            expr(s"shiftleft(1L, 5 - CAST((p_ns - v_ns) div ${NS_PER_HOUR / 6} AS INT))"))
        val credited = joined
          .withColumn("sw", sum($"w").over(Window.partitionBy($"p_id")))
          .withColumn("credit_e6", expr("(1000000 * w) div sw"))
        credited
          .groupBy($"user_id",
            expr(s"(v_ns div $NS_PER_HOUR) * 3600").as("view_hour_s"))
          .agg(count(lit(1)).as("n_credited_views"),
            sum($"credit_e6").as("credit_e6_total"))
          .orderBy($"user_id", $"view_hour_s")
      },
      Some("""
        WITH v AS (
          SELECT user_id AS v_user, epoch_ns(ts) AS v_ns, event_id AS view_id
          FROM events WHERE event_type = 'view'
        ), p AS (
          SELECT user_id, epoch_ns(ts) AS p_ns, event_id AS p_id
          FROM events WHERE event_type = 'purchase'
        ), joined AS (
          SELECT p.user_id, p.p_id, v.v_ns,
                 (1::BIGINT << (5 - CAST((p.p_ns - v.v_ns) // 600000000000 AS INT))) AS w
          FROM p JOIN v ON p.user_id = v.v_user
            AND v.v_ns <= p.p_ns AND v.v_ns > p.p_ns - 3600000000000
        ), credited AS (
          SELECT user_id, v_ns,
                 (1000000 * w) // SUM(w) OVER (PARTITION BY p_id) AS credit_e6
          FROM joined
        )
        SELECT user_id, (v_ns // 3600000000000) * 3600 AS view_hour_s,
               CAST(COUNT(*) AS BIGINT) AS n_credited_views,
               CAST(SUM(credit_e6) AS BIGINT) AS credit_e6_total
        FROM credited GROUP BY 1, 2
        ORDER BY user_id, view_hour_s
      """),
    ),
    // Rolling 7-day active users (WAU), EXACT: distinct (user, day)
    // pairs — a tiny table after the first distinct — range-joined to
    // the observed-day grid within a 6-day lookback, then one exact
    // countDistinct per day. The scale story for raw-event cardinality
    // is ev_hll_users (sketch partials); this is the exact form over
    // the pre-deduplicated pair table.
    Q(
      "ev_rolling_wau",
      (s, d) => {
        import s.implicits._
        val days = T.events(s, d)
          .select(expr("ts_ns div 86400000000000").as("day"), $"user_id")
          .distinct()
        val grid = days.select($"day").distinct()
        grid.as("g")
          .join(days.as("p"),
            col("p.day").between(col("g.day") - 6, col("g.day")))
          .groupBy(col("g.day").as("day"))
          .agg(countDistinct(col("p.user_id")).as("wau"))
          .orderBy($"day")
      },
      Some("""
        WITH pairs AS (
          SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id FROM events
        ), daygrid AS (SELECT DISTINCT day FROM pairs)
        SELECT g.day, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau
        FROM daygrid g JOIN pairs p ON p.day BETWEEN g.day - 6 AND g.day
        GROUP BY g.day ORDER BY g.day
      """),
    ),
    // Windowed anomaly detection, INTEGER-EXACT: flag hours whose event
    // count exceeds mean + 2σ of the trailing 24 observed hours — the
    // z-score test rearranged to avoid every float: with m trailing
    // counts summing to S (squares Q), c > μ + 2σ ⇔ mc − S > 0 AND
    // (mc − S)² > 4(mQ − S²). Only full 24-hour histories flag. One
    // (type, hour) agg + one window over the aggregated series.
    Q(
      "ev_anomaly_hours",
      (s, d) => {
        import s.implicits._
        val hourly = T.events(s, d)
          .groupBy($"event_type",
            expr(s"(ts_ns div $NS_PER_HOUR) * 3600").as("hour_s"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy($"event_type").orderBy($"hour_s")
          .rowsBetween(-24, -1)
        hourly
          .withColumn("m", count($"c").over(w))
          .withColumn("s", sum($"c").over(w))
          .withColumn("q", sum($"c" * $"c").over(w))
          .filter($"m" === 24
            && ($"m" * $"c" - $"s") > 0
            && ($"m" * $"c" - $"s") * ($"m" * $"c" - $"s") > ($"m" * $"q" - $"s" * $"s") * 4)
          .select($"event_type", $"hour_s", $"c".as("n_events"))
          .orderBy($"event_type", $"hour_s")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type,
                 CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ), win AS (
          SELECT event_type, hour_s, c,
                 COUNT(c) OVER tw AS m,
                 SUM(c) OVER tw AS s,
                 SUM(c * c) OVER tw AS q
          FROM hourly
          WINDOW tw AS (PARTITION BY event_type ORDER BY hour_s
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, hour_s, c AS n_events
        FROM win
        WHERE m = 24 AND (m * c - s) > 0
          AND (m * c - s) * (m * c - s) > (m * q - s * s) * 4
        ORDER BY event_type, hour_s
      """),
    ),
    // Conversion latency: per user, first 'view' → first subsequent
    // 'purchase' delay, rolled up to EXACT index-based percentiles
    // (element at floor((n−1)·p/100) of the sorted deltas — integer
    // seconds, deterministic on both engines, no interpolation knife
    // edges). The global rank window runs over the USER-level table
    // (~|users| rows), never raw events — the q7 discipline.
    Q(
      "ev_funnel_latency",
      (s, d) => {
        import s.implicits._
        val ev = T.events(s, d)
        val firstView = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts_ns").as("view_ns"))
        val firstBuy = ev.filter($"event_type" === "purchase")
          .join(firstView, Seq("user_id"))
          .filter($"ts_ns" >= $"view_ns")
          .groupBy($"user_id").agg(min($"ts_ns").as("buy_ns"))
        val deltas = firstBuy.join(firstView, Seq("user_id"))
          .select(expr("(buy_ns - view_ns) div 1000000000").as("delta_s"), $"user_id")
        val ranked = deltas.withColumn("rn",
          row_number().over(Window.orderBy($"delta_s", $"user_id")) - 1)
        val n = ranked.agg(count(lit(1)).as("n")).select($"n")
        ranked.crossJoin(broadcast(n))
          .filter($"rn" === (($"n" - 1) * 50 / 100).cast("int")
            || $"rn" === (($"n" - 1) * 90 / 100).cast("int"))
          .select($"n".as("n_users"),
            when($"rn" === (($"n" - 1) * 50 / 100).cast("int"), lit("p50")).otherwise(lit("p90")).as("pct"),
            $"delta_s")
          .orderBy($"pct")
      },
      Some("""
        WITH fv AS (
          SELECT user_id, MIN(epoch_ns(ts)) AS view_ns FROM events
          WHERE event_type = 'view' GROUP BY 1
        ), fb AS (
          SELECT e.user_id, MIN(epoch_ns(e.ts)) AS buy_ns
          FROM events e JOIN fv USING (user_id)
          WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= fv.view_ns
          GROUP BY 1
        ), deltas AS (
          SELECT fb.user_id, (fb.buy_ns - fv.view_ns) // 1000000000 AS delta_s
          FROM fb JOIN fv USING (user_id)
        ), ranked AS (
          SELECT delta_s, ROW_NUMBER() OVER (ORDER BY delta_s, user_id) - 1 AS rn,
                 COUNT(*) OVER () AS n
          FROM deltas
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               CASE WHEN rn = (n - 1) * 50 // 100 THEN 'p50' ELSE 'p90' END AS pct,
               delta_s
        FROM ranked
        WHERE rn = (n - 1) * 50 // 100 OR rn = (n - 1) * 90 // 100
        ORDER BY pct
      """),
    ),
    // Streaming heavy hitters, batch face: per-user counts from the
    // bucketed Misra-Gries state op (flatMapGroupsWithState — the
    // stateful-stream twin of doc_freq_terms_sketch; streaming execution
    // proven in StreamingTopKSpec). Capacity 256/bucket ≥ the harness's
    // distinct users per bucket, so the sketch is in its exact regime
    // and the top-20 matches the exact count oracle.
    Q(
      "ev_stream_topk",
      (s, d) => graft.streaming.EventStreams.heavyHitters(T.events(s, d))
        .select(col("user_id"), col("n_events"))
        .orderBy(desc("n_events"), col("user_id"))
        .limit(20),
      Some("""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
        ORDER BY n_events DESC, user_id LIMIT 20
      """),
    ),
  )
}
