package graft.plans

import org.apache.spark.sql.DataFrame

/** Mechanized plan pins: the shuffle-exchange counts the engine's
  * scale-critical queries are DESIGNED to have. The ScalaTest specs
  * assert these shapes, but the driver's per-round artifact never runs
  * the specs — so [[graft.Bench]] also counts exchanges from each pinned
  * query's physical plan and emits measured-vs-pinned into the bench
  * JSON. A plan regression (a new Exchange sneaking into a pinned query)
  * then fails loudly in the artifact itself.
  */
object PlanAudit {

  /** Planned shuffle-exchange count of `df`'s physical plan — the
    * pre-execution shape (final AQE section only; AQE can only remove or
    * locally replan exchanges at runtime, never add one). Broadcast and
    * reused exchanges don't re-shuffle and are excluded.
    */
  def shuffleExchanges(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    plan.linesIterator.count { l =>
      !l.contains("ReusedExchange") && (
        l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning") ||
        l.contains("Exchange SinglePartition") ||
        l.contains("Exchange RoundRobinPartitioning"))
    }
  }

  /** The pinned values, keyed by registered query name. Each pin is the
    * count a spec asserts and PLANS.md motivates:
    *   - q22: bucketed-mirror co-located join — the whole point is ZERO
    *     exchanges (both sides carry the bucket layout).
    *   - doc_repetition: Gopher repetition signals via codegen'd kernels —
    *     narrow, scan-speed, zero exchanges.
    *   - ev_funnel / ev_retention: exactly ONE user_id exchange each; the
    *     per-user state is O(1).
    *   - doc_pack_sequences: one prefix-sum window exchange per shard.
    *   - doc_cap_per_source / doc_token_budget: one window exchange,
    *     O(1) running state.
    */
  val pinnedExchanges: Map[String, Int] = Map(
    "q22_bucketed_colocated_join" -> 0,
    "doc_repetition" -> 0,
    "ev_funnel" -> 1,
    "ev_retention" -> 1,
    "doc_pack_sequences" -> 1,
    "doc_cap_per_source" -> 1,
    "doc_token_budget" -> 1,
  )
}
