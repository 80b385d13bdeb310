package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Cost-based admission control as a Catalyst rule (SURVEY §4.1's
  * "optionally a Rule[LogicalPlan] asserting estimated output size <
  * limit"): the in-plan generalization of the reference's --max-gb CLI
  * guard (upscale_streaming_enhance.py:331–341).
  *
  * Opt-in per session: set `spark.graft.maxEstimatedBytes` to a byte
  * budget and any query whose optimized-plan size estimate exceeds it is
  * rejected BEFORE execution. Unset (default) ⇒ no-op.
  *
  * Attach via `spark.experimental.extraOptimizations` (session-scoped) or
  * the `GraftSessionExtensions` config.
  */
case class SizeGuardRule(spark: SparkSession) extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.maxEstimatedBytes"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val limit = spark.conf.getOption(ConfKey).map(_.toLong)
    limit.foreach { max =>
      // bound the LARGEST estimated node, not the root: a count()'s root
      // emits one row while its scan may still stream petabytes
      val est = plan.collect { case p => p.stats.sizeInBytes }.max
      if (est > max) {
        throw new GraftAdmissionException(
          f"query rejected by $ConfKey: estimated plan size $est bytes exceeds budget $max bytes " +
            "(raise the budget, add filters, or unset the conf to force)")
      }
    }
    plan
  }
}

class GraftAdmissionException(msg: String) extends RuntimeException(msg)
