package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing: deterministic source-balanced downsampling — the step
  * that turns a raw crawl into a training mix with controlled per-domain
  * (here per-source) proportions. Both operators order documents inside
  * a block by `md5(doc_id)` — the same engine-portable deterministic
  * order as [[graft.dedup.Dedup.splitColumn]], so "which docs survive" is
  * a pure function of the data, reproducible across engines and runs.
  *
  * Scale shape (same contract as SequencePacking): ONE window shuffle on
  * the block column, O(1) running state per row. Block = source/domain —
  * thousands to millions of them in a real crawl, so partitions stay
  * bounded; a single-block global sample is the shape to refuse at
  * 100 TB.
  */
object Mixing {

  private def hashOrder(idCol: String): Column =
    md5(col(idCol).cast("string").cast("binary"))

  /** Keep at most `cap` documents per block, chosen by md5(id) order.
    * Adds nothing, drops nothing else — projection of the surviving rows.
    */
  def capPerBlock(
      docs: DataFrame,
      cap: Int,
      idCol: String = "doc_id",
      blockCol: String = "source",
  ): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col(blockCol)).orderBy(hashOrder(idCol), col(idCol))
    docs
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Temperature-balanced sampling (the mT5/XLM-R multilingual mixing
    * rule, α = 0.5): block b's share of the `budget` is proportional to
    * n_b^α, flattening the head so low-resource blocks survive. All
    * arithmetic is CROSS-ENGINE-EXACT integers: the weight is
    * floor(sqrt(n_b)) — sqrt of an int64 is one correctly-rounded IEEE
    * op on both engines, floor is unambiguous, and the allocation
    * `(budget · w_b) div Σw` never sums a float (summing irrational
    * doubles would be order-dependent). Targets cap at n_b; the sample
    * is the md5-ordered prefix per block. Returns the per-block census
    * (n_docs, weight, n_target, n_kept) with n_kept COUNTED from the
    * actually-sampled rows, so the census and the sampler must agree.
    */
  def temperatureSample(
      docs: DataFrame,
      budget: Long,
      idCol: String = "doc_id",
      blockCol: String = "lang",
  ): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val counts = docs.groupBy(col(blockCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", floor(sqrt(col("n_docs"))).cast("long"))
    val tot = counts.agg(sum(col("weight")).as("tw"))
    val targets = counts.crossJoin(broadcast(tot))
      .withColumn("n_target",
        least(expr(s"($budget * weight) div tw"), col("n_docs")))
      .select(col(blockCol), col("n_docs"), col("weight"), col("n_target"))
    val w = Window.partitionBy(col(blockCol)).orderBy(hashOrder(idCol), col(idCol))
    val kept = docs
      .withColumn("__rk", row_number().over(w))
      .join(broadcast(targets.select(col(blockCol), col("n_target"))), Seq(blockCol))
      .filter(col("__rk") <= col("n_target"))
      .groupBy(col(blockCol)).agg(count(lit(1)).as("n_kept"))
    targets.join(kept, Seq(blockCol), "left")
      .select(col(blockCol), col("n_docs"), col("weight"), col("n_target"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Per-block token budget, strict-prefix variant: keep the longest
    * md5-ordered prefix of the block whose inclusive token total fits
    * `budget`. (A skip-and-continue greedy that keeps later small docs
    * after one big doc overflows would need an order-dependent running
    * state conditioned on its own output — not expressible as one window
    * pass, and not replayable as plain SQL; the strict prefix keeps the
    * operator a single shuffle and the oracle a window function, and is
    * what "fill each domain to N tokens" means in practice when
    * reproducibility beats optimality.) Returns the kept rows plus their
    * `toks` and inclusive `cum_toks`.
    */
  def tokenBudgetPerBlock(
      docs: DataFrame,
      tokens: Column,
      budget: Long,
      idCol: String = "doc_id",
      blockCol: String = "source",
  ): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy(col(blockCol)).orderBy(hashOrder(idCol), col(idCol))
    docs
      .withColumn("toks", tokens.cast("bigint"))
      .withColumn("cum_toks",
        sum(col("toks")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_toks") <= budget)
  }
}
