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
