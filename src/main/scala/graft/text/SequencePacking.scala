package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: documents are concatenated in a
  * deterministic order and chopped into fixed `seqLen`-token training
  * sequences (the GPT-style contiguous-packing recipe). Each document is
  * attributed to the pack containing its FIRST token, so the assignment is
  * a pure prefix-sum — one window over (shard, order), no iteration.
  *
  * Scale shape: the window partitions by the shard column, so per-task
  * state is bounded by the largest shard, never the corpus; at 100 TB the
  * corpus is sharded (source, file, …) and packing runs embarrassingly
  * parallel across shards. A global (unsharded) packing of a 100 TB corpus
  * is the one shape to refuse — same rule as ev_sessions' per-user window.
  */
object SequencePacking {

  /** Per-document pack assignment: adds `toks` (the document's token
    * count), `start_tok` (tokens preceding it within its shard), and
    * `pack_id` (start_tok div seqLen).
    */
  def assign(
      docs: DataFrame,
      tokens: Column,
      seqLen: Int,
      shardCol: String = "source",
      orderCol: String = "doc_id",
  ): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
    docs
      .withColumn("toks", tokens.cast("bigint"))
      .withColumn(
        "start_tok",
        coalesce(
          sum(col("toks")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      // `div` truncates toward zero (DuckDB's `//` floors), but the two
      // agree here: start_tok is a prefix sum of non-negative token
      // counts, so it is provably >= 0 — no floor correction needed
      .withColumn("pack_id", expr(s"start_tok div $seqLen"))
  }

  /** Pack-level summary: documents, tokens, and the doc-id span per
    * (shard, pack) — the manifest a downstream tokenizer job consumes.
    */
  def packSummary(
      docs: DataFrame,
      tokens: Column,
      seqLen: Int,
      shardCol: String = "source",
      orderCol: String = "doc_id",
  ): DataFrame =
    assign(docs, tokens, seqLen, shardCol, orderCol)
      .groupBy(col(shardCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"),
      )
      .orderBy(col(shardCol), col("pack_id"))
}
