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

  /** FIRST-FIT-DECREASING packing: whole documents are bin-packed into
    * `seqLen`-token sequences (no document ever splits across sequences —
    * the complement of [[assign]]'s contiguous chop, used when examples
    * must stay intact, e.g. instruction tuning). Deterministic FFD:
    * within a shard, docs sort by (toks DESC, md5(id) ASC, id ASC) and
    * each takes the first bin with room, so padding waste is the
    * textbook ≤ 11/9·OPT + 6/9 bound instead of next-fit's unbounded
    * tail waste; a doc longer than seqLen gets a bin of its own.
    *
    * Returns one row per document: shard, doc id, `toks`, and `bin`
    * (the pack it landed in).
    *
    * Scale shape: ONE exchange — the per-shard collect_list (map-side
    * partial) — then the whole FFD pass runs as one codegen'd kernel
    * call per shard ([[graft.functions.FfdPack]]). Per-task state is the
    * largest shard's (id, toks, rank) triples — the SAME bound as the
    * contiguous packer's window state contract: at 100 TB the corpus is
    * sharded (source, file, …) and packing runs embarrassingly parallel
    * across shards; a global unsharded packing is the one shape to
    * refuse. FFD is inherently sequential within a bin-capacity state,
    * so a window cannot express it — the collected-array kernel is the
    * minimal departure, and it still never touches the driver.
    */
  def packFirstFitDecreasing(
      docs: DataFrame,
      tokens: Column,
      seqLen: Int,
      shardCol: String = "source",
      idCol: String = "doc_id",
  ): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(
        col(shardCol),
        struct(
          col(idCol).cast("long").as("doc_id"),
          tokens.cast("long").as("toks"),
          md5(col(idCol).cast("string")).as("rk")).as("item"))
      .groupBy(col(shardCol))
      .agg(collect_list(col("item")).as("items"))
      .select(col(shardCol),
        explode(graft.functions.GraftFunctions.ffdPack(col("items"), seqLen)).as("a"))
      .select(col(shardCol), col("a.doc_id").as(idCol),
        col("a.toks").as("toks"), col("a.bin").as("bin"))
  }

  /** Per-(shard, bin) manifest of [[packFirstFitDecreasing]]: documents,
    * tokens, the doc-id span, and `waste` — the padding tokens the bin
    * ships (0 for a bin holding one oversized doc).
    */
  def ffdPackSummary(
      docs: DataFrame,
      tokens: Column,
      seqLen: Int,
      shardCol: String = "source",
      idCol: String = "doc_id",
  ): DataFrame =
    packFirstFitDecreasing(docs, tokens, seqLen, shardCol, idCol)
      .groupBy(col(shardCol), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
      )
      .withColumn("waste", greatest(lit(seqLen.toLong) - col("n_tokens"), lit(0L)))
      .orderBy(col(shardCol), col("bin"))

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
