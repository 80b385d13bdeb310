package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded GLOBAL corpus shuffle + shard export — the last step before a
  * training run: decorrelate the crawl's source/time ordering and emit a
  * fixed number of balanced shards whose WITHIN-shard order is itself
  * deterministic, so any reader (or restart) streams the exact same token
  * order. The reference pipeline's ordering is whatever the source
  * enumeration yields (upscale.py walks inputs in directory order,
  * cf. /root/reference — same discipline, no seeded reorder); a 100 TB
  * pre-training corpus cannot ship that way: adjacent documents from one
  * domain/dump produce correlated gradient batches, so every production
  * pipeline inserts exactly this seeded-hash reshuffle.
  *
  * Determinism contract: the shuffle key is `md5(seed ":" doc_id)` — a
  * pure function of (seed, id), so the full assignment (shard, position)
  * replays bit-identically in any engine with md5 (the DuckDB oracle
  * recomputes it from scratch) and is stable under re-runs, retries, and
  * cluster-size changes. Nothing about the placement depends on Spark's
  * own partitioning.
  *
  * Scale shape: shard = high-32-bits-of-md5 mod nShards — a HASH
  * assignment, NOT ntile over a global sort: there is no total order
  * anywhere in the plan. The only exchange is the hash partition by
  * shard; the within-shard ordering is a per-partition sort (window
  * PARTITION BY shard), so per-task state is one shard ≈ corpus/nShards —
  * at 100 TB with the production nShards of 10⁴–10⁵ that is the same
  * bounded-partition contract as SequencePacking. Shard sizes follow a
  * balls-in-bins distribution (max/mean → 1 as docs-per-shard grows), and
  * the manifest MEASURES the balance instead of asserting it.
  */
object CorpusShuffle {

  /** The seeded per-document shuffle key (md5 hex, engine-portable). */
  def shuffleKey(seed: String, id: Column): Column =
    md5(concat(lit(seed), lit(":"), id.cast("string")).cast("binary"))

  /** First 8 hex digits of the key as a non-negative long (< 2^32) —
    * both engines truncate identically for non-negative `%`.
    */
  private def keyBucket(key: Column): Column =
    conv(substring(key, 1, 8), 16, 10).cast("long")

  /** Per-document shard assignment: adds `shuf_key`, `shard`, and `pos`
    * (dense rank of the doc within its shard by (shuf_key, id) — the
    * deterministic read order a shard reader follows).
    */
  def assign(
      docs: DataFrame,
      nShards: Int,
      seed: String,
      idCol: String = "doc_id",
  ): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val key = shuffleKey(seed, col(idCol))
    val withKey = docs
      .withColumn("shuf_key", key)
      .withColumn("shard", keyBucket(col("shuf_key")) % nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col("shuf_key"), col(idCol))
    withKey.withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Shard manifest: per-shard document/token counts plus the
    * decorrelation evidence — `same_src_adj`, the number of ADJACENT
    * (by `pos`) document pairs that share a source. Under a uniform
    * random order this concentrates near Σ_s (n_s·(n_s−1))/(n·(n−1)) per
    * shard-row; under the raw crawl order (source-contiguous) it would be
    * ≈ n − #sources. The manifest row count is nShards — a bounded
    * driver-facing summary, never the corpus.
    */
  def manifest(
      docs: DataFrame,
      nShards: Int,
      seed: String,
      tokens: Column,
      idCol: String = "doc_id",
      srcCol: String = "source",
  ): DataFrame = {
    val a = assign(docs, nShards, seed, idCol)
      .withColumn("toks", tokens.cast("bigint"))
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
    a.withColumn(
        "same_src",
        (lag(col(srcCol), 1).over(w) === col(srcCol)).cast("bigint"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        coalesce(sum(col("same_src")), lit(0L)).as("same_src_adj"),
        min(col("shuf_key")).as("first_key"),
        max(col("shuf_key")).as("last_key"),
      )
      .orderBy(col("shard"))
  }
}
