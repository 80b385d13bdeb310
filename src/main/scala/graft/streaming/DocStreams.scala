package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the documents schema: corpus
  * curation as an incremental feed. A 100 TB/day training-data pipeline
  * does not re-curate the corpus per batch — new shards stream through
  * exactly-once dedup and stateless filtering into windowed intake
  * accounting. Each function takes the (possibly streaming) DataFrame so
  * tests inject MemoryStream and production uses file/kafka sources;
  * batch frames run an equivalent face for oracle parity.
  */
object DocStreams {

  /** Deterministic ingest event time for the harness corpus (it carries
    * no timestamp): epoch + doc_id minutes, so the corpus spans several
    * hourly windows. A real deployment uses its feed's ingestion time.
    */
  def withIngestTime(docs: DataFrame): DataFrame =
    docs.withColumn("ingest_ts", timestamp_seconds(col("doc_id") * 60))

  /** Streaming corpus curation: exactly-once exact dedup + stateless
    * quality gating + per-(hour window, source) intake rollup.
    *
    * Dedup key is the canonical text fingerprint (md5 of
    * lowercase-trimmed text). On a stream, `dropDuplicatesWithinWatermark`
    * remembers a fingerprint only until the watermark passes its ingest
    * time, so dedup state is bounded by the horizon however long the
    * feed runs (plain streaming `dropDuplicates` retains every key
    * forever — unusable on an unbounded feed) and keeps the FIRST
    * arrival. Spark rejects the within-watermark form on batch frames,
    * so the batch face keeps the first row per fingerprint in
    * (ingest_ts, doc_id) order — first-arrival under ANY timestamp
    * source, not just the synthesized monotone-in-doc_id one, with
    * doc_id as the deterministic tie-break for equal timestamps.
    * Unlike batch `dropDuplicates` (arbitrary survivor) it is
    * deterministic when duplicate texts carry different ids (8 such
    * pairs at sf0.1). The quality gate (>= 20 tokens) and token count
    * are stateless per-row kernels; only the dedup buffer and the
    * windowed rollup hold state (the spec pins stateOperators == 2).
    */
  def curate(docs: DataFrame, horizon: String = "2 hours"): DataFrame = {
    val t = withIngestTime(docs)
      .withColumn("fp", md5(lower(trim(col("text")))))
    val deduped =
      if (t.isStreaming)
        t.withWatermark("ingest_ts", horizon).dropDuplicatesWithinWatermark("fp")
      else
        t.withColumn("_rn",
            row_number().over(
              Window.partitionBy(col("fp")).orderBy(col("ingest_ts"), col("doc_id"))))
          .filter(col("_rn") === 1)
          .drop("_rn")
    deduped
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .filter(col("n_tokens") >= 20)
      .groupBy(window(col("ingest_ts"), "1 hour"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
      )
  }
}
