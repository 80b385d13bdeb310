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
  /** Streaming CRAWL intake: WARC records (the [[graft.sources.WarcSource]]
    * schema, batch or streaming) → response filter → HTML main-text
    * extraction → exactly-once text-fingerprint dedup (the fixture's
    * mirror pages are real byte-identical duplicates) → per-(hour,
    * source) intake accounting. Event time derives from the page id in
    * the URL (doc_id minutes — the harness feed carries one constant
    * WARC-Date; a production feed uses its fetch timestamp). The same
    * state discipline as [[curate]]: bounded within-watermark dedup on a
    * stream, first-arrival window dedup on the batch face, stateless
    * extraction/quality kernels, two stateful operators total.
    */
  def crawlIntake(records: DataFrame, horizon: String = "2 hours"): DataFrame = {
    graft.functions.GraftFunctions.register(records.sparkSession)
    val pages = records
      .filter(col("warc_type") === "response")
      .select(
        col("url"),
        regexp_extract(col("url"), "https://(?:mirror\\.)?([^.]+)\\.", 1).as("source"),
        regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long").as("page_id"),
        graft.functions.GraftFunctions.htmlExtract(col("body")).as("text"))
      // +1h epoch shift: a row whose event time EQUALS the initial
      // watermark (0) is dropped as late by the within-watermark dedup
      // (the expiry predicate is <=), so page 0 must not sit exactly at
      // the epoch
      .withColumn("ingest_ts", timestamp_seconds(col("page_id") * 60 + 3600))
      .withColumn("fp", md5(col("text")))
    val deduped =
      if (pages.isStreaming)
        pages.withWatermark("ingest_ts", horizon).dropDuplicatesWithinWatermark("fp")
      else
        pages.withColumn("_rn",
            row_number().over(
              Window.partitionBy(col("fp")).orderBy(col("ingest_ts"), col("url"))))
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

  /** MODEL-FILTERED streaming curation: the trained quality classifier
    * ([[graft.text.QualityTrainer]]) applied to an incremental feed. The
    * frozen weights ride the plan as constants — the scoring filter is
    * STATELESS (no lookup join, no state store, any feed rate), so the
    * only stateful operator is the windowed intake rollup (spec pins
    * stateOperators == 1). This is the production shape: train on a
    * snapshot (K bounded scans), freeze, and let every subsequent shard
    * stream through the gate — exactly the frozen-BPE/IVF-quantizer
    * lifecycle applied to the model-based filter. The batch face is the
    * same plan minus the watermark; `doc_stream_model_curate` gates it
    * against a full train+apply+window SQL replay.
    */
  def modelCurate(
      docs: DataFrame,
      model: graft.text.QualityTrainer.TrainedModel,
      horizon: String = "2 hours"): DataFrame = {
    val scored = withIngestTime(docs)
      .withColumn("margin_e6", graft.text.QualityTrainer.marginCol(model))
      .filter(col("margin_e6") >= 0)
    val src =
      if (scored.isStreaming) scored.withWatermark("ingest_ts", horizon)
      else scored
    src
      .groupBy(window(col("ingest_ts"), "1 hour"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("margin_e6")).as("sum_margin_e6"),
      )
  }
}
