package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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
    * no timestamp): epoch + doc_id minutes + 1 s, so the corpus spans
    * several hourly windows. The +1 s keeps doc 0 STRICTLY after the
    * initial watermark (epoch = 0): a row whose event time equals the
    * watermark is dropped as late by within-watermark dedup and never
    * reaches [[BucketClaimProcessor]] (its buckets would go unclaimed and
    * later copies would pass as originals) — the same guard as
    * MediaStreams.idMinutes. Hour-window math is unaffected: 60·id is a
    * multiple of 60, so 60·id + 1 never crosses an hour boundary. A real
    * deployment uses its feed's ingestion time.
    */
  def withIngestTime(docs: DataFrame): DataFrame =
    docs.withColumn("ingest_ts", timestamp_seconds(col("doc_id") * 60 + 1))

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

  /** One row per (band, fp) LSH bucket hit of one document. */
  case class BandHit(band: Int, fp: String, doc_id: Long, ingest_ts: java.sql.Timestamp)

  /** Per-band verdict emitted by the bucket-claim processor. */
  case class BandVerdict(doc_id: Long, ingest_ts: java.sql.Timestamp, band_dup: Int)

  /** transformWithState processor for one LSH bucket: state is the last
    * claim's event time (one long per live bucket); a hit is a duplicate
    * iff the bucket was already claimed. An event-time timer at
    * last-claim + horizon clears the state, so live state is bounded by
    * the number of distinct buckets inside the horizon however long the
    * feed runs — the dedup-within-horizon contract, enforced with the
    * engine's own watermark clock rather than a wall-clock TTL.
    */
  class BucketClaimProcessor(horizonMs: Long)
      extends StatefulProcessor[(Int, String), BandHit, BandVerdict] {
    @transient private var lastClaim: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastClaim = getHandle.getValueState[Long]("lastClaim", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: (Int, String),
        rows: Iterator[BandHit],
        timerValues: TimerValues): Iterator[BandVerdict] = {
      // doc-id order within the batch ⇒ min id claims first, matching the
      // batch face's min-id-owns-the-bucket rule under id-ordered arrival
      val sorted = rows.toSeq.sortBy(_.doc_id)
      val out = sorted.map { h =>
        val dup = lastClaim.exists()
        lastClaim.update(h.ingest_ts.getTime)
        BandVerdict(h.doc_id, h.ingest_ts, if (dup) 1 else 0)
      }
      // exactly one live TTL timer per bucket: re-arm at the newest claim
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      sorted.lastOption.foreach(h => getHandle.registerTimer(h.ingest_ts.getTime + horizonMs))
      out.iterator
    }

    override def handleExpiredTimer(
        key: (Int, String),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[BandVerdict] = {
      lastClaim.clear()
      Iterator.empty
    }
  }

  /** Banded-minhash fingerprints in the md5 hash family — the
    * engine-portable twin of [[graft.functions.GraftFunctions.minhashSig]]'s
    * xxhash64 signatures (the same twin discipline as
    * doc_dup_spans_rolling): h_i(t) = md5(i ":" t), minhash_i = the min
    * over the document's tokens, and band b's fingerprint is the md5 of
    * its `rowsPerBand` concatenated minhashes. Two documents share a
    * band fp iff they agree on all of that band's minhashes — the
    * classic (bands, rows) S-curve — and the whole computation is a
    * stateless per-row kernel DuckDB replays verbatim.
    */
  def bandFps(textCol: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", (0 until rowsPerBand).map { j =>
        val i = b * rowsPerBand + j
        array_min(transform(split(textCol, " "),
          t => md5(concat(lit(s"$i:"), t).cast("binary"))))
      }: _*).cast("binary"))
    }: _*)

  /** STREAMING NEAR-DUP GATE: banded-minhash dedup over an incremental
    * feed. Semantics (identical on both faces): a document is a
    * duplicate iff ANY of its band buckets was touched by a
    * lower-id/earlier document — i.e. it is kept iff it is the first
    * arrival in EVERY one of its buckets. That is the parallel
    * "min-id-owns-the-bucket" rule, so the batch face is two hash
    * aggregates (bucket → min id, then doc → any-lost-bucket) with no
    * iteration, and the DuckDB oracle replays it exactly.
    *
    * Streaming shape: explode each doc into its `bands` bucket hits,
    * then ONE `transformWithState` keyed by (band, fp)
    * ([[BucketClaimProcessor]]: one long of state per live bucket,
    * event-time timer TTL) — dedup-within-horizon, the production
    * contract for an unbounded crawl (state is O(distinct buckets inside
    * the watermark horizon), never O(stream)). Within a micro-batch the
    * group's hits process in doc-id order, so id-ordered arrival makes
    * the stream bit-equal to the batch face (the spec's two-wave pin).
    * transformWithState re-declares `ingest_ts` as the output's event
    * time, which is what legalizes the downstream per-(window, doc)
    * rollup ORing the per-band verdicts — the second and last stateful
    * operator (the older flatMapGroupsWithState cannot chain into an
    * aggregation at all: the global-watermark correctness check rejects
    * it). Verdicts finalize as the watermark passes (Append mode).
    * Requires the RocksDB state store provider, the transformWithState
    * backend.
    *
    * Scale: the bucket keys hash-partition across the cluster (no hot
    * driver state), each state entry is one long + one timer, and the
    * horizon bounds total state however long the feed runs. The
    * fingerprint kernel is the only per-token cost; bands·rows md5 calls
    * per token, all codegen'd.
    */
  def nearDupGate(
      docs: DataFrame,
      bands: Int = 3,
      rowsPerBand: Int = 2,
      horizonMinutes: Int = 120): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val horizon = s"$horizonMinutes minutes"
    val hits = withIngestTime(docs)
      .select(
        col("doc_id"), col("ingest_ts"),
        posexplode(bandFps(col("text"), bands, rowsPerBand)).as(Seq("band", "fp")))
    if (docs.isStreaming) {
      val verdicts = hits
        .withWatermark("ingest_ts", horizon)
        .select(col("band"), col("fp"), col("doc_id"), col("ingest_ts"))
        .as[BandHit]
        .groupByKey(h => (h.band, h.fp))
        .transformWithState(
          new BucketClaimProcessor(horizonMinutes * 60000L),
          "ingest_ts",
          OutputMode.Append())
      verdicts
        .groupBy(window(col("ingest_ts"), "1 hour"), col("doc_id"))
        .agg(max(col("band_dup")).cast("bigint").as("is_dup"))
    } else {
      // bucket owner via a window-min, not a self-join: the fingerprint
      // kernel runs ONCE and the plan is one (band, fp) exchange + the
      // final doc rollup — at corpus scale the join form would recompute
      // every minhash chain on both sides of a shuffle join
      val w = Window.partitionBy(col("band"), col("fp"))
      hits
        .withColumn("owner", min(col("doc_id")).over(w))
        .groupBy(window(col("ingest_ts"), "1 hour"), col("doc_id"))
        .agg(max((col("owner") =!= col("doc_id")).cast("bigint")).as("is_dup"))
    }
  }
}
