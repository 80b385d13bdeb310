package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming near-dup gating for MULTIMODAL payloads — the stream face of
  * the mm_phash_dedup / mm_mixed_dedup batch pipelines: every payload gets
  * a REAL decode + 64-bit perceptual fingerprint (image dHash, audio WHT
  * band signs, video frame-0 luma dHash), candidates come from the four
  * 16-bit hamming quarters (the simhash pigeonhole: distance ≤ 3 forces a
  * shared quarter), and — unlike the text gate's claim-only buckets —
  * each bucket's state carries the OWNER'S FULL HASH, so the arriving
  * payload is verified by exact hamming distance right in the stateful
  * operator: a shared quarter at distance > maxHamming is NOT a
  * duplicate. LSH recall caveat as in the batch pipeline: candidates are
  * only generated against each bucket's first owner, the bounded-state
  * streaming approximation.
  */
object MediaStreams {

  /** One (band, fp) bucket hit of one payload, with its full hash. */
  case class HashHit(band: Int, fp: Long, doc_id: Long, hash: Long,
      ingest_ts: java.sql.Timestamp)

  /** Bucket state: owner's claim time + full 64-bit fingerprint. */
  case class ClaimState(ts: Long, hash: Long)

  /** transformWithState processor for one hamming band bucket: the first
    * (min-id within a batch, first-arrival across batches) payload owns
    * the bucket; later hits are duplicates iff their hash is within
    * `maxHamming` of the OWNER'S (exact verify, not just bucket
    * membership). Event-time timer TTLs the owner out after the horizon —
    * the same bounded-state contract as the text gate's
    * [[DocStreams.BucketClaimProcessor]].
    */
  class HashClaimProcessor(horizonMs: Long, maxHamming: Int)
      extends StatefulProcessor[(Int, Long), HashHit, DocStreams.BandVerdict] {
    @transient private var owner: ValueState[ClaimState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[ClaimState](
        "owner", Encoders.product[ClaimState], TTLConfig.NONE)

    override def handleInputRows(
        key: (Int, Long),
        rows: Iterator[HashHit],
        timerValues: TimerValues): Iterator[DocStreams.BandVerdict] = {
      val sorted = rows.toSeq.sortBy(_.doc_id)
      val out = sorted.map { h =>
        val dup =
          if (!owner.exists()) {
            owner.update(ClaimState(h.ingest_ts.getTime, h.hash))
            0
          } else if (java.lang.Long.bitCount(h.hash ^ owner.get().hash) <= maxHamming) 1
          else 0
        DocStreams.BandVerdict(h.doc_id, h.ingest_ts, dup)
      }
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      sorted.lastOption.foreach(h => getHandle.registerTimer(h.ingest_ts.getTime + horizonMs))
      out.iterator
    }

    override def handleExpiredTimer(
        key: (Int, Long),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DocStreams.BandVerdict] = {
      owner.clear()
      Iterator.empty
    }
  }

  /** The shared gate core over a fingerprinted feed (`doc_id`, `hash`,
    * `ingest_ts`, `band_base`): explode each 64-bit hash into its four
    * 16-bit quarters, offset the quarter index by `band_base` (0 for a
    * single-modality feed; modality·4 for a mixed feed, so fingerprint
    * spaces never share a bucket), verify against each bucket owner's
    * full hash — ONE transformWithState on a stream, the window-min +
    * min_by owner algebra on a batch — then roll up to one verdict per
    * (1-hour window, doc).
    *
    * Scale: state is one (ts, hash) pair per live bucket inside the
    * horizon; bucket keys hash-partition across the cluster; the only
    * per-payload cost upstream is the decode+hash kernel.
    */
  private def nearDupVerdicts(
      hashed: DataFrame,
      maxHamming: Int,
      horizonMinutes: Int): DataFrame = {
    val spark = hashed.sparkSession
    import spark.implicits._
    val hits = hashed.select(
        col("doc_id"), col("hash"), col("ingest_ts"), col("band_base"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("hash"), b * 16).bitwiseAND(lit(65535L))): _*))
          .as(Seq("q", "fp")))
      .select(col("doc_id"), col("hash"), col("ingest_ts"),
        (col("band_base") + col("q")).cast("int").as("band"), col("fp"))
    if (hashed.isStreaming) {
      val verdicts = hits
        .withWatermark("ingest_ts", s"$horizonMinutes minutes")
        .select(col("band"), col("fp"), col("doc_id"), col("hash"), col("ingest_ts"))
        .as[HashHit]
        .groupByKey(h => (h.band, h.fp))
        .transformWithState(
          new HashClaimProcessor(horizonMinutes * 60000L, maxHamming),
          "ingest_ts",
          OutputMode.Append())
      verdicts
        .groupBy(window(col("ingest_ts"), "1 hour"), col("doc_id"))
        .agg(max(col("band_dup")).cast("bigint").as("is_dup"))
    } else {
      val w = Window.partitionBy(col("band"), col("fp"))
      hits
        .withColumn("owner_id", min(col("doc_id")).over(w))
        .withColumn("owner_hash", min_by(col("hash"), col("doc_id")).over(w))
        .withColumn("band_dup",
          (col("owner_id") =!= col("doc_id") &&
            call_function("bit_count", col("hash").bitwiseXOR(col("owner_hash")))
              <= maxHamming).cast("int"))
        .groupBy(window(col("ingest_ts"), "1 hour"), col("doc_id"))
        .agg(max(col("band_dup")).cast("bigint").as("is_dup"))
    }
  }

  /** Event time of the harness feeds: id-minutes. +1s so the id-0
    * payload lands strictly after the initial watermark (= 0) instead of
    * being dropped as late; the hour bucket is unchanged (id·60+1 never
    * crosses an hour boundary vs id·60). A production feed uses its
    * ingest timestamp.
    */
  private def idMinutes: Column = timestamp_seconds(col("doc_id") * 60 + 1)

  /** STREAMING IMAGE NEAR-DUP GATE over the canonical multimodal schema
    * (`id`, `payload`): decode + dHash (stateless codegen'd kernel; null
    * hashes — undecodable payloads — are dropped, the imageFeatures
    * contract), then the [[nearDupVerdicts]] quarter-band claim-verify
    * core with bands 0..3.
    *
    * Batch face: per (band, fp) the owner is the min-id payload
    * (window-min + min_by, fingerprints computed once, one exchange),
    * dup iff ANY quarter's owner is earlier AND within `maxHamming` —
    * replayed end-to-end from the raster algebra by the
    * mm_stream_neardup oracle.
    */
  def imageNearDupGate(
      media: DataFrame,
      maxHamming: Int = 3,
      horizonMinutes: Int = 120): DataFrame = {
    graft.functions.GraftFunctions.register(media.sparkSession)
    val hashed = media
      .select(col("id").as("doc_id"),
        graft.functions.GraftFunctions.dhash64(col("payload")).as("hash"))
      .filter(col("hash").isNotNull)
      .withColumn("ingest_ts", idMinutes)
      .withColumn("band_base", lit(0))
    nearDupVerdicts(hashed, maxHamming, horizonMinutes)
  }

  /** STREAMING MIXED-MODALITY NEAR-DUP GATE — the stream face of
    * mm_mixed_dedup: ONE feed carrying images, WAVs, and AVIs together
    * (`id`, `modality`, `payload`), each payload fingerprinted by its
    * modality's codegen'd expression (dHash / WHT band signs / frame-0
    * luma dHash), all three verified in the SAME quarter-band
    * claim-verify core — the band index carries modality·4, so
    * fingerprint spaces never share a bucket and cross-modality hamming
    * (meaningless) is structurally impossible, not post-filtered.
    * Undecodable payloads (null fingerprints) are dropped.
    *
    * The default horizon is sized for the harness feed's id-minutes
    * clock, where modalities sit ~166 h apart; a production feed keyed
    * on real ingest time uses a horizon matched to its dedup window.
    */
  def mixedNearDupGate(
      media: DataFrame,
      maxHamming: Int = 3,
      horizonMinutes: Int = 30000): DataFrame = {
    graft.functions.GraftFunctions.register(media.sparkSession)
    val fns = graft.functions.GraftFunctions
    val hashed = media
      .select(col("id").as("doc_id"),
        when(col("modality") === "image", fns.dhash64(col("payload")))
          .when(col("modality") === "audio", fns.audioFp64(col("payload")))
          .otherwise(fns.videoFp64(col("payload"))).as("hash"),
        when(col("modality") === "image", 0)
          .when(col("modality") === "audio", 4)
          .otherwise(8).as("band_base"))
      .filter(col("hash").isNotNull)
      .withColumn("ingest_ts", idMinutes)
    nearDupVerdicts(hashed, maxHamming, horizonMinutes)
  }
}
