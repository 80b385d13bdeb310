package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming near-dup gating for MULTIMODAL payloads — the stream face of
  * the mm_phash_dedup batch pipeline: every image payload gets a REAL
  * decode + 64-bit dHash ([[graft.functions.GraftFunctions.dhash64]]),
  * candidates come from the four 16-bit hamming quarters (the simhash
  * pigeonhole: distance ≤ 3 forces a shared quarter), and — unlike the
  * text gate's claim-only buckets — each bucket's state carries the
  * OWNER'S FULL HASH, so the arriving payload is verified by exact
  * hamming distance right in the stateful operator: a shared quarter at
  * distance > maxHamming is NOT a duplicate. LSH recall caveat as in the
  * batch pipeline: candidates are only generated against each bucket's
  * first owner, the bounded-state streaming approximation.
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

  /** STREAMING IMAGE NEAR-DUP GATE over the canonical multimodal schema
    * (`id`, `payload`): decode + dHash (stateless codegen'd kernel; null
    * hashes — undecodable payloads — are dropped, the imageFeatures
    * contract), explode into the four 16-bit quarters, verify against
    * each bucket owner's full hash in ONE transformWithState, then the
    * per-(window, doc) verdict rollup. Event time is id-minutes (the
    * harness convention; a production feed uses its ingest timestamp).
    *
    * Batch face: per (band, fp) the owner is the min-id payload
    * (window-min + min_by, fingerprints computed once, one exchange),
    * dup iff ANY quarter's owner is earlier AND within `maxHamming` —
    * replayed end-to-end from the raster algebra by the
    * mm_stream_neardup oracle.
    *
    * Scale: state is one (ts, hash) pair per live bucket inside the
    * horizon; bucket keys hash-partition across the cluster; the only
    * per-payload cost is the decode+hash kernel.
    */
  def imageNearDupGate(
      media: DataFrame,
      maxHamming: Int = 3,
      horizonMinutes: Int = 120): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val horizon = s"$horizonMinutes minutes"
    val hashed = media
      .select(col("id").as("doc_id"),
        graft.functions.GraftFunctions.dhash64(col("payload")).as("hash"))
      .filter(col("hash").isNotNull)
      // +1s: id-minutes land strictly after the initial watermark (= 0), so
      // the id-0 payload is not dropped as late; the hour bucket is
      // unchanged (id*60+1 never crosses an hour boundary vs id*60).
      .withColumn("ingest_ts", timestamp_seconds(col("doc_id") * 60 + 1))
    val hits = hashed.select(
      col("doc_id"), col("hash"), col("ingest_ts"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("hash"), b * 16).bitwiseAND(lit(65535L))): _*))
        .as(Seq("band", "fp")))
    if (media.isStreaming) {
      val verdicts = hits
        .withWatermark("ingest_ts", horizon)
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
}
