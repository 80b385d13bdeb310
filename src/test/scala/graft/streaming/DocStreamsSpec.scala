package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Top-level so Spark's encoder can instantiate it without an outer
  * scope (MemoryStream deserialization).
  */
case class StreamDoc(doc_id: Long, text: String, source: String)

/** The streaming corpus-curation pipeline under a real streaming query:
  * first-arrival dedup across micro-batches (including a same-text
  * re-delivery under a NEW doc_id), the stateless quality gate, window
  * finalization via the watermark, and stream==batch-face parity on the
  * finalized windows.
  */
class DocStreamsSpec extends AnyFunSuite with SparkSpec {

  private def longText(tag: String): String =
    tag + " " + Seq.fill(24)("tok").mkString(" ") // 25 tokens, passes the gate

  test("curate: stream matches batch face; dups and short docs dropped; state = dedup + window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val query = DocStreams.curate(input.toDF())
      .select(
        col("window.start").cast("long").as("window_s"),
        col("source"), col("n_docs"), col("total_tokens"))
      .writeStream.format("memory").queryName("curate_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val wave1 = Seq(
        StreamDoc(1, longText("alpha"), "s1"),
        StreamDoc(2, longText("beta"), "s1"),
        StreamDoc(5, "too short", "s1"), // < 20 tokens: quality-gated
        StreamDoc(70, longText("gamma"), "s2"))
      val wave2 = Seq(
        StreamDoc(2, longText("beta"), "s1"), // exact re-delivery
        StreamDoc(130, longText("alpha"), "s2")) // same text, NEW id: still a dup
      val wave3 = Seq(
        StreamDoc(400, longText("omega"), "s3"), // 400 min: watermark -> 4.66 h
        StreamDoc(401, longText("omega2"), "s3"))
      input.addData(wave1: _*)
      query.processAllAvailable()
      input.addData(wave2: _*)
      query.processAllAvailable()
      wave3.foreach { d =>
        input.addData(d)
        query.processAllAvailable()
      }
      val streamed = spark.table("curate_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      // hours 0-3 finalized (watermark 4.66h): alpha+beta in (h0, s1),
      // gamma in (h1, s2); the h2 arrival (130) was deduped away
      assert(streamed === Set((0L, "s1", 2L, 50L), (3600L, "s2", 1L, 25L)))
      // batch face over the identical feed, restricted to the finalized
      // windows, must agree exactly
      val batch = DocStreams.curate((wave1 ++ wave2 ++ wave3).toDF())
        .select(
          col("window.start").cast("long").as("window_s"),
          col("source"), col("n_docs"), col("total_tokens"))
        .filter(col("window_s") < 4 * 3600)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(batch === streamed)
      // exactly two stateful operators: the dedup buffer + the window agg
      assert(query.lastProgress.stateOperators.size === 2)
    } finally query.stop()
  }

  test("crawlIntake: binaryFile WARC stream matches the batch face; cross-file dups deduped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warcstream")
    dir.toFile.deleteOnExit()
    def gen(name: String, limit: Int): Unit = {
      val cmd = Seq("python3", "tools/gen_warc_fixture.py",
        dir.resolve(name).toString, "/root/testdata/sf0.001", "--limit", limit.toString)
      assert(scala.sys.process.Process(cmd).! === 0)
    }
    gen("a.warc.gz", 400)
    val query = DocStreams.crawlIntake(
      graft.sources.WarcSource.readStream(spark, dir.toString))
      .select(
        col("window.start").cast("long").as("window_s"),
        col("source"), col("n_docs"), col("total_tokens"))
      .writeStream.format("memory").queryName("crawl_out")
      .outputMode(OutputMode.Append()).start()
    try {
      query.processAllAvailable()
      // second file re-delivers pages 0..399 (cross-file duplicates) and
      // adds 400..499, advancing the watermark to 499min − 2h ≈ 6.3 h
      gen("b.warc.gz", 500)
      query.processAllAvailable()
      val streamed = spark.table("crawl_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed.nonEmpty)
      // finalized windows end at or before the watermark (~7.3 h)
      assert(streamed.forall(_._1 <= 6 * 3600))
      assert(streamed.exists(_._1 == 3600L)) // the epoch-shifted first window survived
      val batch = DocStreams.crawlIntake(
        graft.sources.WarcSource.read(spark, dir.resolve("b.warc.gz").toString))
        .select(
          col("window.start").cast("long").as("window_s"),
          col("source"), col("n_docs"), col("total_tokens"))
        .filter(col("window_s") <= 6 * 3600)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed === batch)
      assert(query.lastProgress.stateOperators.size === 2)
    } finally query.stop()
  }

  test("modelCurate: frozen trained weights filter the stream; stream == batch; ONE stateful op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // train once on a snapshot: clean docs (low repetition, >= 10 tokens)
    // vs spammy repeats — the deterministic bootstrap labels separate them
    val snapshot = (0L until 80L).map { i =>
      val text =
        if (i % 2 == 0) Seq.fill(12)("junk").mkString(" ") // repetition: y=0
        else s"alpha beta gamma delta eps$i zeta eta theta iota kappa w${i % 9} v${i % 5}"
      (i, text, s"s${i % 2}")
    }.toDF("doc_id", "text", "source")
    val model = graft.text.QualityTrainer.train(snapshot, buckets = 256, iters = 3)

    val input = MemoryStream[StreamDoc]
    val query = DocStreams.modelCurate(input.toDF(), model)
      .select(
        col("window.start").cast("long").as("window_s"),
        col("source"), col("n_docs"), col("sum_margin_e6"))
      .writeStream.format("memory").queryName("model_curate_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // the feed re-uses snapshot-like rows: ids pick the hour windows
      def doc(i: Long, src: String) = StreamDoc(i,
        if (i % 2 == 0) Seq.fill(12)("junk").mkString(" ")
        else s"alpha beta gamma delta eps$i zeta eta theta iota kappa w${i % 9} v${i % 5}",
        src)
      val wave1 = (0L until 40L).map(i => doc(i, s"s${i % 2}"))
      val wave2 = (40L until 80L).map(i => doc(i, s"s${i % 2}")) ++
        Seq(doc(400, "s3"), doc(401, "s3")) // 400 min → watermark ≈ 4.6 h
      input.addData(wave1: _*)
      query.processAllAvailable()
      input.addData(wave2: _*)
      query.processAllAvailable()
      val streamed = spark.table("model_curate_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed.nonEmpty)
      // batch face over the same feed, finalized windows only
      val feed = (wave1 ++ wave2).toDF()
      val batch = DocStreams.modelCurate(feed, model)
        .select(
          col("window.start").cast("long").as("window_s"),
          col("source"), col("n_docs"), col("sum_margin_e6"))
        .filter(col("window_s") < 2 * 3600)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed === batch)
      // the model really filters: fewer kept docs than fed in the
      // finalized window range (the junk arm must lose rows), and some kept
      val kept = streamed.toSeq.map(_._3).sum
      assert(kept > 0 && kept < 80)
      // scoring is STATELESS — only the window rollup holds state
      assert(query.lastProgress.stateOperators.size === 1)
    } finally query.stop()
  }

  test("nearDupGate: banded LSH dedup on a stream == batch face; cross- and in-batch dups; 2 stateful ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // disjoint token sets per base text — distinct docs can only collide
    // if two independent md5 minhash chains coincide (never, here), so
    // every is_dup verdict below is structural, not probabilistic
    def txt(i: Long) = (0 until 8).map(j => s"w${i}x$j").mkString(" ")
    // doc 0 rides wave 1 deliberately: its event time is epoch + 1 s —
    // withIngestTime's +1 s offset keeps it strictly after the initial
    // watermark (0), so its bucket claims are NOT dropped as late and a
    // later copy (doc 14) is flagged like any other
    val wave1 = (0L to 10L).map(i => StreamDoc(i, txt(i), "s1"))
    val wave2 = Seq(
      StreamDoc(11, txt(40), "s2"),
      StreamDoc(14, txt(0), "s2"),  // exact copy of wave-1 doc 0: the epoch-edge dup
      StreamDoc(15, txt(2), "s2"),  // exact copy of wave-1 doc 2: cross-batch dup
      StreamDoc(16, txt(40), "s2"), // exact copy of doc 11, SAME batch: in-batch dup
      StreamDoc(17, txt(50), "s2"),
      StreamDoc(400, txt(60), "s3"), // 400 min → watermark 280 min: hour-0 finalizes
      StreamDoc(401, txt(61), "s3"))

    val input = MemoryStream[StreamDoc]
    // transformWithState runs on the RocksDB state store
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val query = DocStreams.nearDupGate(input.toDF())
      .select(col("window.start").cast("long").as("window_s"), col("doc_id"), col("is_dup"))
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(wave1: _*)
      query.processAllAvailable()
      input.addData(wave2: _*)
      query.processAllAvailable()
      val streamed = spark.table("neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch face over the same feed, hour-0 (the only finalized window)
      val batch = DocStreams.nearDupGate((wave1 ++ wave2).toDF())
        .select(col("window.start").cast("long").as("window_s"), col("doc_id"), col("is_dup"))
        .filter(col("window_s") === 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      val verdict = streamed.map(t => t._2 -> t._3).toMap
      assert(verdict(2L) === 0L, "original survives")
      assert(verdict(14L) === 1L, "copy of doc 0 flagged: the epoch row's claims were not dropped as late")
      assert(verdict(15L) === 1L, "cross-batch exact copy flagged from bucket state")
      assert(verdict(11L) === 0L && verdict(16L) === 1L, "in-batch copy: min id owns the bucket")
      assert((0L to 10L).forall(verdict(_) === 0L), "disjoint-token docs never collide")
      // one transformWithState (bucket claims) + one window rollup
      assert(query.lastProgress.stateOperators.size === 2)
    } finally {
      query.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("nearDupGate: bucket-claim state survives a query RESTART from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def txt(i: Long) = (0 until 8).map(j => s"r${i}x$j").mkString(" ")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("neardup_ckpt").toString
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val input = MemoryStream[StreamDoc]
    def start() = DocStreams.nearDupGate(input.toDF())
      .select(col("doc_id"), col("is_dup"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => out.add((r.getLong(0), r.getLong(1))))
        ()
      }
      .start()
    val q1 = start()
    try {
      input.addData((1L to 10L).map(i => StreamDoc(i, txt(i), "s1")): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // RESTART: the copy of doc 2 arrives only after the new query took
    // over — its dup verdict can come only from RECOVERED bucket state
    val q2 = start()
    try {
      input.addData(
        StreamDoc(15, txt(2), "s2"),
        StreamDoc(16, txt(70), "s2"),
        StreamDoc(400, txt(60), "s3"), // advances watermark → finalize hour 0
        StreamDoc(401, txt(61), "s3"))
      q2.processAllAvailable()
      val verdict = out.iterator().asInstanceOf[java.util.Iterator[(Long, Long)]]
      val m = scala.jdk.CollectionConverters.IteratorHasAsScala(verdict).asScala.toMap
      assert(m(15L) === 1L, "cross-restart copy flagged from recovered RocksDB state")
      assert(m(2L) === 0L && m(16L) === 0L)
      assert((1L to 10L).forall(m(_) === 0L))
    } finally {
      q2.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
