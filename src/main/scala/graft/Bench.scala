package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, timing a full materialization through the noop
  * sink (so Catalyst cannot prune away the measured work the way a bare
  * `count()` would). Prints ONE JSON line for the driver.
  *
  * AGGREGATION RULE (r20 budget redesign — the r19 driver bench was
  * KILLED at the wall-clock budget and the round closed with no official
  * artifact, which is strictly worse than slightly noisier numbers):
  *
  *  - the VOLUME HEADLINE (internal ×15 sink) keeps the MEDIAN of
  *    `SPARK_GRAFT_BENCH_REPS` (default 3) runs — a single sample of a
  *    90 s disk-heavy job cannot distinguish a regression from machine
  *    contention (r6: +81% swing on identical code);
  *  - REGISTERED queries publish the MIN of 2 runs. Contention only ever
  *    INFLATES a sample (the scale curve's min-of-2 rationale), so with
  *    two samples min IS the outlier-rejecting aggregate; the in-run
  *    spike retry (max > 2× min) and the cross-run history check below
  *    still bracket every published number.
  *
  * The JSON carries `"agg"`; volume headlines also report their
  * individual runs as `<name>_runN`.
  *
  * SOFT DEADLINE: `SPARK_GRAFT_BENCH_DEADLINE_SEC` (default 1800) from
  * JVM start. Once crossed, remaining registered queries run ONE rep and
  * the crossover/scale-curve blocks are skipped — all explicitly marked
  * in the JSON (`deadline_degraded`, `deadline_skipped`) — so a
  * contended driver box degrades the artifact's precision, never its
  * existence (the r19 lesson: rc:124 loses the whole round's numbers).
  *
  * Failures are propagated per query as value -1 plus an `errors` map —
  * never silently recorded as a plausible time (round-1 lesson).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val benchT0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // registered queries run min-of-2 (see the aggregation rule above)
    val regReps = math.min(reps, 2)
    val deadlineSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "1800").toDouble
    def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
    def overDeadline: Boolean = elapsedSec > deadlineSec
    val degraded = scala.collection.mutable.LinkedHashSet[String]()
    val skippedBlocks = scala.collection.mutable.LinkedHashSet[String]()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftSessionExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // local-iteration subset filter: comma-separated query names (use
    // "volume" for the headline volume bench). Unset = everything — the
    // driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    // headline volume benchmark FIRST, on the clean JVM — the reference's
    // recorded runs (BASELINE.md ×2 = 2.98 s) were fresh single processes,
    // so measuring after 38 queries of broadcast/GC residue would skew it.
    val volumeAll =
      if (!wanted("volume")) Seq.empty
      else try graft.volume.VolumeBench.run(spark, reps = reps)
      catch {
        case e: Throwable =>
          errors("vol_atlas_upscale_x2") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          Seq("vol_atlas_upscale_x2" -> -1.0)
      }
    // ambient-disk probes are deliberate I/O, not engine work, and the
    // x15 STAGE probes (scan/kernel/encode/sink split) re-measure the
    // same work the x15 headlines already time: both ride in every JSON
    // line under their own "probes" key and NEVER enter queries / total /
    // n_queries (they'd double-count and inflate round-over-round totals
    // — r11: stage_encode alone is ~98 s of re-measured headline work)
    // vol_retry_* carries the probe-gated retry metadata: the retry flag
    // per headline block plus the POISONED first attempt's samples when a
    // block re-ran (VolumeBench.gated) — evidence, never a timing
    val (volProbes, volume) = volumeAll.partition { case (k, _) =>
      k.startsWith("vol_disk_probe") || k.startsWith("vol_atlas_x15_stage") ||
        k.startsWith("vol_atlas_x2_stage") || k.startsWith("vol_retry")
    }
    val probesJson = volProbes.map { case (k, v) => "\"" + esc(k) + "\":" + v }.mkString("{", ",", "}")
    // the volume headlines also print as their OWN json line immediately:
    // the driver captures the bench tail, and a long registered-query run
    // once pushed these past the captured window (round-2 lesson)
    val volQs = volume.map { case (k, v) => "\"" + esc(k) + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"volume_headline","unit":"sec","queries":$volQs,"probes":$probesJson,"sf":"${esc(sfDir)}"}""")
    Console.out.flush()
    // untimed warmup: session init, parquet reader, join/agg codegen —
    // otherwise the first registered query absorbs several seconds of
    // one-time JVM cost and skews its number.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // plan pins (PlanAudit): measured shuffle-exchange counts for the
    // scale-critical queries, taken from the UNEXECUTED plan before the
    // timed reps — a new Exchange in a pinned query fails loudly in the
    // artifact (plan_pins_ok=false), not just in the specs.
    val planPins = scala.collection.mutable.LinkedHashMap[String, Int]()
    // structural pins (broadcast anti-joins, partition-pruned IVF scan):
    // (ok, evidence) per pinned query, same discipline as the exchange
    // counts — a shape regression fails loudly in the artifact
    val shapePins = scala.collection.mutable.LinkedHashMap[String, (Boolean, String)]()
    // the doc-family queries whose r13 medians exceeded ~5 s at sf0.1:
    // their timed reps are BRACKETED by disk probes with ONE bounded
    // retry when the probes disagree >2× (the VolumeBench.gated
    // discipline) — the jaccard family needed manual ambient
    // adjudication three rounds running, so the artifact now defends
    // those numbers itself. Probe/retry evidence rides in the probes
    // map, never in queries/total.
    val docProbed = Set("doc_jaccard_pairs_ppjoin", "doc_containment_dedup",
      "doc_containment_pairs", "doc_jaccard_pairs", "doc_lm_score")
    val docProbes = scala.collection.mutable.LinkedHashMap[String, Double]()
    val probeDir = sys.env.getOrElse("SPARK_GRAFT_VOLBENCH_DIR", "/tmp/graft_volbench")
    val registered = SparkEntry.allQs.filter(q => wanted(q.name)).flatMap { q =>
      if (graft.plans.PlanAudit.pinnedExchanges.contains(q.name)) {
        try planPins(q.name) = graft.plans.PlanAudit.shuffleExchanges(q.run(spark, sfDir))
        catch {
          case e: Throwable =>
            errors(q.name + "_plan_pin") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            planPins(q.name) = -1
        }
      }
      graft.plans.PlanAudit.pinnedShapes.get(q.name).foreach { check =>
        try {
          val s = check(q.run(spark, sfDir))
          shapePins(q.name) = (s.ok, s.detail)
        } catch {
          case e: Throwable =>
            errors(q.name + "_shape_pin") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            shapePins(q.name) = (false, "exception")
        }
      }
      // min of `regReps` runs (see the aggregation rule above); any
      // failed run poisons the query to -1 + an errors entry. Past the
      // soft deadline every remaining query runs ONCE, marked.
      def sampleReps(): (Seq[Double], Boolean) = {
        val n = if (overDeadline) { degraded += q.name; 1 } else regReps
        val times = Seq.newBuilder[Double]
        var ok = true
        var i = 0
        while (ok && i < n) {
          val t0 = System.nanoTime()
          try {
            q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
            times += (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              errors(q.name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
              ok = false
          }
          i += 1
        }
        (times.result(), ok)
      }
      if (!docProbed(q.name)) {
        var (times, ok) = sampleReps()
        // in-run ambient defense for the cheap families (the r17 close:
        // ~10 relational queries spiked 2-8x in one history run): a
        // median > 2x the query's OWN min means at least two of `reps`
        // samples ran inside a contended window — only contention ever
        // INFLATES a sample (the scale curve's min-of-2 rationale), so
        // stash the poisoned attempt, re-run once, and publish the
        // better-of medians. Marker + both attempts ride in probes;
        // no spike passes without a rel_retry_* trace.
        if (ok && times.size > 1) {
          val spread = times.max
          if (spread > 2.0 * times.min && spread > 0.3) {
            times.zipWithIndex.foreach { case (t, i) =>
              docProbes(s"rel_retry_${q.name}_try1_run${i + 1}") = t
            }
            val again = sampleReps()
            if (again._2) {
              if (again._1.min < times.min) times = again._1
            } else {
              // try1 stands as the canonical result; record the flake
              errors.remove(q.name)
              docProbes(s"rel_retry_${q.name}_retry_failed") = 1.0
            }
            docProbes(s"rel_retry_${q.name}") = 1.0
          }
        }
        // the aggregation rule (header): min of the reps — with two
        // samples under inflate-only noise, min IS the outlier rejection
        Seq(q.name -> (if (ok) times.min else -1.0))
      } else {
        val pre = graft.volume.VolumeBench.diskProbe(probeDir, gb = 1)
        docProbes(s"${q.name}_probe_pre") = pre
        var (times, ok) = sampleReps()
        var post = graft.volume.VolumeBench.diskProbe(probeDir, gb = 1)
        val ratio = math.max(pre, post) / math.max(1e-9, math.min(pre, post))
        if (ok && ratio > 2.0) {
          // ambient-contaminated window: stash the poisoned attempt as
          // probe-side evidence, publish the single bounded re-run
          times.zipWithIndex.foreach { case (t, i) =>
            docProbes(s"doc_retry_${q.name}_try1_run${i + 1}") = t
          }
          docProbes(s"doc_retry_${q.name}_try1_probe_pre") = pre
          docProbes(s"doc_retry_${q.name}_try1_probe_post") = post
          val again = sampleReps()
          times = again._1
          ok = again._2
          post = graft.volume.VolumeBench.diskProbe(probeDir, gb = 1)
          docProbes(s"doc_retry_${q.name}") = 1.0
        } else docProbes(s"doc_retry_${q.name}") = 0.0
        docProbes(s"${q.name}_probe_post") = post
        val runEntries = times.zipWithIndex.map { case (t, i) => s"${q.name}_run${i + 1}" -> t }
        runEntries :+ (q.name -> (if (ok) times.min else -1.0))
      }
    }
    // Jaccard STRATEGY-CROSSOVER measurement (not a gate — the two
    // strategies are output-identical and both already hash-gated on the
    // corpus fixture): a synthetic LARGE-VOCABULARY Zipf corpus where
    // prefix filtering's regime holds (rare prefix tokens make candidate
    // buckets tiny), measured for both strategies so the "prefer
    // count-based on dense vocabularies, prefix on large ones" guidance
    // in PLANS.md is backed by two measured points instead of one.
    val crossover: Seq[(String, Double)] =
      if (!wanted("jaccard_crossover")) Seq.empty
      else if (overDeadline) { skippedBlocks += "jaccard_crossover"; Seq.empty }
      else try {
        import org.apache.spark.sql.functions._
        val nDocs = 4000
        val docLen = 30
        val vocab = 30000
        // deterministic Zipf-ish ranks: u log-uniform per (doc, slot)
        val docs = spark.range(nDocs).select(
          col("id").as("doc_id"),
          lit("src").as("source"),
          array_join(
            transform(sequence(lit(0), lit(docLen - 1)), j =>
              concat(lit("t"), floor(exp(
                (pmod(((col("id") * docLen + j) * 2654435761L), lit(1048576L))
                  .cast("double") / 1048576.0) * math.log(vocab.toDouble))).cast("long"))),
            " ").as("text"))
          .localCheckpoint(true)
        def time(body: => Long): (Double, Long) = {
          val t0 = System.nanoTime()
          val rows = body
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        def med3(body: => Long): (Double, Long) = {
          // min-of-regReps (the registered-query aggregation rule)
          val samples = (1 to regReps).map(_ => time(body))
          (samples.map(_._1).min, samples.head._2)
        }
        val (tCount, nCount) = med3(
          graft.dedup.Dedup.tokenJaccardPairs(docs, threshold = 0.7).count())
        val (tPrefix, nPrefix) = med3(
          graft.dedup.Dedup.tokenJaccardPairsPrefix(docs, threshold = 0.7).count())
        if (nCount != nPrefix)
          errors("jaccard_crossover") = s"strategy outputs diverged: $nCount vs $nPrefix pairs"
        // the COST-BASED chooser, measured against both fixed strategies:
        // its stats-pass verdict must match the measured winner on BOTH
        // regimes — this large-vocab Zipf corpus (prefix wins) and the
        // dense harness corpus the gates run on (count wins) — or the
        // bench flags it as an error, not a silent mis-choice
        val (tAuto, nAuto) = med3(
          graft.dedup.Dedup.tokenJaccardPairsAuto(docs, threshold = 0.7).count())
        if (nAuto != nCount)
          errors("jaccard_crossover_auto") = s"auto output diverged: $nAuto vs $nCount pairs"
        val zipfStats = graft.dedup.Dedup.jaccardStrategyStats(docs, threshold = 0.7)
        val zipfMeasuredPrefixWins = tPrefix < tCount
        if (zipfStats.preferPrefix != zipfMeasuredPrefixWins)
          errors("jaccard_chooser_zipf") =
            s"chooser preferPrefix=${zipfStats.preferPrefix} but measured prefix=$tPrefix count=$tCount"
        docProbes("jaccard_auto_zipf_picked_prefix") = if (zipfStats.preferPrefix) 1.0 else 0.0
        val denseStats = graft.dedup.Dedup.jaccardStrategyStats(
          spark.read.parquet(s"$sfDir/documents.parquet"), threshold = 0.5)
        docProbes("jaccard_auto_dense_picked_prefix") = if (denseStats.preferPrefix) 1.0 else 0.0
        if (denseStats.preferPrefix)
          errors("jaccard_chooser_dense") =
            "chooser preferPrefix=true on the dense harness corpus (count's regime; " +
              "r18 post-shuffle-hash the two measure a near-tie there — 2.43 vs 2.35 s " +
              "at sf0.1 — so either runs fine, but the estimate flipping signals drift)"
        Seq(
          "jaccard_crossover_largevocab_count" -> tCount,
          "jaccard_crossover_largevocab_prefix" -> tPrefix,
          "jaccard_crossover_largevocab_auto" -> tAuto)
      } catch {
        case e: Throwable =>
          errors("jaccard_crossover") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          Seq.empty
      }
    // CONTAINMENT strategy-crossover measurement — the asymmetric mirror
    // of the jaccard block: the same large-vocab Zipf corpus, timed for
    // the count path, the one-sided prefix path, and the chooser. The
    // r18 calibration (PLANS.md): prefix wins EVERY measured containment
    // regime at t=0.9 (gate corpus 1.09 vs 1.37 s sf0.01, 6.4 vs 8.9 s
    // sf0.1, Zipf 1.1 vs 6.3 s) because the probe prefix is ~n/10 tokens
    // and the n_sup size filter prunes the verify join; the count path's
    // regime is LOW thresholds on dense vocabularies (probe prefix ~n/2).
    val containmentCrossover: Seq[(String, Double)] =
      if (!wanted("containment_crossover")) Seq.empty
      else if (overDeadline) { skippedBlocks += "containment_crossover"; Seq.empty }
      else try {
        import org.apache.spark.sql.functions._
        val nDocs = 4000
        val docLen = 30
        val vocab = 30000
        val docs = spark.range(nDocs).select(
          col("id").as("doc_id"),
          lit("src").as("source"),
          array_join(
            transform(sequence(lit(0), lit(docLen - 1)), j =>
              concat(lit("t"), floor(exp(
                (pmod(((col("id") * docLen + j) * 2654435761L), lit(1048576L))
                  .cast("double") / 1048576.0) * math.log(vocab.toDouble))).cast("long"))),
            " ").as("text"))
          .localCheckpoint(true)
        def time(body: => Long): (Double, Long) = {
          val t0 = System.nanoTime()
          val rows = body
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        def med3(body: => Long): (Double, Long) = {
          // min-of-regReps (the registered-query aggregation rule)
          val samples = (1 to regReps).map(_ => time(body))
          (samples.map(_._1).min, samples.head._2)
        }
        val (tCount, nCount) = med3(
          graft.dedup.Dedup.tokenContainmentPairs(docs, threshold = 0.9).count())
        val (tPrefix, nPrefix) = med3(
          graft.dedup.Dedup.tokenContainmentPairsPrefix(docs, threshold = 0.9).count())
        if (nCount != nPrefix)
          errors("containment_crossover") = s"strategy outputs diverged: $nCount vs $nPrefix pairs"
        val (tAuto, nAuto) = med3(
          graft.dedup.Dedup.tokenContainmentPairsAuto(docs, threshold = 0.9).count())
        if (nAuto != nCount)
          errors("containment_crossover_auto") = s"auto output diverged: $nAuto vs $nCount pairs"
        val zipfStats = graft.dedup.Dedup.containmentStrategyStats(docs, threshold = 0.9)
        val zipfMeasuredPrefixWins = tPrefix < tCount
        if (zipfStats.preferPrefix != zipfMeasuredPrefixWins)
          errors("containment_chooser_zipf") =
            s"chooser preferPrefix=${zipfStats.preferPrefix} but measured prefix=$tPrefix count=$tCount"
        docProbes("containment_auto_zipf_picked_prefix") = if (zipfStats.preferPrefix) 1.0 else 0.0
        // the GATE corpus (documents + prefix-half copies): the chooser
        // must pick prefix — the measured winner at every sf (r18:
        // sf0.01 1.09 vs 1.37 s, sf0.1 6.4 vs 8.9 s)
        val base = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"), col("source"))
        val gate = base.unionByName(base.select(
          (col("doc_id") + lit(2000000L)).as("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, (size(split(text, ' ')) + 1) div 2), ' ')").as("text"),
          col("source")))
        val gateStats = graft.dedup.Dedup.containmentStrategyStats(gate, threshold = 0.9)
        docProbes("containment_auto_gate_picked_prefix") = if (gateStats.preferPrefix) 1.0 else 0.0
        if (!gateStats.preferPrefix)
          errors("containment_chooser_gate") =
            "chooser preferPrefix=false on the gate corpus (measured loser, r18: 8.9 s vs 6.4 s at sf0.1)"
        // PERSISTED-ANALYZE decision parity (r19): the stored-histogram
        // route must reproduce the live chooser's verdict on BOTH
        // regimes — the decision FLIP between the low-threshold dense
        // probe (count) and the t=0.9 corpora (prefix) driven entirely
        // by ANALYZE output, zero data passes at choose time. Output
        // identity is gated separately (doc_*_pairs_stats hash gates);
        // this probe defends the plan decision in the bench artifact.
        val statsRoot = java.nio.file.Files.createTempDirectory("graft-benchstats").toString
        graft.dedup.Dedup.analyzeTokenStats(docs, s"$statsRoot/zipf")
        graft.dedup.Dedup.analyzeTokenStats(gate, s"$statsRoot/gate")
        val zipfStored = graft.dedup.Dedup.strategyStatsFromAnalyzed(
          spark, s"$statsRoot/zipf", threshold = 0.9, containment = true)
        val gateStored = graft.dedup.Dedup.strategyStatsFromAnalyzed(
          spark, s"$statsRoot/gate", threshold = 0.9, containment = true)
        val zipfStoredLow = graft.dedup.Dedup.strategyStatsFromAnalyzed(
          spark, s"$statsRoot/zipf", threshold = 0.3, containment = true)
        docProbes("containment_stats_zipf_picked_prefix") =
          if (zipfStored.preferPrefix) 1.0 else 0.0
        docProbes("containment_stats_gate_picked_prefix") =
          if (gateStored.preferPrefix) 1.0 else 0.0
        docProbes("containment_stats_lowt_picked_prefix") =
          if (zipfStoredLow.preferPrefix) 1.0 else 0.0
        if (zipfStored.preferPrefix != zipfStats.preferPrefix ||
          gateStored.preferPrefix != gateStats.preferPrefix)
          errors("containment_stats_parity") =
            s"stored-stats verdicts diverged from live: zipf ${zipfStored.preferPrefix}/" +
              s"${zipfStats.preferPrefix} gate ${gateStored.preferPrefix}/${gateStats.preferPrefix}"
        // the same stored histograms at a LOW threshold must flip back
        // to the count path (probe prefix ~n/2 — nothing is rare):
        // stats → decision, threshold-parameterized, one sidecar
        if (zipfStoredLow.preferPrefix)
          errors("containment_stats_flip") =
            "stored stats failed to flip to the count path at t=0.3 on the zipf corpus"
        Seq(
          "containment_crossover_largevocab_count" -> tCount,
          "containment_crossover_largevocab_prefix" -> tPrefix,
          "containment_crossover_largevocab_auto" -> tAuto)
      } catch {
        case e: Throwable =>
          errors("containment_crossover") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          Seq.empty
      }
    // ANALYZE→PLANNER BRIDGE flip probe (r20, verdict #8): fresh
    // `_zstats` live stats must flip a deleted-heavy layout's join side
    // to broadcast (raw file bytes sit ABOVE the threshold, live bytes
    // below it — only the ZStatsRule stamp can make the build side
    // eligible), and disabling the bridge must flip it back to
    // sort-merge with IDENTICAL output. The decision pins ride
    // `zstats_flip_*`; a wrong strategy or an output mismatch is a
    // bench ERROR, not a probe footnote — the artifact itself defends
    // that the stats feed the planner and never the results.
    if (wanted("zstats_flip") && !overDeadline) {
      try {
        import org.apache.spark.sql.functions._
        val zr = java.nio.file.Files.createTempDirectory("graft-benchzstats").toString + "/t"
        val src = spark.range(40000).select(
          col("id").as("k"), (col("id") % 997).as("xv"), (col("id") % 991).as("yv"),
          lpad(lit("p"), 200, "x").as("payload"))
        graft.operators.ZOrder.clusterQuantile(src, Seq("xv", "yv"), nFiles = 4, out = zr)
        graft.operators.ZOrder.deleteWhere(spark, zr, col("k") % 20 =!= 0)
        graft.operators.ZOrder.analyzeLayout(spark, zr, Seq("xv", "yv"))
        graft.plans.ZStatsRule.invalidateCache()
        implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
        val st = graft.operators.ZOrder.liveStatsIfFresh(zr).get
        val raw = st.fileNames.toSeq.map(n =>
          graft.io.Fio.size(graft.io.Fio.child(zr, n))).sum
        val big = spark.range(3L * 1000 * 1000).toDF("k2")
        def q = graft.operators.ZOrder.readCommitted(spark, zr, applyDeletes = true)
          .join(big, col("k") === col("k2"))
          .agg(sum("xv").as("sx"), count(col("payload")).as("np"))
        val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        val prevInject = spark.conf.getOption("spark.graft.zstats.inject")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (raw / 3).toString)
        spark.conf.set("spark.graft.zstats.inject", "true")
        try {
          val on = q
          val onStrat = graft.plans.PlanAudit.innerJoinStrategies(on)
          val onRows = on.collect().toSeq
          spark.conf.set("spark.graft.zstats.inject", "false")
          val off = q
          val offStrat = graft.plans.PlanAudit.innerJoinStrategies(off)
          val offRows = off.collect().toSeq
          docProbes("zstats_flip_bcast") = if (onStrat == Seq("broadcast")) 1.0 else 0.0
          docProbes("zstats_flip_smj") = if (offStrat == Seq("sortmerge")) 1.0 else 0.0
          if (onStrat != Seq("broadcast") || offStrat != Seq("sortmerge"))
            errors("zstats_flip") =
              s"expected broadcast-with-stats / sortmerge-without, got $onStrat / $offStrat"
          if (onRows != offRows)
            errors("zstats_identity") = "stats-injected plan changed the RESULT"
        } finally {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
          // restore the CALLER's kill-switch setting, not a hardcoded
          // default — a bridge-off baseline run must stay bridge-off
          prevInject match {
            case Some(v) => spark.conf.set("spark.graft.zstats.inject", v)
            case None => spark.conf.unset("spark.graft.zstats.inject")
          }
        }
      } catch {
        case e: Throwable =>
          errors("zstats_flip") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    } else if (wanted("zstats_flip")) skippedBlocks += "zstats_flip"
    // CROSS-RUN contamination check — the defense the in-run detector
    // cannot give: a window contended for a whole query's reps leaves
    // min ≈ median (the r17 close: q24 0.84 → 7.18 s with every rep
    // elevated; only same-session sibling RUNS exposed it). Compare each
    // registered median against the most recent bench_history run at the
    // SAME sf; anything > 2× its prior gets ONE bounded re-run
    // (better-of published) and, if still > 2×, an explicit
    // rel_regressed_* ratio marker — so the closing artifact carries no
    // line > 2× its sibling runs without a retry or adjudication hook.
    // A genuine plan regression also trips this, deliberately: the
    // marker forces the round to adjudicate it. Re-runs are capped (12
    // queries, priors under 30 s) so a globally-contended session can't
    // double the bench; the driver's fresh checkout has no history and
    // skips silently.
    val priorMedians: Map[String, Double] =
      try {
        val hist = java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json"))
          .resolveSibling("bench_history")
        if (!java.nio.file.Files.isDirectory(hist)) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          import org.json4s._
          java.nio.file.Files.list(hist).iterator().asScala.toSeq
            .filter(_.getFileName.toString.endsWith(".json"))
            .sortBy(_.getFileName.toString).reverse.view
            .flatMap { p =>
              try {
                val j = jackson.JsonMethods.parse(java.nio.file.Files.readString(p))
                val sf = j \ "sf" match { case JString(s) => s; case _ => "" }
                if (sf != sfDir) None
                else j \ "queries" match {
                  case JObject(fields) =>
                    Some(fields.collect {
                      case (k, JDouble(v)) => k -> v
                      case (k, JInt(v)) => k -> v.toDouble
                      case (k, JDecimal(v)) => k -> v.toDouble
                    }.toMap)
                  case _ => None
                }
              } catch { case _: Throwable => None }
            }.headOption.getOrElse(Map.empty)
        }
      } catch { case _: Throwable => Map.empty }
    var histRetries = 0
    val byNameQ = SparkEntry.allQs.map(q => q.name -> q).toMap
    val registeredChecked = registered.map { case (name, med) =>
      val prior = priorMedians.getOrElse(name, -1.0)
      if (name.matches(".*_run\\d+$") || med <= 0 || prior < 0.3 || med <= 2.0 * prior)
        name -> med
      else byNameQ.get(name) match {
        case Some(q) if histRetries < 12 && prior < 30.0 =>
          histRetries += 1
          docProbes(s"rel_hist_${name}_prior") = prior
          docProbes(s"rel_hist_${name}_try1") = med
          val redo = (1 to regReps).flatMap { _ =>
            try {
              val t0 = System.nanoTime()
              q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
              Some((System.nanoTime() - t0) / 1e9)
            } catch { case _: Throwable => None }
          }
          val best = if (redo.size == regReps)
            math.min(med, redo.min) else med
          if (best > 2.0 * prior)
            docProbes(s"rel_regressed_$name") = best / prior
          name -> best
        case _ =>
          docProbes(s"rel_hist_${name}_prior") = prior
          docProbes(s"rel_regressed_$name") = med / prior
          name -> med
      }
    }
    val results = volume ++ registeredChecked ++ crossover ++ containmentCrossover
    // SCALE-CURVE measurement: the dedup/ANN/span family timed at
    // sf0.001/0.01/0.1 in THIS session, min-of-2 reps per point, slopes
    // emitted per query. `slope` = (t(sf0.1)/t(sf0.01)) / 10 — the
    // measured growth per unit of data growth over the decade that
    // matters; 1.0 is exactly linear, fixed overheads push it below,
    // and anything past the 1.3 bound means a super-linear stage
    // (pair fanout, window state, a cap not biting) and flags the
    // artifact (`scale_curve_ok=false`) for PLANS.md adjudication.
    // sf0.001 rides along as the intercept evidence but is too
    // noise-dominated (sub-second runs) to gate on.
    val scaleCurveFamily = Seq(
      "doc_exact_dedup", "doc_minhash_dedup", "doc_simhash_dedup",
      "doc_jaccard_pairs", "doc_jaccard_pairs_ppjoin", "doc_jaccard_pairs_auto",
      // doc_containment_pairs (the standalone count face) is DEMOTED
      // from the curve (r19): its per-(block,term) window below the df
      // cap is quadratic by design (slope 1.514, adjudicated r18) and
      // it is not a production entry point — tokenContainmentPairsAuto
      // routes real corpora through the lossless prefix twin (slope
      // 0.788) or the capped count path per measured cost; both
      // production faces stay ON the curve below. The count face
      // remains hash-gated for correctness every round.
      "doc_containment_pairs_prefix",
      "doc_containment_pairs_auto", "doc_cdc_dedup", "doc_shingle_jaccard",
      "doc_dup_spans", "doc_dup_spans_rolling", "doc_dedup_incremental",
      "doc_dedup_corpus", "doc_contamination_bloom",
      "emb_cosine_topk", "emb_lsh_dedup", "emb_semantic_dedup", "emb_kmeans",
      // r17 widening: the pipeline / quality / events / mixing families —
      // each a multi-stage plan whose slope would hide a super-linear
      // stage (window state, per-source caps, GD replay) that the
      // single-sf medians can't expose
      "doc_pipeline_curate_v4", "doc_quality_train", "doc_tfidf_topk",
      "doc_shuffle_shards", "doc_lang_id",
      "ev_sessions_twophase", "ev_funnel", "ev_rolling_wau",
      // r18 lakehouse faces: the tombstone anti-join merge is the scale
      // shape to watch (fixtures are marker-cached, so the min-of-2
      // times the warm read path, not the one-time layout build)
      "q35_zdelete_read", "q38_zmerge_upsert")
    val scaleCurve: Seq[(String, Seq[Double], Double)] =
      if (!wanted("scale_curve")) Seq.empty
      else if (overDeadline) { skippedBlocks += "scale_curve"; Seq.empty }
      else {
        val parent = new java.io.File(sfDir).getParentFile
        val dirs = Seq("sf0.001", "sf0.01", "sf0.1").map(new java.io.File(parent, _))
        if (dirs.exists(!_.isDirectory)) Seq.empty
        else {
          val byName = SparkEntry.allQs.map(q => q.name -> q).toMap
          scaleCurveFamily.flatMap { name =>
            byName.get(name).flatMap { q =>
              try {
                // MIN of 2 reps per point: the curve estimates a growth
                // EXPONENT, and the two error sources at play — ambient
                // disk/CPU contention and the first-execution codegen
                // compile — only ever INFLATE a sample, so min is the
                // robust point estimate (an r17 contended run pushed
                // doc_containment_pairs to a spurious 1.66 slope that a
                // quiet 3-rep probe measured at 0.55; median-of-1 had no
                // defense). Headline timings keep their median-of-reps
                // + probe-bracket discipline — this block only feeds
                // the slope.
                val ts = dirs.map { d =>
                  (1 to 2).map { _ =>
                    val t0 = System.nanoTime()
                    q.run(spark, d.getAbsolutePath).write.format("noop").mode("overwrite").save()
                    (System.nanoTime() - t0) / 1e9
                  }.min
                }
                Some((name, ts, ts(2) / math.max(1e-9, ts(1)) / 10.0))
              } catch {
                case e: Throwable =>
                  errors(s"scale_curve_$name") =
                    Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
                  None
              }
            }
          }
        }
      }
    // Measured super-linear slopes with a DOCUMENTED structural cause
    // (PLANS.md "Scale-curve adjudications"): the ppjoin mark is r18-
    // HISTORICAL — most of its old 3.36 slope was the broadcast verify-
    // join plan shape (PLANS.md "Verify-join plan shape"), fixed by the
    // shuffle-hash hints (17.5 s → ~3.3 s at sf0.1); the mark stays only
    // as a safety valve for its uncapped dense-df candidate window.
    // doc_containment_pairs
    // is the count path's own quadratic WINDOW on the same dense corpus:
    // candidate volume is Σ C(min(df,1000), 2) and the measured df is
    // still far below the cap at gate scale (maxdf 24 → 214 across the
    // decade, candidates 0.109 M → 11.2 M = docs², time slope 1.42 only
    // because the intercept still dominates) — the cap freezes per-term
    // candidates at C(1000,2) once blocks pass ~3k docs at this density,
    // after which growth is linear in blocks. The window is structural
    // to the dense corpus, bounded by the cap, and fully quantified in
    // PLANS.md.
    val scaleCurveAdjudicated = Set("doc_jaccard_pairs_ppjoin", "doc_containment_pairs")
    val scaleCurveJson = scaleCurve.map { case (name, ts, slope) =>
      "\"" + esc(name) + "\":{\"t\":[" + ts.map(ms0 => math.rint(ms0 * 1000) / 1000).mkString(",") +
        "],\"slope\":" + math.rint(slope * 1000) / 1000 +
        (if (scaleCurveAdjudicated(name)) ",\"adjudicated\":true" else "") + "}"
    }.mkString("{", ",", "}")
    val scaleCurveOk = scaleCurve.forall(e => e._3 <= 1.3 || scaleCurveAdjudicated(e._1))
    val qs = results.map { case (k, v) => "\"" + esc(k) + "\":" + v }.mkString("{", ",", "}")
    // doc-bracket probes join the volume probes in every line that
    // carries probe context (same never-in-queries/total rule)
    val allProbes = volProbes ++ docProbes
    val probesAllJson = allProbes.map { case (k, v) => "\"" + esc(k) + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
    val pinsJson = planPins.map { case (k, n) =>
      "\"" + esc(k) + "\":{\"measured\":" + n + ",\"pinned\":" + graft.plans.PlanAudit.pinnedExchanges(k) + "}"
    }.mkString("{", ",", "}")
    val pinsOk = planPins.forall { case (k, n) => n == graft.plans.PlanAudit.pinnedExchanges(k) }
    val shapeJson = shapePins.map { case (k, (ok, detail)) =>
      "\"" + esc(k) + "\":{\"ok\":" + ok + ",\"detail\":\"" + esc(detail) + "\"}"
    }.mkString("{", ",", "}")
    val shapesOk = shapePins.valuesIterator.forall(_._1)
    // total sums the canonical (median) entries only, not the per-run samples
    val total = results.collect { case (k, v) if v >= 0 && !k.matches(".*_run\\d+$") => v }.sum
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","agg":"vol_median_of_${reps}_rel_min_of_${regReps}","elapsed_sec":${math.rint(elapsedSec * 10) / 10},"deadline_sec":$deadlineSec,"deadline_degraded":${degraded.map(n => "\"" + esc(n) + "\"").mkString("[", ",", "]")},"deadline_skipped":${skippedBlocks.map(n => "\"" + esc(n) + "\"").mkString("[", ",", "]")},"queries":$qs,"probes":$probesAllJson,"plan_pins":$pinsJson,"plan_pins_ok":$pinsOk,"shape_pins":$shapeJson,"shape_pins_ok":$shapesOk,"scale_curve":$scaleCurveJson,"scale_curve_ok":$scaleCurveOk,"errors":$errJson,"n_failed":${errors.size},"sf":"${esc(sfDir)}"}"""
    println(fullLine)
    // the full per-query map ALSO lands in a file artifact: r7's stdout
    // capture truncated the long line and lost 80 queries' timings —
    // a file can't be clipped by a log window
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json"))
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(out, fullLine + "\n")
      println(s"""{"metric":"bench_file","path":"${esc(out.toString)}"}""")
      // ...and an IMMUTABLE per-run copy (CREATE_NEW, epoch-stamped):
      // later sanity runs overwrite bench_full.json, which once left a
      // round's artifact chain unreconstructable — history files are
      // write-once
      val hist = out.resolveSibling("bench_history")
      java.nio.file.Files.createDirectories(hist)
      val stamped = hist.resolve(s"bench_full_${System.currentTimeMillis / 1000}.json")
      java.nio.file.Files.writeString(stamped, fullLine + "\n",
        java.nio.file.StandardOpenOption.CREATE_NEW)
      println(s"""{"metric":"bench_history_file","path":"${esc(stamped.toString)}"}""")
    } catch { case e: Throwable => Console.err.println(s"bench file write failed: $e") }
    // ...and once more near the end: whether the driver's capture window
    // is line- or byte-bounded from either end, the volume headlines
    // survive when the window is generous.
    println(s"""{"metric":"volume_headline","unit":"sec","queries":$volQs,"probes":$probesJson,"sf":"${esc(sfDir)}"}""")
    // compact atlas line: r10's capture window was 2000 BYTES, and
    // volume_headline (with its flat _runN samples) + total_summary
    // together overflow that — the table regenerator lost the atlas
    // medians. This line rounds to ms and nests each headline's per-run
    // samples as a compact array next to its median ("m"/"r"), so the
    // SAMPLES survive the window too (r11: the zarr_bit median was
    // unadjudicatable because its runs lived only in the truncated flat
    // form — a median without its spread can't separate a regression
    // from one bad rep on a contended disk).
    val volByName = volume.toMap
    def ms(v: Double): Double = math.rint(v * 1000) / 1000
    val volMedJson = volume
      .filterNot { case (k, _) => k.matches(".*_run\\d+$") }
      .map { case (k, v) =>
        val runs = (1 to reps).flatMap(i => volByName.get(s"${k}_run$i"))
        val rj = if (runs.isEmpty) "" else runs.map(ms).mkString(",\"r\":[", ",", "]")
        "\"" + esc(k) + "\":{\"m\":" + ms(v) + rj + "}"
      }
      .mkString("{", ",", "}")
    println(s"""{"metric":"atlas_summary","unit":"sec","queries":$volMedJson}""")
    // short summary as the FINAL line: the driver's capture window is
    // byte-bounded from the left, so the (long) total line can lose its
    // head — this one always survives whole
    val nCanonical = results.count { case (k, v) => v >= 0 && !k.matches(".*_run\\d+$") }
    // probes in the FINAL line are medians only, ms-rounded — the stage
    // probes' _runN samples would push total_summary past the 2 KB
    // capture window the line exists to fit
    val probesCompact = allProbes.toSeq
      .filterNot { case (k, _) => k.matches(".*_run\\d+$") }
      .map { case (k, v) => "\"" + esc(k) + "\":" + (math.rint(v * 1000) / 1000) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total_summary","value":$total,"unit":"sec","agg":"vol_median_of_${reps}_rel_min_of_${regReps}","elapsed_sec":${math.rint(elapsedSec * 10) / 10},"deadline_degraded":${degraded.size},"deadline_skipped":${skippedBlocks.size},"n_queries":$nCanonical,"n_failed":${errors.size},"plan_pins":$pinsJson,"plan_pins_ok":$pinsOk,"shape_pins":$shapeJson,"shape_pins_ok":$shapesOk,"probes":$probesCompact,"sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
