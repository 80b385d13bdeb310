package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md §2
  * north-star ops): exact, MinHash+LSH, SimHash, token-set Jaccard,
  * embedding-cosine near-dup.
  *
  * Scale design: every signature computation is a narrow per-row array
  * expression (codegen'd, no UDFs, no shuffle); candidate generation
  * shuffles only (key, id) pairs — LSH band buckets or block keys — never
  * document text. Pairwise work is always confined to a bucket/block, so
  * nothing is quadratic in the corpus.
  */
object Dedup {

  /** Exact dedup via content hash: one hash-partitioned aggregate. At 100 TB
    * md5(text) groups distribute uniformly; the doc payload never shuffles
    * (only hash + id).
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Deterministic, engine-portable train/validation split: a document's
    * split derives from the lexicographic order of md5(id) against a hex
    * threshold — reproducible everywhere (no RNG, no engine-specific
    * hash), stable under corpus growth (a doc's split never changes), and
    * stratification-friendly (uniform within any subpopulation). The
    * standard trick for split assignment in large-corpus pipelines.
    * `valPrefix` "2" ≈ 1/8 validation (hex first char < '2').
    */
  def splitColumn(idCol: Column, valPrefix: String = "2"): Column =
    when(md5(idCol.cast("string").cast("binary")) < valPrefix, "val").otherwise("train")

  /** Benchmark-contamination detection: flag corpus documents sharing any
    * word n-gram with an evaluation set — the standard n-gram-collision
    * decontamination check a training corpus runs before release.
    *
    * Scale shape: the benchmark's distinct shingle set is BROADCAST (eval
    * suites are tiny next to a 100 TB corpus); the corpus side is one
    * narrow shingle scan + map-side join + per-doc count. Nothing
    * all-pairs, corpus text never shuffles.
    *
    * Returns every non-benchmark doc with its shared-distinct-n-gram
    * count and a flag at `minHits`.
    */
  def contamination(
      docs: DataFrame,
      benchFilter: Column,
      n: Int = 3,
      minHits: Long = 1L,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    val benchGrams = docs.filter(benchFilter)
      .select(explode(shingles(textCol, n)).as("g")).distinct()
    val corpusGrams = docs.filter(!benchFilter)
      .select(col(idCol), explode(shingles(textCol, n)).as("g"))
    val hits = corpusGrams
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"))
    docs.filter(!benchFilter).select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_shared_ngrams"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("n_shared_ngrams"), lit(0L)) >= minHits).as("contaminated"),
      )
      .orderBy(col(idCol))
  }

  /** Content-defined chunking (CDC) dedup: chunk boundaries come from the
    * CONTENT (a boundary falls after character position p iff the md5 of
    * the w-char window ending at p starts with hex '0', P=1/16 → expected
    * chunk ≈ w+16 chars), so an insertion or deletion only re-chunks its
    * neighborhood — every chunk after the edit re-aligns, the property
    * fixed-stride chunking lacks and the reason storage/dedup systems
    * chunk this way (Muthitacharoen et al., "A Low-Bandwidth Network File
    * System", SOSP 2001; FastCDC, USENIX ATC 2016). Where
    * [[duplicateSpans]] counts fixed-width token windows, CDC finds
    * shared VARIABLE-length passages robust to offset shift.
    *
    * Returns per doc: `n_chunks` and `n_shared_chunks` (distinct chunk
    * contents appearing in ≥ 2 distinct docs). The chunker is the
    * codegen'd single-pass [[graft.functions.CdcChunks]] kernel — the
    * boundary rule is deliberately md5 so DuckDB replays it verbatim,
    * and DedupSpec pins the kernel chunk-for-chunk against an
    * independent built-in-HOF formulation of the same rule. The O(w·n)
    * digest cost is the md5-window discipline duplicateSpans uses; the
    * same rolling-hash swap (gear hashing) applies at 100 TB where
    * hashing throughput matters more than oracle replayability.
    * Counting only — no pair stream, nothing quadratic in doc count:
    * one distinct over (doc, chunk-hash), one count per hash, one
    * rollup per doc.
    */
  def cdcChunkStats(
      docs: DataFrame,
      w: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    // the chunker is the native single-pass kernel (one reused digest,
    // byte-range hashing — CdcKernels); DedupSpec pins it chunk-for-chunk
    // against the built-in-HOF formulation of the same boundary rule,
    // which costs ~10× in per-window UTF8String + MessageDigest churn
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val chunked = docs.select(
      col(idCol),
      graft.functions.GraftFunctions.cdcChunks(col(textCol), w).as("chunks"))
    val docChunk = chunked
      .select(col(idCol), explode(col("chunks")).as("c"))
      .select(col(idCol), md5(col("c").cast("binary")).as("h"))
      .distinct()
    val popular = docChunk.groupBy(col("h"))
      .agg(count(lit(1)).as("nd")) // rows are distinct (doc, hash) pairs
      .filter(col("nd") >= 2)
      .select(col("h"))
    val shared = docChunk.join(popular, Seq("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_chunks"))
    chunked.select(col(idCol), size(col("chunks")).cast("bigint").as("n_chunks"))
      .join(shared, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_chunks"),
        coalesce(col("n_shared_chunks"), lit(0L)).as("n_shared_chunks"))
      .orderBy(col(idCol))
  }

  /** The 100 TB shape of [[contamination]]: a BLOOM-FILTER pre-filter on
    * the corpus side before the exact join. [[contamination]] broadcasts
    * the exact benchmark n-gram SET and joins every corpus shingle
    * against it — at gate scale that broadcast is small, but a real
    * benchmark suite's n-gram set runs to billions of entries, too big
    * to broadcast as rows. This variant builds a Bloom filter over the
    * benchmark grams DISTRIBUTED (`bloom_filter_agg`, map-side partial
    * merge — only the filter's bytes ever reach the driver), ships those
    * bytes as a binary plan constant, and drops non-matching corpus
    * shingles map-side inside the scan stage (Spark's codegen'd
    * `BloomFilterMightContain`) — so the shuffle/join stage sees only
    * (true hits + fpp·corpus) shingles instead of all of them.
    *
    * False positives cannot reach the output: survivors still pass
    * through the SAME exact broadcast join as [[contamination]], so the
    * result is row-identical to it by construction (the registered twin
    * gate asserts this against the identical oracle). numBits is sized
    * at 16 bits/gram ≈ 0.04% fpp — ~2 GiB of filter per billion grams,
    * broadcastable where the row set is not.
    */
  def contaminationBloom(
      docs: DataFrame,
      benchFilter: Column,
      n: Int = 3,
      minHits: Long = 1L,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    import graft.functions.GraftFunctions
    GraftFunctions.register(docs.sparkSession)
    val benchGrams = docs.filter(benchFilter)
      .select(explode(shingles(textCol, n)).as("g")).distinct()
    // one count + one aggregate over the (deduplicated) bench grams —
    // both tiny relative to the corpus scan they save
    val nGrams = math.max(benchGrams.count(), 1L)
    val bfBytes = benchGrams
      .select(GraftFunctions.bloomAgg(xxhash64(col("g")), nGrams, nGrams * 16).as("bf"))
      .head().getAs[Array[Byte]](0)
    val corpusGrams = docs.filter(!benchFilter)
      .select(col(idCol), explode(shingles(textCol, n)).as("g"))
      .filter(GraftFunctions.bloomMightContain(lit(bfBytes), xxhash64(col("g"))))
    val hits = corpusGrams
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"))
    docs.filter(!benchFilter).select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_shared_ngrams"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("n_shared_ngrams"), lit(0L)) >= minHits).as("contaminated"),
      )
      .orderBy(col(idCol))
  }

  /** Connected components over a near-duplicate pair list — the clustering
    * step every real dedup pipeline runs on its candidate pairs (keep one
    * representative per component). Deterministic min-id labels via
    * distributed GRAPH CONTRACTION (the star-contraction family of
    * MapReduce CC algorithms): each round builds the star map
    * m(u) = min(u, neighbors), POINTER-DOUBLES m to its fixpoint (each
    * inner step composes m with itself, squaring the jump length —
    * log(chain) self-joins), rewrites both edge endpoints through m and
    * drops self-loops, and folds m into the global node→label map. Every
    * non-singleton contracted node absorbs at least one other, so live
    * nodes at least HALVE per round — ≤ log₂(component) rounds
    * regardless of diameter (a prior min-propagation form was
    * diameter-bound: a 16³ percolation mask needed 45 rounds; this
    * design needs 4). The edge set also shrinks every round, so late
    * rounds are near-free. Nothing is quadratic, nothing collects.
    *
    * Two scale-critical mechanics, both measured:
    *   - localCheckpoint per round truncates the iterative plan (without
    *     it Catalyst re-analysis dominates by round 3: 2.7 s → 33 s).
    *   - the checkpointed frame is REBUILT from its materialized RDD
    *     ([[ckFresh]]) because localCheckpoint SNAPSHOTS the optimized
    *     plan's sizeInBytes, and an iterative self-join SQUARES that
    *     BigInt every round — by round ~15 Catalyst's stats visitor does
    *     multi-million-digit BigInteger multiplication on the DRIVER
    *     (observed: minutes of planner CPU for millisecond jobs). The
    *     rebuild resets stats to the session default at the cost of one
    *     Row conversion over (long, long) rows.
    *
    * Returns (id, cluster_rep) for every id appearing in `pairs`,
    * cluster_rep = smallest id in the component.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIters: Int = 40,
  ): DataFrame = {
    val spark = pairs.sparkSession

    // eager checkpoint + stats reset (see scaladoc); the observation on
    // `df`, if any, fires during the checkpoint's job
    def ckFresh(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint(true)
      spark.createDataFrame(ck.rdd, ck.schema)
    }
    def obsLong(obs: org.apache.spark.sql.Observation, key: String): Long =
      obs.get(key) match {
        case null => 0L
        case n: Long => n
        case n: Number => n.longValue()
      }

    // bidirectional edges: min-propagation is idempotent over duplicate
    // edges, so no distinct() — the init is a pure narrow union (and
    // pre-partitioning would not survive localCheckpoint anyway: the
    // materialized plan scans a plain ExistingRDD with unknown
    // partitioning — DedupSpec pins this)
    var edges = ckFresh(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst"))))

    var labels: DataFrame = null // original node → current rep, grown per round
    var iter = 0
    var done = false
    while (iter < maxIters && !done) {
      // star map over the current contracted graph
      var m = ckFresh(
        edges.groupBy(col("src").as("id"))
          .agg(least(min(col("dst")), col("src")).as("rep")))
      // pointer-double m to its fixpoint: m := m ∘ m. m maps into its own
      // domain (every rep is some node's id), so the left join's coalesce
      // only fires for already-terminal chains.
      var j = 0
      var mDone = false
      while (j < 64 && !mDone) {
        val obs = org.apache.spark.sql.Observation(s"cc_double_${iter}_$j")
        val composed = m.as("l")
          .join(m.select(col("id").as("rep"), col("rep").as("rep2")).as("r"), Seq("rep"), "left")
          .select(col("id"), coalesce(col("rep2"), col("rep")).as("rep"), col("rep").as("old"))
          .observe(obs, sum(when(col("rep") =!= col("old"), 1L).otherwise(0L)).as("changed"))
        val ck = ckFresh(composed)
        mDone = obsLong(obs, "changed") == 0L
        m = ck.select(col("id"), col("rep"))
        j += 1
      }
      require(mDone, s"star-map doubling did not reach a fixpoint in 64 steps")
      // contract: rewrite both endpoints, drop self-loops; count survivors
      // in the same job that materializes the round
      val obsE = org.apache.spark.sql.Observation(s"cc_contract_$iter")
      val contracted = edges
        .join(m.select(col("id").as("src"), col("rep").as("src_rep")), Seq("src"))
        .join(m.select(col("id").as("dst"), col("rep").as("dst_rep")), Seq("dst"))
        .select(col("src_rep").as("src"), col("dst_rep").as("dst"))
        .filter(col("src") =!= col("dst"))
        .observe(obsE, count(lit(1L)).as("n"))
      edges = ckFresh(contracted)
      done = obsLong(obsE, "n") == 0L
      // fold m into the global map (round 1: m IS the global map — its
      // domain is every original node)
      labels =
        if (labels == null) m
        else ckFresh(
          labels.as("l")
            .join(m.select(col("id").as("rep"), col("rep").as("rep2")).as("r"), Seq("rep"), "left")
            .select(col("id"), coalesce(col("rep2"), col("rep")).as("rep")))
      iter += 1
    }
    // node count halves per round, so 40 rounds covers 2^40-node
    // components. A silent partial clustering would be data corruption —
    // fail loudly.
    require(done,
      s"connectedComponents did not converge in $maxIters rounds — raise maxIters")
    labels.select(col("id"), col("rep").as("cluster_rep")).orderBy(col("id"))
  }

  /** Distinct-token array for shingle/set based dedup. */
  private def tokenSet(textCol: String): Column = array_distinct(split(col(textCol), " "))

  /** Repeated-passage detection — the window form of exact substring
    * dedup (the suffix-array pass of arXiv:2107.06499 §4.1, re-expressed
    * for a distributed engine): every W-token window of every document is
    * fingerprinted, and a window whose fingerprint occurs ≥2 times in
    * the corpus (across docs OR repeated inside one doc) is a duplicated
    * span. Any duplicated substring of ≥ W tokens contains such a
    * window, so per-doc duplicated-window counts bound span-level
    * duplication from below — the standard scalable approximation to the
    * suffix-array pass.
    *
    * Returns one row per document: `n_windows`, `n_dup_windows` (its
    * windows whose fingerprint repeats corpus-wide).
    *
    * Scale shape: fingerprinting is a narrow codegen'd per-row transform
    * (no UDF); only (fingerprint, id) pairs ever shuffle — document text
    * never moves, and there is NO pair stream at all (counting, not pair
    * generation), so nothing is quadratic however hot a boilerplate
    * window is. md5 is used as the fingerprint because the DuckDB oracle
    * computes the identical digest; the production form with the same
    * shape and a cheaper 128-bit rolling fingerprint is
    * [[duplicateSpansRolling]], gate-pinned to this one's oracle.
    */
  def duplicateSpans(
      docs: DataFrame,
      w: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    spanDupCounts(docs, w, idCol, textCol, toksCol => expr(
      s"""case when size($toksCol) >= $w
         |  then transform(sequence(0, size($toksCol) - $w),
         |                 i -> md5(array_join(slice($toksCol, i + 1, $w), ' ')))
         |  else array()
         |end""".stripMargin))
  }

  /** The O(n) scale strategy for [[duplicateSpans]]: identical output (one
    * row per doc, window/dup-window counts), but windows are fingerprinted
    * by [[graft.functions.WindowFps128]] — each token's bytes hash ONCE
    * (per stream) and TWO independent Rabin-Karp rolling updates produce
    * every window's 128-bit (hi, lo) fingerprint, where the md5 form
    * re-hashes all W tokens per position (O(W·n) digest work, ~16× the
    * hashing at the default W=8 before md5's own per-call cost). Counting
    * semantics are fingerprint-agnostic, so the two forms agree exactly
    * unless BOTH 64-bit streams collide on two DISTINCT windows at once:
    * the 64-bit form's n²/2⁶⁵ budget is ~3% at 10⁹ windows and ~certain
    * at a 100 TB corpus's 10¹³⁺, which is why the registered operator
    * rolls 128 bits (n²/2¹²⁹ < 10⁻¹¹ at 10¹⁷ windows); the 64-bit
    * expression remains available but demoted. The query gate pins this
    * form to the md5 twin's IDENTICAL oracle, so a width regression or
    * stream-independence bug fails the hash, not a code review.
    */
  def duplicateSpansRolling(
      docs: DataFrame,
      w: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    spanDupCounts(docs, w, idCol, textCol,
      toksCol => graft.functions.GraftFunctions.windowFps128(col(toksCol), w))
  }

  /** Shared counting stage of the span-dedup twins: explode per-window
    * fingerprints, count corpus-wide occurrences, and emit per-doc
    * (n_windows, n_dup_windows). Only (fingerprint, id) pairs shuffle;
    * text never moves and no pair stream exists (counting, not pair
    * generation) — nothing is quadratic however hot a boilerplate window
    * is.
    */
  private def spanDupCounts(
      docs: DataFrame,
      w: Int,
      idCol: String,
      textCol: String,
      fps: String => Column,
  ): DataFrame = {
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("toks"))
    val wins = toks.select(col(idCol), explode(fps("toks")).as("wh"))
    // a window is a duplicated span iff its fingerprint occurs >= 2 times
    // corpus-wide; semi-joining the per-doc window stream against the
    // duplicated set reuses the wh partitioning from the count aggregate
    val dupW = wins.groupBy(col("wh")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select(col("wh"))
    val dupCounts = wins.join(dupW, Seq("wh"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_windows"))
    toks
      .select(col(idCol),
        greatest(size(col("toks")) - lit(w - 1), lit(0)).cast("long").as("n_windows"))
      .join(dupCounts, Seq(idCol), "left")
      .select(col(idCol), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .orderBy(col(idCol))
  }

  /** REMOVE duplicated spans — the curation action behind
    * [[duplicateSpans]]'s counts (Lee et al., arXiv:2107.06499 §4:
    * deduplicating the substrings themselves, not just flagging docs):
    * every token covered by ANY window whose fingerprint occurs ≥ 2
    * times corpus-wide is dropped, and the kept tokens re-join into the
    * cleaned text. Output per doc: n_tokens, n_removed, and cleaned_fp
    * (md5 of the cleaned text — a full-strength reconstruction gate; the
    * oracle rebuilds the cleaned string independently and must match the
    * digest exactly).
    *
    * Shape: the same counting stage as duplicateSpans (only
    * (fingerprint, doc, pos) rows shuffle; no pair stream), then each
    * doc's duplicated-window START LIST (bounded by the doc's window
    * count) joins back and one codegen'd HOF pass drops covered tokens.
    * The coverage test is exists-over-starts per token — O(n·|starts|)
    * worst-case on a fully-boilerplate doc; the difference-array form
    * (+1 at s, −1 at s+w, prefix sum) is the adversarial-doc variant,
    * same join shape.
    */
  def removeDuplicateSpans(
      docs: DataFrame,
      w: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("toks"))
    val wins = toks.select(col(idCol), posexplode(expr(
      s"""case when size(toks) >= $w
         |  then transform(sequence(0, size(toks) - $w),
         |                 i -> md5(array_join(slice(toks, i + 1, $w), ' ')))
         |  else array()
         |end""".stripMargin)))
      .toDF(idCol, "s", "wh")
    val dupW = wins.groupBy(col("wh")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select(col("wh"))
    // per-doc duplicated-window start list (coverage is order-independent,
    // so collect_list's nondeterministic order is immaterial)
    val starts = wins.join(dupW, Seq("wh"), "left_semi")
      .groupBy(col(idCol))
      .agg(collect_list(col("s")).as("ss"))
    val n = size(col("toks"))
    val idxs = when(n > 0, sequence(lit(0), n - 1)).otherwise(array().cast("array<int>"))
    val ss = coalesce(col("ss"), array().cast("array<int>"))
    val keptIdx = filter(idxs, i => !exists(ss, s => s <= i && i < s + w))
    val kept = transform(keptIdx, i => element_at(col("toks"), i + 1))
    toks.join(starts, Seq(idCol), "left")
      .select(
        col(idCol),
        n.cast("long").as("n_tokens"),
        (n - size(kept)).cast("long").as("n_removed"),
        md5(array_join(kept, " ").cast("binary")).as("cleaned_fp"))
      .orderBy(col(idCol))
  }

  /** Distinct word n-gram shingles — the unit real near-dup pipelines
    * compare (order-sensitive, unlike bare tokens). Pure codegen'd
    * higher-order functions: no UDF, no shuffle.
    */
  def shingles(textCol: String, n: Int = 3): Column = {
    val w = split(col(textCol), " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - (n - 1), lit(0))),
      i => concat_ws(" ", slice(w, i, lit(n))),
    ))
  }

  /** MinHash signatures over distinct tokens via the native
    * [[graft.functions.MinHashSig]] expression (each token's bytes hash
    * once; the per-seed family is a splitmix64 finalizer — vs the
    * interpreted HOF formulation that re-hashed every token numHashes
    * times). Plus LSH banding: bands of rows hashed together — docs
    * sharing any band hash are near-dup candidates.
    */
  def minhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 32,
      bands: Int = 8,
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("minhash_sig", graft.functions.GraftFunctions.minhashSig(tokenSet(textCol), numHashes))
      .withColumn(
        "band_hashes",
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("minhash_sig"), b * lit(rows) + 1, lit(rows))),
        ),
      )
      .select(col(idCol), col("minhash_sig"), col("band_hashes"))
  }

  /** LSH candidate pairs: explode band hashes, self-join per bucket.
    * estJaccard = fraction of agreeing signature positions.
    *
    * `maxBucketSize` is the skew guard: a degenerate bucket (e.g. a
    * boilerplate band shared by millions of docs) would otherwise go
    * quadratic; buckets above the cap are dropped with a documented recall
    * cost — true near-dup pairs still collide in their other bands with
    * probability 1-(1-j^r)^(b-1).
    */
  def minhashCandidatePairs(
      sigs: DataFrame,
      idCol: String = "doc_id",
      maxBucketSize: Int = 1000,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(sigs.sparkSession)
    val buckets = sigs.select(
      col(idCol),
      col("minhash_sig"),
      posexplode(col("band_hashes")).as(Seq("band", "bucket")),
    )
    val capped = buckets
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    val a = capped.select(col("band"), col("bucket"), col(idCol).as("id_a"), col("minhash_sig").as("sig_a"))
    val b = capped.select(col("band"), col("bucket"), col(idCol).as("id_b"), col("minhash_sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn(
        "est_jaccard",
        // codegen'd agreement count (graft_sig_agree) — the zip_with +
        // aggregate HOF form interpreted two lambdas per signature
        // position per candidate pair; the integer count divided by the
        // signature width is the identical double
        graft.functions.GraftFunctions.sigAgree(col("sig_a"), col("sig_b"))
          / size(col("sig_a")),
      )
      // emitted unrounded: int-agreement / int-width is already the identical
      // double everywhere; ROUND(x, d>0) is banned repo-wide (Fx.scala)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Expand each >1-member group's sorted `members` array into ordered
    * (id_a, id_b) pairs — the required output of a dedup pass.
    */
  private def explodePairs(groups: DataFrame): DataFrame =
    groups
      .filter(size(col("members")) > 1)
      .select(explode(expr(
        """flatten(transform(members, (a, i) ->
          |  transform(slice(members, i + 2, size(members)), b ->
          |    struct(a AS id_a, b AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))

  /** Exact-duplicate pairs at jaccard = 1 via FULL-signature grouping: an
    * identical token set always yields an identical MinHash signature, so
    * grouping by the whole signature has exact recall at j=1 and shuffles
    * only (signature, id) — no candidate-pair explosion, no banding needed.
    * (Banded [[minhashCandidatePairs]] is the sub-1.0-threshold path.)
    * Hash coincidences are removed downstream by exact verification.
    */
  def minhashDupPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    explodePairs(
      minhash(docs, idCol, textCol)
        .groupBy(col("minhash_sig"))
        .agg(sort_array(collect_list(col(idCol))).as("members")))

  /** Hamming-0 SimHash pairs via direct value grouping (distance 0 ⇔ equal
    * hash — banding is only needed for distance ≥ 1). Shuffles (hash, id).
    */
  def simhashDupPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    explodePairs(
      simhash(docs, idCol, textCol)
        .groupBy(col("simhash"))
        .agg(sort_array(collect_list(col(idCol))).as("members")))

  /** 64-bit SimHash over whitespace tokens (term frequency weighted):
    * bit j is set iff the ±1 votes from token hashes sum positive. Native
    * [[graft.functions.SimHash64]] kernel — one token hash + 64 integer
    * ops per token, vs the interpreted 64-pass HOF formulation.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(
      col(idCol),
      graft.functions.GraftFunctions.simhash64(split(col(textCol), " ")).as("simhash"),
    )
  }

  /** Hamming distance between two long columns (bit_count of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("bigint")

  /** SimHash near-dup pairs within maxHamming. Banding on 16-bit chunks
    * (pigeonhole: distance ≤3 ⇒ some 16-bit quarter is identical) keeps the
    * join bucketed instead of all-pairs.
    */
  def simhashPairs(sims: DataFrame, idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    val chunked = sims.select(
      col(idCol),
      col("simhash"),
      posexplode(expr("transform(sequence(0, 3), q -> (shiftright(simhash, q * 16) & 65535))"))
        .as(Seq("quarter", "qval")),
    )
    val a = chunked.select(col("quarter"), col("qval"), col(idCol).as("id_a"), col("simhash").as("sim_a"))
    val b = chunked.select(col("quarter"), col("qval"), col(idCol).as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("quarter", "qval"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact token-set Jaccard similarity ≥ threshold via a count-based
    * inverted-index join, blocked by `blockCol`: pair intersection sizes
    * come from a groupBy COUNT over co-occurrences, so nothing wider than
    * (block, term, id) ever shuffles. The right strategy when the
    * vocabulary is dense relative to the corpus (most terms co-occur
    * anyway, so pruning can't help but array-shipping would hurt).
    * For realistic large-vocab text, where a handful of stop-terms would
    * fan a block into |block|² pairs, use [[tokenJaccardPairsPrefix]].
    *
    * Skew guard (`maxTermDf`, mirroring `minhashCandidatePairs`'
    * `maxBucketSize`): a (block, term) posting list longer than the cap is
    * excluded from CANDIDATE generation, so one stop-term shared by a
    * whole block can no longer fan out |block|² co-occurrence rows — the
    * guard a 100 TB corpus needs. Emitted jaccard values stay EXACT:
    * dense terms still count toward the intersection through a per-doc
    * dense-term list (short by construction — only terms with df > cap)
    * intersected at verify time. The only loss is recall for pairs whose
    * ENTIRE overlap is dense terms (the analogue of minhash's documented
    * bucket-cap recall cost); the prefix-filtered twin remains the
    * lossless path.
    */
  def tokenJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      blockCol: String = "source",
      threshold: Double = 0.5,
      terms: Column = null, // defaults to the distinct-token set of textCol
      maxTermDf: Int = 1000,
  ): DataFrame =
    pairIntersections(docs, idCol, textCol, blockCol, terms, maxTermDf)
      .withColumn("jaccard_raw", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard_raw").as("jaccard"))

  /** Exact token-set CONTAINMENT ≥ threshold — the asymmetric cousin of
    * Jaccard: containment(A ⊑ B) = |A∩B| / |A| finds SUB-document
    * duplication (a doc whose content rides inside a larger one —
    * quote-heavy pages, concatenated dumps, boilerplate supersets) that
    * symmetric Jaccard misses whenever the size ratio is large. Same
    * posting-list intersection stream as [[tokenJaccardPairs]]; each
    * unordered pair emits up to two DIRECTED (doc_sub, doc_sup) rows.
    */
  def tokenContainmentPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      blockCol: String = "source",
      threshold: Double = 0.9,
      maxTermDf: Int = 1000,
  ): DataFrame = {
    val frame = pairIntersections(docs, idCol, textCol, blockCol, null, maxTermDf)
    val ab = frame.select(col("doc_a").as("doc_sub"), col("doc_b").as("doc_sup"),
      (col("c") / col("na")).as("containment"))
    val ba = frame.select(col("doc_b").as("doc_sub"), col("doc_a").as("doc_sup"),
      (col("c") / col("nb")).as("containment"))
    ab.unionAll(ba).filter(col("containment") >= threshold)
  }

  /** Shared exact pair-intersection frame behind [[tokenJaccardPairs]] /
    * [[tokenContainmentPairs]]: one row per co-occurring in-block pair
    * with the exact distinct-token intersection count `c` and both set
    * sizes (na, nb). All the scale machinery lives here — eager
    * tokenize-once checkpoint, df-capped postings with the dense-term
    * exact correction, i<j pair generation from sorted postings.
    */
  private def pairIntersections(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      terms: Column,
      maxTermDf: Int,
  ): DataFrame = {
    // Tokenize/shingle ONCE into a materialized per-doc array frame: the
    // term arrays feed three consumers (per-doc sizes, term-df, tagging)
    // and shingling is the dominant per-row cost — without the eager
    // checkpoint each consumer re-runs it (measured +30% on the shingle
    // form). Materialized size ≈ the corpus text itself, far below the
    // exploded term stream the downstream shuffles already carry.
    val base = docs.select(col(idCol), col(blockCol),
        Option(terms).getOrElse(tokenSet(textCol)).as("toks"))
      .localCheckpoint(true)
    val tok = base.select(col(idCol), col(blockCol), explode(col("toks")).as("term"))
    val sizes = base.select(col(idCol), size(col("toks")).cast("long").as("n"))
    val termDf = tok.groupBy(col(blockCol), col("term")).agg(count(lit(1)).as("df"))
    val tagged = tok.join(termDf, Seq(blockCol, "term"))
    val rare = tagged.filter(col("df") <= maxTermDf)
    // per-doc list of its over-cap terms: ≤ vocab-above-cap entries, so
    // shipping it is O(#stop-terms), not O(doc)
    val dense = tagged.filter(col("df") > maxTermDf)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("term"))).as("dense_toks"))
    // Pair generation via per-term sorted POSTINGS, not a self-join:
    // emitting only the i<j combinations (posexplode + slice) halves the
    // pair stream the old a<b filter threw away post-join and drops the
    // join hash-build. Executed-plan audit: AQE broadcasts the df join,
    // so this costs ONE exchange of the rare term stream (with map-side
    // partial collect_list) — vs the join's same exchange plus double
    // pair generation. Postings arrays are bounded by maxTermDf, so no
    // stop-term list can blow task memory. Measured at sf0.1/32 cores:
    // full query 4.0 s -> 2.9 s (a custom pair Generator measured
    // SLOWER — CodegenFallback breaks the codegen span; see PLANS.md).
    val postings = rare.groupBy(col(blockCol), col("term"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
    val inter = postings
      .select(posexplode(col("ids")).as(Seq("i", "doc_a")), col("ids"))
      .select(col("doc_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("c_rare"))
    val emptyArr = array().cast("array<string>")
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .join(dense.select(col(idCol).as("doc_a"), col("dense_toks").as("dense_a")), Seq("doc_a"), "left")
      .join(dense.select(col(idCol).as("doc_b"), col("dense_toks").as("dense_b")), Seq("doc_b"), "left")
      .withColumn("c", col("c_rare") + size(array_intersect(
        coalesce(col("dense_a"), emptyArr), coalesce(col("dense_b"), emptyArr))).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("c"), col("na"), col("nb"))
  }

  /** Exact token-set Jaccard ≥ threshold via PREFIX-FILTERED candidate
    * generation (PPJoin-style): index only each doc's `n - ⌈t·n⌉ + 1`
    * tokens rarest by in-block document frequency (lossless by the prefix
    * theorem — a pair with jaccard ≥ t must overlap inside both prefixes),
    * then verify candidates exactly. Identical output to
    * [[tokenJaccardPairs]]; wins on realistic large-vocabulary corpora
    * where rare prefix terms make candidate buckets tiny, loses on dense
    * tiny vocabularies where nothing is rare (measured on the harness
    * corpus: 4× slower — hence both strategies exist).
    */
  def tokenJaccardPairsPrefix(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      blockCol: String = "source",
      threshold: Double = 0.5,
      terms: Column = null, // defaults to the distinct-token set of textCol
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokenize ONCE (the same eager checkpoint as pairIntersections):
    // `toks` feeds four consumers — the prefix explode, the df exchange,
    // and both verify joins — and without the checkpoint the shingle/
    // tokenize pipeline re-runs per consumer (r18: the un-checkpointed
    // form measured 21.5 s vs 6.4 s at sf0.1 on the containment twin)
    val toks = docs.select(
      col(idCol), col(blockCol),
      array_sort(Option(terms).getOrElse(tokenSet(textCol))).as("toks"),
    ).withColumn("n", size(col("toks")).cast("long"))
      .localCheckpoint(true)
    val tok = toks.select(col(idCol), col(blockCol), col("n"), explode(col("toks")).as("term"))
    val termDf = tok.groupBy(col(blockCol), col("term")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col(idCol)).orderBy(col("df"), col("term"))
    val prefix = tok
      .join(termDf, Seq(blockCol, "term"))
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("n") - ceil(col("n") * threshold) + 1)
      .select(col(blockCol), col("term"), col(idCol))
    val cands = prefix.select(col(blockCol), col("term"), col(idCol).as("doc_a"))
      .join(prefix.select(col(blockCol), col("term"), col(idCol).as("doc_b")), Seq(blockCol, "term"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // shuffle-hash verify joins — same rationale as the containment twin:
    // never broadcast the corpus-sized token-array frame, and keep an
    // exchange boundary below downstream sorts (whose range-partition
    // sampling would otherwise re-execute the joins)
    cands
      .join(toks.select(col(idCol).as("doc_a"), col("toks").as("toks_a"), col("n").as("na"))
        .hint("shuffle_hash"), Seq("doc_a"))
      .join(toks.select(col(idCol).as("doc_b"), col("toks").as("toks_b"), col("n").as("nb"))
        .hint("shuffle_hash"), Seq("doc_b"))
      .withColumn("c", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("jaccard_raw", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard_raw").as("jaccard"))
  }

  /** The crossover variables of the two exact-Jaccard strategies (the
    * ones PLANS.md names: distinct-term count and df concentration),
    * reduced to the decision that matters — each strategy's estimated
    * CANDIDATE-PAIR volume:
    *
    *  - `countPathPairs` is exact: the count-based posting join emits
    *    Σ_{df ≤ maxTermDf} C(df, 2) co-occurrence rows — over-cap terms
    *    are EXCLUDED from candidate generation entirely (the dense-term
    *    list only corrects intersection counts of pairs already found),
    *    so they contribute zero, not C(cap, 2).
    *  - `prefixPathPairs` is an estimate: a doc's prefix indexes its
    *    n − ⌈t·n⌉ + 1 RAREST terms, so the total prefix-posting quota is
    *    filled from the df-ascending end of the vocabulary and pairs are
    *    summed there. Dense tiny vocabularies have no rare end — the
    *    quota lands on huge postings and the estimate (correctly)
    *    explodes; large Zipf vocabularies absorb the quota in df ≤ 3
    *    terms and the estimate collapses.
    */
  case class JaccardStrategyStats(
      nDocs: Long,
      nPostings: Long,
      vocab: Long,
      countPathPairs: Double,
      prefixPathPairs: Double,
      costWeight: Double = 8.0) {
    /** The chooser's verdict. Candidate volumes are weighted by
      * per-candidate cost: a count-path candidate is one counted
      * co-occurrence row through a groupBy, while a prefix-path candidate
      * pays a pair dedup plus joins shipping FULL token arrays plus
      * an exact array_intersect (the r12 measurement: prefix lost 4-16x
      * on the dense corpus at comparable candidate counts, won 9.5x on
      * the Zipf corpus where its volume collapses 100-1000x). The weight
      * sits safely inside all measured regimes — 8x for the symmetric
      * Jaccard verify join (two array-shipping joins), 3x for
      * containment (one-sided probe, n_sup size filter pre-pruning; the
      * r18 calibration: regimes demand w ∈ [2.6, 4.3]) — so the verdict
      * flips only on a genuine volume collapse, never on estimate noise.
      */
    def preferPrefix: Boolean = prefixPathPairs * costWeight < countPathPairs
  }

  /** ONE cheap stats pass measuring [[JaccardStrategyStats]]: a sizes
    * aggregate plus the per-(block, term) df HISTOGRAM-OF-HISTOGRAM —
    * the same tokenize + df exchange both strategies pay as their first
    * stage, collected as (df, n_terms) rows (bounded by distinct df
    * values, never by vocabulary). At 100 TB run it on a sampled
    * fraction — both pair-volume estimates scale by sample² and the
    * comparison is scale-free.
    */
  def jaccardStrategyStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      blockCol: String = "source",
      threshold: Double = 0.5,
      maxTermDf: Int = 1000,
  ): JaccardStrategyStats = {
    val (sizeHist, dfHist) = tokenHists(docs, textCol, blockCol)
    statsFromHists(sizeHist, dfHist, threshold, maxTermDf, containment = false)
  }

  /** The two bounded histograms every strategy decision derives from:
    * the DOC-SIZE histogram (distinct token-set sizes → doc count) and
    * the per-(block, term) DF histogram-of-histogram (df → term count).
    * Bounded by distinct sizes / distinct df values, never by corpus or
    * vocabulary — the same exchange both strategies pay as their first
    * stage. These are ALSO exactly what [[analyzeTokenStats]] persists:
    * any threshold/cap's strategy stats are pure driver-side algebra
    * over them, which is what makes the ANALYZE sidecar
    * threshold-independent CBO food rather than a cached decision.
    */
  private def tokenHists(
      docs: DataFrame, textCol: String, blockCol: String):
      (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val base = docs.select(col(blockCol), tokenSet(textCol).as("toks"))
    val sizeHist = base.select(size(col("toks")).cast("long").as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dfHist = base.select(col(blockCol), explode(col("toks")).as("term"))
      .groupBy(col(blockCol), col("term")).agg(count(lit(1)).as("df"))
      .groupBy(col("df")).agg(count(lit(1)).as("n_terms"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    (sizeHist, dfHist)
  }

  /** The shared strategy-stats algebra over the two histograms — one
    * implementation whether the histograms came from a live data pass
    * ([[jaccardStrategyStats]]/[[containmentStrategyStats]]) or from
    * the persisted `_zstats_tokens` sidecar
    * ([[strategyStatsFromAnalyzed]]), so the two routes CANNOT drift:
    * same ceil algebra for the prefix quota, same over-cap exclusion,
    * same df-ascending prefix fill.
    */
  private def statsFromHists(
      sizeHist: Seq[(Long, Long)],
      dfHist: Seq[(Long, Long)],
      threshold: Double,
      maxTermDf: Int,
      containment: Boolean): JaccardStrategyStats = {
    val nDocs = sizeHist.map(_._2).sum
    val nPost = sizeHist.map { case (n, c) => n * c }.sum
    val nPref = sizeHist.map { case (n, c) =>
      (n - math.ceil(n * threshold).toLong + 1L) * c
    }.sum
    val hist = dfHist.sortBy(_._1)
    val vocab = hist.map(_._2).sum
    val countPairs = hist.map { case (df, nt) =>
      // over-cap terms generate ZERO candidates (excluded, not truncated)
      if (df > maxTermDf) 0.0 else nt.toDouble * df * (df - 1) / 2
    }.sum
    var remaining = nPref.toDouble
    var prefixPairs = 0.0
    hist.foreach { case (df, nt) =>
      if (remaining > 0) {
        val mass = df.toDouble * nt
        val used = math.min(mass, remaining)
        // containment probes one-sidedly (each prefix posting joins the
        // FULL df − 1 index rows); Jaccard's two-sided prefix join emits
        // each candidate pair once per co-occurring prefix term
        prefixPairs += (if (containment) used * (df - 1).toDouble
                        else (used / df) * df.toDouble * (df - 1) / 2)
        remaining -= used
      }
    }
    JaccardStrategyStats(nDocs, nPost, vocab, countPairs, prefixPairs,
      costWeight = if (containment) 3.0 else 8.0)
  }

  /** ANALYZE for token dedup — the doc-corpus face of the layout
    * family's `_zstats` ANALYZE verb: persist the two bounded histograms
    * ([[tokenHists]]) as a tiny `kind/k/v` parquet sidecar, so every
    * subsequent [[tokenJaccardPairsAuto]]/[[tokenContainmentPairsAuto]]
    * call can make its strategy decision from STORED statistics (pure
    * driver algebra, zero Spark jobs) instead of re-paying the
    * tokenize + df exchange per call. Threshold-independent by
    * construction: the sidecar stores the histograms, not a verdict.
    * Staleness is the caller's contract, exactly as with `_zbloom` and
    * `_zstats` — and the chooser is only ever a COST decision, so stale
    * stats can mis-pick a strategy's speed, never its results (both
    * strategies are hash-gated against the same oracle every round).
    */
  def analyzeTokenStats(
      docs: DataFrame,
      statsDir: String,
      textCol: String = "text",
      blockCol: String = "source"): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (sizeHist, dfHist) = tokenHists(docs, textCol, blockCol)
    (sizeHist.map { case (k, v) => ("size", k, v) } ++
      dfHist.map { case (k, v) => ("df", k, v) })
      .toDF("kind", "k", "v")
      .coalesce(1)
      .write.mode("overwrite").parquet(statsDir)
  }

  /** Strategy stats from a persisted [[analyzeTokenStats]] sidecar —
    * the consume side of the ANALYZE verb. One tiny parquet read
    * (O(distinct sizes + distinct dfs) rows), then the same
    * [[statsFromHists]] algebra as the live pass.
    */
  def strategyStatsFromAnalyzed(
      spark: org.apache.spark.sql.SparkSession,
      statsDir: String,
      threshold: Double,
      maxTermDf: Int = 1000,
      containment: Boolean = false): JaccardStrategyStats = {
    val rows = spark.read.parquet(statsDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    statsFromHists(
      rows.filter(_._1 == "size").map(t => (t._2, t._3)).toSeq,
      rows.filter(_._1 == "df").map(t => (t._2, t._3)).toSeq,
      threshold, maxTermDf, containment)
  }

  /** COST-BASED exact-Jaccard: one [[jaccardStrategyStats]] pass picks
    * the strategy with the smaller estimated candidate volume, then runs
    * it — [[tokenJaccardPairsPrefix]] when rare prefix terms make
    * candidate buckets tiny (realistic large vocabularies),
    * [[tokenJaccardPairs]] on dense vocabularies where nothing is rare.
    * Output is identical either way (both strategies are hash-gated
    * against the same oracle every round; doc_jaccard_pairs_auto rides
    * it too), so the chooser can only change COST, never results —
    * except that only the count path carries the `maxTermDf` skew cap
    * (the prefix path is lossless and needs none).
    */
  def tokenJaccardPairsAuto(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      blockCol: String = "source",
      threshold: Double = 0.5,
      maxTermDf: Int = 1000,
      statsDir: Option[String] = None,
  ): DataFrame = {
    // persisted ANALYZE stats, when present, replace the per-call stats
    // pass (one tiny sidecar read instead of a tokenize + df exchange);
    // absent-or-missing falls back to the live pass, so the sidecar is
    // an accelerator, never a requirement
    val stats = statsDir
      .filter(dir => graft.io.Fio.exists(dir)(graft.io.FioConf.of(docs.sparkSession)))
      .map(dir => strategyStatsFromAnalyzed(
        docs.sparkSession, dir, threshold, maxTermDf, containment = false))
      .getOrElse(
        jaccardStrategyStats(docs, idCol, textCol, blockCol, threshold, maxTermDf))
    if (stats.preferPrefix)
      tokenJaccardPairsPrefix(docs, idCol, textCol, blockCol, threshold)
    else
      tokenJaccardPairs(docs, idCol, textCol, blockCol, threshold, maxTermDf = maxTermDf)
  }

  /** Exact token-set CONTAINMENT ≥ threshold via PREFIX-FILTERED candidate
    * generation — the asymmetric adaptation of [[tokenJaccardPairsPrefix]].
    * Containment(A ⊑ B) = |A∩B|/|A| ≥ t needs overlap α = ⌈t·|A|⌉, which
    * depends ONLY on the sub side's size, so the prefix theorem applies
    * one-sidedly: order each doc's tokens by in-block rarity (df asc,
    * term asc — a total order); if no token among A's first
    * |A| − ⌈t·|A|⌉ + 1 were in A∩B, all α overlap tokens would have to fit
    * in the remaining α − 1 positions. So PROBE only the sub prefix, but
    * INDEX the sup side in full (a sup has no partner-independent prefix:
    * a 1-token sub needs overlap 1 anywhere in B). Lossless — identical
    * output to [[tokenContainmentPairs]], which additionally carries the
    * `maxTermDf` dense-term machinery the prefix path doesn't need.
    *
    * A size filter prunes candidates before the array-shipping verify
    * join: c ≤ min(n_sub, n_sup), so n_sup ≥ ⌈t·n_sub⌉ is necessary —
    * on the half-copy corpus this alone halves the directed candidates.
    *
    * Scale shape: candidates per term = (prefix postings) × (full df).
    * On Zipf vocabularies prefixes fill from the rare end, where full df
    * is also tiny, so candidate volume collapses; on dense tiny
    * vocabularies nothing is rare and the count path wins — the same
    * crossover the Jaccard twins measure, decided per-corpus by
    * [[tokenContainmentPairsAuto]].
    */
  def tokenContainmentPairsPrefix(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      blockCol: String = "source",
      threshold: Double = 0.9,
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokenize ONCE (the pairIntersections discipline): `toks` feeds the
    // probe explode, the full index, the df exchange, and both verify
    // joins — un-checkpointed, the tokenize pipeline re-runs per
    // consumer (measured 21.5 s vs 6.4 s at sf0.1 on the gate corpus)
    val toks = docs.select(
      col(idCol), col(blockCol),
      array_sort(tokenSet(textCol)).as("toks"),
    ).withColumn("n", size(col("toks")).cast("long"))
      .localCheckpoint(true)
    val tok = toks.select(col(idCol), col(blockCol), col("n"), explode(col("toks")).as("term"))
    val termDf = tok.groupBy(col(blockCol), col("term")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col(idCol)).orderBy(col("df"), col("term"))
    val probe = tok
      .join(termDf, Seq(blockCol, "term"))
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("n") - ceil(col("n") * threshold) + 1)
      .select(col(blockCol), col("term"), col(idCol).as("doc_sub"), col("n").as("n_sub"))
    val index = tok.select(col(blockCol), col("term"), col(idCol).as("doc_sup"), col("n").as("n_sup"))
    val cands = probe.join(index, Seq(blockCol, "term"))
      .filter(col("doc_sub") =!= col("doc_sup"))
      .filter(col("n_sup") >= ceil(col("n_sub") * threshold))
      .select(col("doc_sub"), col("doc_sup"))
      .dropDuplicates("doc_sub", "doc_sup")
    // SHUFFLE_HASH on the verify joins, deliberately: the token-array
    // frame is the corpus itself — broadcasting it is exactly the
    // don't-do at 100 TB, and the broadcast form also leaves no exchange
    // boundary below a downstream sort, whose range-partition SAMPLING
    // pass then re-executes both verify joins (r18 measurement at
    // sf0.1: broadcast 14.6 s sorted / 5.9 s counted vs shuffle-hash
    // 3.7 s / 2.4 s — the hinted form wins standalone too).
    cands
      .join(toks.select(col(idCol).as("doc_sub"), col("toks").as("toks_a"), col("n").as("na"))
        .hint("shuffle_hash"), Seq("doc_sub"))
      .join(toks.select(col(idCol).as("doc_sup"), col("toks").as("toks_b"))
        .hint("shuffle_hash"), Seq("doc_sup"))
      .withColumn("c", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("containment", col("c") / col("na"))
      .filter(col("containment") >= threshold)
      .select(col("doc_sub"), col("doc_sup"), col("containment"))
  }

  /** ONE cheap stats pass estimating each containment strategy's
    * candidate volume — [[jaccardStrategyStats]]' sibling, same
    * df-histogram-of-histogram exchange, different volume algebra:
    *
    *  - count path (shared [[pairIntersections]] frame): exact —
    *    Σ_{df ≤ cap} C(df, 2) co-occurrence rows (over-cap terms are
    *    excluded from candidates entirely; direction duplication happens
    *    after aggregation and is free).
    *  - prefix path: prefix-posting mass fills from the df-ascending end
    *    (the sub prefix length n − ⌈t·n⌉ + 1 is the SAME formula as
    *    Jaccard's, so the quota is the same `pref` aggregate); each
    *    prefix posting at a term of full df joins df − 1 index rows.
    *
    * Reuses [[JaccardStrategyStats]] with costWeight = 3 — containment's
    * prefix candidates are cheaper than Jaccard's (one-sided probe and
    * the n_sup ≥ ⌈t·n_sub⌉ size filter prunes before the array-shipping
    * verify join). r18 calibration across five measured regimes (gate
    * corpus sf0.01/sf0.1, Zipf, dense-vocab t=0.5/0.9): every regime's
    * measured winner is reproduced by any w ∈ [2.6, 4.3].
    */
  def containmentStrategyStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      blockCol: String = "source",
      threshold: Double = 0.9,
      maxTermDf: Int = 1000,
  ): JaccardStrategyStats = {
    val (sizeHist, dfHist) = tokenHists(docs, textCol, blockCol)
    statsFromHists(sizeHist, dfHist, threshold, maxTermDf, containment = true)
  }

  /** COST-BASED exact containment — [[tokenJaccardPairsAuto]]'s sibling:
    * one [[containmentStrategyStats]] pass picks the smaller estimated
    * candidate volume, then runs that strategy. Both strategies are
    * hash-gated against the identical oracle every round, so the chooser
    * can change cost, never results.
    */
  def tokenContainmentPairsAuto(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      blockCol: String = "source",
      threshold: Double = 0.9,
      maxTermDf: Int = 1000,
      statsDir: Option[String] = None,
  ): DataFrame = {
    // same persisted-ANALYZE fast path as tokenJaccardPairsAuto
    val stats = statsDir
      .filter(dir => graft.io.Fio.exists(dir)(graft.io.FioConf.of(docs.sparkSession)))
      .map(dir => strategyStatsFromAnalyzed(
        docs.sparkSession, dir, threshold, maxTermDf, containment = true))
      .getOrElse(
        containmentStrategyStats(docs, idCol, textCol, blockCol, threshold, maxTermDf))
    if (stats.preferPrefix)
      tokenContainmentPairsPrefix(docs, idCol, textCol, blockCol, threshold)
    else
      tokenContainmentPairs(docs, idCol, textCol, blockCol, threshold, maxTermDf)
  }

  /** Embedding near-duplicate pairs via the LSH scale path: candidates are
    * vector pairs sharing any hash table's random-hyperplane bucket
    * ([[graft.similarity.Ann.lshBuckets]]), then exact cosine verification
    * at `threshold`. Identical vectors agree on every plane sign, so
    * recall at cos=1 is exact — near-threshold recall is probabilistic
    * (tune planes/tables per the Ann scaladoc). Shuffles (bucket, id, vec)
    * rows only; nothing is all-pairs.
    */
  def embeddingLshDupPairs(
      emb: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.999,
      nPlanes: Int = 8,
      nTables: Int = 4,
  ): DataFrame = {
    import graft.similarity.Ann
    val bucketed = Ann.lshBuckets(emb, dim, nPlanes, nTables, idCol, vecCol)
      .join(emb.select(col(idCol), col(vecCol).cast("array<double>").as("e")), Seq(idCol))
      // codegen'd norm via graft_dot(e,e) — registered by lshBuckets above;
      // identical accumulation order to the HOF it replaced
      .withColumn("nrm", sqrt(graft.functions.GraftFunctions.dot(col("e"), col("e"))))
    val long = bucketed.select(
      col(idCol), col("e"), col("nrm"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("tbl"), col(s"bucket_$t").as("bucket"))): _*)).as("tb"),
    ).select(col(idCol), col("e"), col("nrm"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val a = long.select(col("tbl"), col("bucket"), col(idCol).as("id_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = long.select(col("tbl"), col("bucket"), col(idCol).as("id_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn(
        "cos_sim",
        graft.functions.GraftFunctions.dot(col("ea"), col("eb")) / (col("na") * col("nb")),
      )
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Semantic (embedding-cluster) near-duplicate pairs, SemDeDup-style
    * (arXiv:2303.09540): corpus vectors partition into k-means centroid
    * clusters via the SAME deterministic quantizer the IVF index uses
    * ([[graft.similarity.Ann.trainCentroids]] — fixed sample, fixed
    * iterations, lowest-index tie-breaks, no RNG), then pairs ABOVE the
    * cosine threshold are emitted within each cluster only. This is the
    * dedup twin of IVF search: pairwise work is confined to a cluster
    * (~corpus/nLists rows), never all-pairs — at 100 TB nLists scales
    * with the corpus so per-cluster work stays bounded, exactly how
    * SemDeDup ran on LAION. Recall loss is pairs straddling a cluster
    * boundary (SemDeDup's documented approximation); identical vectors
    * always land in the same cluster (assignment is a pure function of
    * the vector), so recall at cos=1 is exact — which is what makes the
    * verified output oracle-checkable on a duplicate-injected corpus.
    *
    * Returns (id_a, id_b, list_id) with id_a < id_b; downstream keeps
    * one representative per [[connectedComponents]] cluster.
    */
  /** The semantic-dedup SCALE CONTRACT: clusters sized ~`targetPerList`
    * vectors, so nLists GROWS WITH THE CORPUS and within-cluster pair work
    * per list stays O(targetPerList²) however large the corpus gets —
    * nLists fixed while n grows would silently re-grow the all-pairs shape
    * inside every cluster (n/k per list → (n/k)²/2 candidate pairs). The
    * tradeoff is assignment cost (n·nLists·dim flops): proportional
    * nLists keeps dedup work bounded but makes assignment quadratic at
    * the extreme — beyond ~1e5 lists a production system inserts a
    * coarse first-level quantizer (IVF-in-IVF) in front of this same
    * within-list stage; the contract here (and the DedupSpec property)
    * is about the dedup stage's boundedness, which is what SemDeDup
    * requires. Floor of 16 keeps tiny corpora from degenerating into
    * one-cluster all-pairs.
    */
  def semanticNLists(n: Long, targetPerList: Long = 512L): Int = {
    require(targetPerList >= 1, s"targetPerList must be >= 1, got $targetPerList")
    math.min(math.max(16L, (n + targetPerList - 1) / targetPerList), 1L << 20).toInt
  }

  def semanticDupPairs(
      emb: DataFrame,
      dim: Int,
      nLists: Int = -1,
      threshold: Double = 0.999,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import graft.functions.GraftFunctions
    GraftFunctions.register(emb.sparkSession)
    // nLists <= 0 (the default) derives k from the corpus via the scale
    // contract above — one cheap count() against the source
    val k = if (nLists > 0) nLists else semanticNLists(emb.count())
    val centroids = graft.similarity.Ann.trainCentroids(emb, dim, k,
      nSample = math.max(256, 2 * k), idCol = idCol, vecCol = vecCol)
    val assigned = emb.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(GraftFunctions.dot(col("e"), col("e"))))
      .withColumn("list_id", GraftFunctions.nearestCentroid(col("e"), centroids))
    val a = assigned.select(col("list_id"), col(idCol).as("id_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("list_id"), col(idCol).as("id_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", GraftFunctions.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("list_id"))
  }

  /** [[semanticDupPairs]] with a TWO-LEVEL quantizer (IVF-in-IVF) — the
    * production shape for the >1e5-list regime the flat contract's
    * scaladoc names: proportional nLists keeps within-list work bounded
    * but makes flat assignment n·nLists·dim flops (quadratic in n once
    * nLists ∝ n); a √kTotal coarse level in front of per-cell fine lists
    * drops per-vector assignment to ~2·√kTotal distances
    * ([[graft.similarity.Ann.trainTwoLevel]] — fine list counts derive
    * from each cell's MEASURED population at ~targetPerList
    * vectors/list, so the SemDeDup within-list bound is preserved).
    *
    * Same within-list pair stage, same output contract: assignment is a
    * pure function of the vector (deterministic tie-breaks at both
    * levels), so identical vectors share a fine list and recall at
    * cos=1 stays exact — the gate pins this path to the SAME oracle as
    * the flat operator. Sub-threshold recall differs only in WHICH
    * boundary pairs are lost (different partition, same approximation).
    */
  def semanticDupPairsTwoLevel(
      emb: DataFrame,
      dim: Int,
      threshold: Double = 0.999,
      targetPerList: Long = 512L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import graft.functions.GraftFunctions
    GraftFunctions.register(emb.sparkSession)
    val kTotal = semanticNLists(emb.count(), targetPerList)
    val q = graft.similarity.Ann.trainTwoLevel(emb, dim, kTotal, targetPerList,
      idCol = idCol, vecCol = vecCol)
    val assigned = emb.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(GraftFunctions.dot(col("e"), col("e"))))
      .withColumn("list_id",
        GraftFunctions.nearestCentroid2(col("e"), q.coarse, q.fine, q.start, q.len))
    val a = assigned.select(col("list_id"), col(idCol).as("id_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("list_id"), col(idCol).as("id_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", GraftFunctions.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("list_id"))
  }

  /** Embedding cosine near-duplicate pairs. Brute force all-pairs — correct
    * baseline for modest corpora; the LSH-bucketed scale path is
    * [[embeddingLshDupPairs]] / [[graft.similarity.Ann.lshBuckets]].
    */
  def embeddingCosinePairs(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.35,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val e = emb.select(
      col(idCol),
      col(vecCol).cast("array<double>").as("e"),
    )
    val withNorm = e.withColumn("nrm", sqrt(graft.functions.GraftFunctions.dot(col("e"), col("e"))))
    val a = withNorm.select(col(idCol).as("id_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = withNorm.select(col(idCol).as("id_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dot", graft.functions.GraftFunctions.dot(col("ea"), col("eb")))
      // unrounded, matching semanticDupPairs' threshold semantics exactly
      // (ROUND(x, d>0) is banned repo-wide — Fx.scala)
      .withColumn("cos_sim", col("dot") / (col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }
}
