package graft.dedup

import graft.SparkSpec
import graft.text.TextAnalysis
import graft.functions.RollingHash64
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class DedupSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps", "a"),
      (2L, "the quick brown fox jumps", "a"), // exact dup of 1
      (3L, "quick brown the fox jumps", "a"), // same token set/multiset, reordered
      (4L, "a completely different document body", "a"),
      (5L, "the quick brown fox leaps", "b"), // near-dup of 1 (4/6 jaccard)
    ).toDF("doc_id", "text", "source")
  }

  test("exactGroups finds exact duplicates only") {
    val g = Dedup.exactGroups(docs).collect().map(r => (r.getLong(2), r.getLong(1))).toMap
    // keep_id -> n_copies
    assert(g(1L) === 2) // docs 1,2
    assert(g(3L) === 1)
    assert(g(4L) === 1)
    assert(g(5L) === 1)
  }

  test("minhash LSH: identical token sets always land in the same buckets") {
    val pairs = Dedup.minhashCandidatePairs(Dedup.minhash(docs))
      .select("id_a", "id_b", "est_jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // 1,2,3 share the exact token set → est_jaccard 1.0, guaranteed found
    assert(pairs((1L, 2L)) === 1.0)
    assert(pairs((1L, 3L)) === 1.0)
    assert(pairs((2L, 3L)) === 1.0)
    assert(!pairs.contains((1L, 4L)))
  }

  test("minhashDupPairs / simhashDupPairs: signature-group pipeline finds the same dups") {
    val mh = Dedup.minhashDupPairs(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val sh = Dedup.simhashDupPairs(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("minhashCandidatePairs bucket cap drops degenerate buckets (skew guard)") {
    // cap of 1: every bucket with both members of a dup pair is dropped
    val none = Dedup.minhashCandidatePairs(Dedup.minhash(docs), maxBucketSize = 1).count()
    assert(none === 0)
    // default cap keeps them
    val some = Dedup.minhashCandidatePairs(Dedup.minhash(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(some.contains((1L, 2L)))
  }

  test("simhash: identical token multisets collide at hamming 0") {
    val pairs = Dedup.simhashPairs(Dedup.simhash(docs), maxHamming = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L))) // reorder does not change the multiset
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("tokenJaccardPairs: exact set jaccard, blocked by source") {
    val pairs = Dedup.tokenJaccardPairs(docs, threshold = 0.5)
      .collect().map(r => ((r.getLong(1), r.getLong(0)), r.getDouble(2))).toMap
    // NOTE collect order: columns are doc_b, doc_a, jaccard after select
    val byPair = Dedup.tokenJaccardPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(byPair((1L, 2L)) === 1.0)
    assert(byPair((1L, 3L)) === 1.0)
    // doc 5 is in block "b": never compared to doc 1 despite 4/6 overlap
    assert(!byPair.contains((1L, 5L)))
  }

  test("tokenJaccardPairs: df cap tames an adversarial stop-term, values stay exact") {
    import spark.implicits._
    // one block; every doc shares stop-term "the" (df = 8 > cap = 3);
    // docs 1,2 also share rare tokens a b c
    val skewed = (Seq(
      (1L, "the a b c d", "s"),
      (2L, "the a b c e", "s"),
    ) ++ (3L to 8L).map(i => (i, s"the u$i v$i", "s"))).toDF("doc_id", "text", "source")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val uncapped = pairs(Dedup.tokenJaccardPairs(skewed, threshold = 0.2))
    val capped = pairs(Dedup.tokenJaccardPairs(skewed, threshold = 0.2, maxTermDf = 3))
    // stop-only pairs ((3,4)… share just "the", jaccard 1/5): found without
    // the cap, dropped with it — the documented recall cost
    assert(uncapped.contains((3L, 4L)))
    assert(!capped.contains((3L, 4L)))
    // the rare-term pair survives the cap and its jaccard still counts the
    // dense term exactly: |{the,a,b,c}| / |{the,a,b,c,d,e}| = 4/6
    assert(capped((1L, 2L)) === 4.0 / 6.0)
    assert(uncapped((1L, 2L)) === 4.0 / 6.0)
    // every capped pair carries the identical exact value
    capped.foreach { case (k, v) => assert(uncapped(k) === v) }
  }

  test("tokenContainmentPairs: sub-document containment is directed and exact") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "a"),
      (2L, "alpha beta gamma", "a"),            // strict subset of 1 → containment 1
      (3L, "alpha beta gamma delta eta", "a"),  // 4/5 of its tokens in 1
      (4L, "unrelated words entirely here", "a"),
    ).toDF("doc_id", "text", "source")
    val out = Dedup.tokenContainmentPairs(corpus, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((2L, 1L)) === 1.0)       // subset fully contained
    assert(out((3L, 1L)) === 0.8)       // 4 of 5 tokens
    assert(!out.contains((1L, 2L)))     // asymmetric: 6-token doc not inside the 3-token one
    assert(!out.contains((4L, 1L)) && !out.contains((1L, 4L)))
    // jaccard at the same threshold misses both: j(1,2)=0.5, j(1,3)=4/7
    val j = Dedup.tokenJaccardPairs(corpus, threshold = 0.8).collect()
    assert(j.isEmpty)
  }

  test("tokenContainmentPairsPrefix: one-sided prefix filtering is lossless (same output)") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_sub", "doc_sup", "containment").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (t <- Seq(0.5, 0.8, 0.9)) {
      assert(norm(Dedup.tokenContainmentPairsPrefix(docs, threshold = t)) ===
        norm(Dedup.tokenContainmentPairs(docs, threshold = t)), s"threshold $t")
    }
  }

  test("tokenContainmentPairsAuto: chooser verdicts per regime; output matches the picked strategy") {
    import spark.implicits._
    // DENSE regime under the df cap (every term df ≈ 145 ≤ cap, so the
    // count path is exact): prefix's probe×full-index volume exceeds 3×
    // the counted co-occurrences at a LOW threshold, where probe
    // prefixes are half the doc
    val vocabDense = (0 until 31).map(i => s"w$i")
    val dense = (0L until 400L).map { i =>
      (i, (0 until 12).map(j => vocabDense(((i * 7 + j * 3) % 31).toInt)).distinct.mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val denseStats = Dedup.containmentStrategyStats(dense, threshold = 0.5)
    assert(!denseStats.preferPrefix,
      s"dense low-threshold corpus must pick the count path: $denseStats")
    // LARGE-VOCAB Zipf regime: rare probe prefixes joining rare full
    // postings — candidate volume collapses, prefix must win
    val zipf = spark.range(400).select(
      col("id").as("doc_id"),
      lit("s").as("source"),
      array_join(
        transform(sequence(lit(0), lit(29)), j =>
          concat(lit("t"), floor(exp(
            (pmod(((col("id") * 30 + j) * 2654435761L), lit(1048576L))
              .cast("double") / 1048576.0) * math.log(20000.0))).cast("long"))),
        " ").as("text"))
    val zipfStats = Dedup.containmentStrategyStats(zipf, threshold = 0.9)
    assert(zipfStats.preferPrefix,
      s"large-vocab Zipf corpus must pick the prefix path: $zipfStats")
    // count-path estimate is what the code emits: over-cap terms are
    // EXCLUDED (zero candidates), not truncated to C(cap, 2)
    val allOverCap = Dedup.containmentStrategyStats(dense, threshold = 0.5, maxTermDf = 10)
    assert(allOverCap.countPathPairs === 0.0,
      s"df>cap terms must contribute zero count-path candidates: $allOverCap")
    // whichever side the chooser takes, output is the fixed strategies'
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_sub", "doc_sup", "containment").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(norm(Dedup.tokenContainmentPairsAuto(dense, threshold = 0.5)) ===
      norm(Dedup.tokenContainmentPairs(dense, threshold = 0.5)))
    assert(norm(Dedup.tokenContainmentPairsAuto(zipf, threshold = 0.9)) ===
      norm(Dedup.tokenContainmentPairsPrefix(zipf, threshold = 0.9)))

    // PERSISTED ANALYZE stats drive the identical decisions: the stored
    // histograms reproduce the live pass field-for-field on both
    // regimes (same statsFromHists algebra by construction — this pins
    // the persist/reload round-trip), the decision FLIP between corpora
    // is driven entirely by stored stats, and the auto output is
    // unchanged. Thresholds not used at analyze time work too: the
    // sidecar stores histograms, not a verdict.
    val denseDir = java.nio.file.Files.createTempDirectory("graft-tokstats-d").toString
    val zipfDir = java.nio.file.Files.createTempDirectory("graft-tokstats-z").toString
    Dedup.analyzeTokenStats(dense, denseDir)
    Dedup.analyzeTokenStats(zipf, zipfDir)
    val denseStored = Dedup.strategyStatsFromAnalyzed(
      spark, denseDir, threshold = 0.5, containment = true)
    val zipfStored = Dedup.strategyStatsFromAnalyzed(
      spark, zipfDir, threshold = 0.9, containment = true)
    assert(denseStored === denseStats, "stored == live, dense corpus")
    assert(zipfStored === zipfStats, "stored == live, zipf corpus")
    assert(!denseStored.preferPrefix && zipfStored.preferPrefix,
      "the decision flip between corpora must be reproducible from stored stats alone")
    assert(norm(Dedup.tokenContainmentPairsAuto(dense, threshold = 0.5,
      statsDir = Some(denseDir))) ===
      norm(Dedup.tokenContainmentPairs(dense, threshold = 0.5)))
    assert(norm(Dedup.tokenContainmentPairsAuto(zipf, threshold = 0.9,
      statsDir = Some(zipfDir))) ===
      norm(Dedup.tokenContainmentPairsPrefix(zipf, threshold = 0.9)))
    // an absent sidecar falls back to the live pass instead of failing
    assert(norm(Dedup.tokenContainmentPairsAuto(dense, threshold = 0.5,
      statsDir = Some(denseDir + "_missing"))) ===
      norm(Dedup.tokenContainmentPairs(dense, threshold = 0.5)))
    // the jaccard face consumes the same sidecar (shared histograms)
    val jStored = Dedup.strategyStatsFromAnalyzed(
      spark, denseDir, threshold = 0.5, containment = false)
    assert(jStored === Dedup.jaccardStrategyStats(dense, threshold = 0.5))
  }

  test("tokenJaccardPairsPrefix: prefix filtering is lossless (same output)") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (t <- Seq(0.3, 0.5, 0.9)) {
      assert(norm(Dedup.tokenJaccardPairsPrefix(docs, threshold = t)) ===
        norm(Dedup.tokenJaccardPairs(docs, threshold = t)), s"threshold $t")
    }
  }

  test("tokenJaccardPairsAuto: chooser picks count on dense, prefix on large-vocab; same output") {
    import spark.implicits._
    // DENSE regime: a 31-term vocabulary shared by 400 docs — every term's
    // df is huge, the prefix quota lands on enormous postings, and the
    // chooser must estimate prefix's candidate volume as the larger one
    val vocabDense = (0 until 31).map(i => s"w$i")
    val dense = (0L until 400L).map { i =>
      (i, (0 until 12).map(j => vocabDense(((i * 7 + j * 3) % 31).toInt)).distinct.mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val denseStats = Dedup.jaccardStrategyStats(dense, threshold = 0.5)
    assert(!denseStats.preferPrefix,
      s"dense corpus must pick the count path: $denseStats")
    // LARGE-VOCAB regime: 400 docs over 20k terms, Zipf-ish via the bench
    // corpus formula — most terms are rare, the prefix quota is absorbed
    // at df <= 3, and prefix must win the estimate
    val zipf = spark.range(400).select(
      col("id").as("doc_id"),
      lit("s").as("source"),
      array_join(
        transform(sequence(lit(0), lit(29)), j =>
          concat(lit("t"), floor(exp(
            (pmod(((col("id") * 30 + j) * 2654435761L), lit(1048576L))
              .cast("double") / 1048576.0) * math.log(20000.0))).cast("long"))),
        " ").as("text"))
    val zipfStats = Dedup.jaccardStrategyStats(zipf, threshold = 0.7)
    assert(zipfStats.preferPrefix,
      s"large-vocab Zipf corpus must pick the prefix path: $zipfStats")
    // whichever side the chooser takes, output is the fixed strategies'
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(norm(Dedup.tokenJaccardPairsAuto(dense, threshold = 0.5)) ===
      norm(Dedup.tokenJaccardPairs(dense, threshold = 0.5)))
    assert(norm(Dedup.tokenJaccardPairsAuto(zipf, threshold = 0.7)) ===
      norm(Dedup.tokenJaccardPairsPrefix(zipf, threshold = 0.7)))
  }

  test("incremental rule: drop iff an EARLIER direct near-dup exists (vs CC's transitive min-rep)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 10 ~ 30 and 20 ~ 30, but 10 !~ 20: under the incremental
    // (arrival-order) rule 20 SURVIVES — its only near-dup arrived later —
    // while CC-min-rep would collapse {10,20,30} and drop it. 30 is
    // dropped by both (earlier neighbors 10 and 20).
    val shard = Seq(
      (10L, "a b c d", "s"), // base (below the cut)
      (20L, "c d e f", "s"), // J(10,20)=2/6 < 0.5
      (30L, "a b c d e f", "s"), // J(10,30)=J(20,30)=4/6 >= 0.5
      (40L, "x y z", "s"),
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.tokenJaccardPairs(shard, threshold = 0.5)
    val edges = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((10L, 30L), (20L, 30L)))
    val cut = 15L
    val survivors = shard.filter(col("doc_id") >= cut)
      .join(
        pairs.filter(col("doc_b") >= cut).select(col("doc_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(20L, 40L))
    // the CC rule on the same edges drops 20 as well — the two semantics
    // genuinely differ, which is why both are gated
    val reps = Dedup.connectedComponents(pairs)
    val ccLosers = reps.filter(col("id") =!= col("cluster_rep"))
      .select("id").as[Long].collect().toSet
    assert(ccLosers == Set(20L, 30L))
  }

  test("connectedComponents: min-id clusters over pair edges, chains collapse") {
    import spark.implicits._
    // a 12-node chain (worst case for naive propagation), one triangle
    // with a bridge, and an isolated pair
    val chain = (1L until 12L).map(i => (i, i + 1))
    val pairs = (chain ++ Seq((20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L), (30L, 31L)))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    for (i <- 1L to 12L) assert(got(i) === 1L, s"node $i")
    for (i <- 20L to 23L) assert(got(i) === 20L, s"node $i")
    assert(got(30L) === 30L && got(31L) === 30L)
    assert(got.size === 12 + 4 + 2)
  }

  test("cc edges: localCheckpoint does NOT preserve partitioning (so don't pre-shuffle)") {
    import spark.implicits._
    // Measured-and-discarded (r8): repartitioning the edge list on the
    // round join key before checkpointing looked like it should let every
    // CC round reshuffle only the label side — but the checkpointed plan
    // scans a plain ExistingRDD with UNKNOWN partitioning, so the join
    // re-exchanges BOTH sides regardless. This pin documents the Spark
    // behavior that makes connectedComponents' shuffle-free union init
    // the right call; if a Spark upgrade starts preserving partitioning
    // here, this test fails and the pre-shuffle becomes worth re-testing.
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L)).toDF("src", "dst")
      .repartition(col("dst")).localCheckpoint(true)
    val labels = Seq((1L, 1L), (2L, 1L)).toDF("dst", "rep")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = edges.join(labels, Seq("dst")).queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(n === 2, s"localCheckpoint now preserves partitioning? plan:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("native graft_sig_agree matches the interpreted zip_with count") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L)), // agree at 2 positions
      (Seq(5L, 5L), Seq(5L, 5L)), // full agreement
    ).toDF("a", "b")
    val native = df.select(graft.functions.GraftFunctions.sigAgree(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    val hof = df.select(
      aggregate(
        zip_with(col("a"), col("b"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v))
      .collect().map(_.getInt(0)).toSeq
    assert(native === Seq(2, 2))
    assert(native === hof)
    // null slots count as DISAGREEMENT (the zip_with form's null
    // comparison contributed 0) — two aligned nulls must not read as
    // undefined-equals-undefined agreement
    val withNulls = Seq(
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (Seq[java.lang.Long](null, 2L), Seq[java.lang.Long](7L, 2L)),
    ).toDF("a", "b")
    val n = withNulls.select(graft.functions.GraftFunctions.sigAgree(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(n === Seq(2, 1))
  }

  test("native sketch kernels: deterministic, set-sensitive, jaccard-correlated") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: String*): GenericArrayData =
      new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])
    val a = graft.functions.Sketches.minhash(arr("x", "y", "z", "w"), 64)
    val a2 = graft.functions.Sketches.minhash(arr("w", "z", "y", "x"), 64) // order-free
    assert(a.toLongArray.toSeq === a2.toLongArray.toSeq)
    assert(a.numElements() === 64)
    val b = graft.functions.Sketches.minhash(arr("x", "y", "p", "q"), 64)
    val agree = a.toLongArray.zip(b.toLongArray).count { case (u, v) => u == v }
    // true jaccard = 2/6 ≈ 0.33: estimate within a loose band
    assert(agree > 5 && agree < 40, s"agreement $agree/64 implausible for j=1/3")
    // simhash: multiset-order free, differs across different multisets
    val s1 = graft.functions.Sketches.simhash(arr("a", "b", "a"))
    val s2 = graft.functions.Sketches.simhash(arr("a", "a", "b"))
    val s3 = graft.functions.Sketches.simhash(arr("a", "b", "b"))
    assert(s1 === s2)
    assert(s1 !== s3)
  }

  test("rolling-hash fingerprint: deterministic h=h*31+b over UTF-8, via codegen and literal") {
    val s = "the quick brown fox jumps" // doc 1's exact text
    val expected = {
      var h = RollingHash64.Seed
      s.getBytes("UTF-8").foreach(b => h = h * 31 + b)
      h
    }
    assert(RollingHash64.hash(s.getBytes("UTF-8")) === expected)
    val viaDf = TextAnalysis.withFingerprint(docs).filter(col("doc_id") === 1L)
      .select("fp64").collect().head.getLong(0)
    assert(viaDf === expected)
  }

  test("semanticDupPairs: exact-dup recall is exact; sub-threshold output is a verified subset") {
    import spark.implicits._
    // deterministic planted-cluster embeddings (no RNG): vector i leans
    // hard on axis i%4 (weight 10) with sin jitter elsewhere — 4 natural
    // clusters the k-means quantizer can recover
    val dim = 8
    val n = 40L
    val emb = spark.range(n).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "j -> cast(case when j = id % 4 then 10.0 else sin(id * 7 + j) end as double))")
        .as("embedding"))
    // injected exact copies: identical vectors assign to the same centroid
    // (pure function of the vector), so every copy pair MUST be found
    // whatever the clustering — the property the emb_semantic_dedup gate
    // relies on
    val corpus = emb.unionByName(emb.withColumn("vec_id", col("vec_id") + 1000L))
    val dup = Dedup.semanticDupPairs(corpus, dim, nLists = 4, threshold = 0.999)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0L until n) assert(dup.contains((i, i + 1000L)), s"copy pair $i missing")
    // sub-threshold: every emitted pair is exactly verified (cos computed
    // on the real vectors), so the output must be a SUBSET of brute force;
    // recall loss is only cluster-boundary pairs (SemDeDup's documented
    // approximation) — on the planted clusters it stays high
    val sem = Dedup.semanticDupPairs(emb, dim, nLists = 4, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.embeddingCosinePairs(emb, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "planted clusters produced no high-cosine pairs — fixture broken")
    assert(sem.subsetOf(brute), s"unverified pairs emitted: ${sem.diff(brute)}")
    assert(sem.size.toDouble / brute.size >= 0.5,
      s"within-centroid recall ${sem.size}/${brute.size} below floor")
  }

  test("semantic-dedup scale contract: per-list candidate pairs stay bounded as rows grow") {
    import graft.functions.GraftFunctions
    import graft.similarity.Ann
    GraftFunctions.register(spark)
    // the pure contract: nLists grows proportionally once past the floor
    assert(Dedup.semanticNLists(1000L) === 16)
    assert(Dedup.semanticNLists(1000000L) === 1954) // ceil(1e6/512)
    assert(Dedup.semanticNLists(100000000L, targetPerList = 512L) === 195313)
    assert(Dedup.semanticNLists(Long.MaxValue / 2) === (1 << 20)) // ceiling holds
    // the measured contract: at fixed dim and target, growing the corpus
    // 8x must NOT grow the largest per-list candidate-pair count past the
    // O(target²) bound — the property a fixed nLists would violate
    // (n/k per list → (n/k)²/2 pairs, growing quadratically with n)
    val dim = 8
    val target = 128L
    val bound = 8L * target * target // 4x-average-size cluster still passes
    for (n <- Seq(1024L, 8192L)) {
      val emb = spark.range(n).select(
        col("id").as("vec_id"),
        expr(s"transform(sequence(0, ${dim - 1}), " +
          "j -> cast(sin(id * 13 + j * 7) + cos(id * 5 - j) as double))")
          .as("embedding"))
      val k = Dedup.semanticNLists(n, target)
      assert(k >= (n / target).toInt, s"nLists $k did not scale at n=$n")
      val centroids = Ann.trainCentroids(emb, dim, k, nSample = math.max(256, 2 * k))
      val sizes = emb
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("list_id", GraftFunctions.nearestCentroid(col("e"), centroids))
        .groupBy("list_id").count().collect().map(_.getLong(1))
      val maxPairs = sizes.map(s => s * (s - 1) / 2).max
      assert(maxPairs <= bound,
        s"n=$n k=$k: largest list has $maxPairs candidate pairs > bound $bound " +
          s"(sizes max ${sizes.max}, avg ${n / k})")
      // ASSIGNMENT-FLOP bound (the two-level contract): the flat
      // quantizer pays k distances per vector (quadratic total once
      // k ∝ n); the two-level quantizer's per-vector distance count —
      // coarse cells + the largest cell's fine lists — must stay
      // O(sqrt(k)), the whole point of IVF-in-IVF
      val q = Ann.trainTwoLevel(emb, dim, k, target)
      assert(q.totalLists >= 1 && q.fine.length === q.len.sum)
      val sqrtBound = 8 * math.ceil(math.sqrt(k.toDouble)).toInt + 8
      assert(q.maxAssignDistances <= sqrtBound,
        s"n=$n k=$k: two-level assignment pays ${q.maxAssignDistances} distances " +
          s"(coarse ${q.coarse.length} + max cell ${q.len.max}) > O(sqrt k) bound $sqrtBound")
      assert(q.maxAssignDistances < k || k <= 32,
        s"two-level must undercut flat assignment at k=$k")
    }
  }

  test("two-level semantic dedup: exact-dup recall matches the flat path") {
    import spark.implicits._
    val base = spark.range(200).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 7), j -> cast(sin(id * 13 + j * 7) + cos(id * 5 - j) as double))")
        .as("embedding"))
    val corpus = base.unionByName(base.withColumn("vec_id", col("vec_id") + 100000L))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flat = pairs(Dedup.semanticDupPairs(corpus, dim = 8, threshold = 0.999))
    val two = pairs(Dedup.semanticDupPairsTwoLevel(corpus, dim = 8, threshold = 0.999))
    val expected = (0L until 200L).map(i => (i, i + 100000L)).toSet
    // identical vectors share a list under ANY deterministic quantizer
    // topology — both paths recover every injected pair, and nothing
    // above threshold besides
    assert(flat === expected)
    assert(two === expected)
  }

  test("duplicateSpans: cross-doc shares, in-doc repeats, and short docs, hand-computed") {
    import spark.implicits._
    // w=3 windows. doc 1 and 2 share the span "a b c" (and 2's "b c d"
    // matches nothing else); doc 3 repeats "x y z x y z x y z": its
    // window stream is [xyz, yzx, zxy, xyz, yzx, zxy, xyz] — every
    // window occurs >= 2 times IN THE SAME DOC; doc 4 is shorter than w.
    val docs = Seq(
      (1L, "a b c p q"),
      (2L, "q a b c d"),
      (3L, "x y z x y z x y z"),
      (4L, "u v"),
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, w = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (1L, 3L, 1L), // windows: abc, bcp, cpq — only abc repeats (doc 2)
      (2L, 3L, 1L), // windows: qab, abc, bcd — only abc
      (3L, 7L, 7L), // all 7 windows repeat within the doc itself
      (4L, 0L, 0L), // shorter than the window — no windows, no dups
    ))
  }

  test("duplicateSpansRolling: identical output to the md5 form (twin strategies)") {
    import spark.implicits._
    // Same hand fixture as above plus adversarial shapes for a rolling
    // hash: a one-token-shifted repeat (rolling update must not smear
    // state across window boundaries) and repeated single tokens.
    val docs = Seq(
      (1L, "a b c p q"),
      (2L, "q a b c d"),
      (3L, "x y z x y z x y z"),
      (4L, "u v"),
      (5L, "m m m m m m"),
      (6L, "p q a b c p q a"),
    ).toDF("doc_id", "text")
    for (w <- Seq(2, 3, 5)) {
      val md5Form = Dedup.duplicateSpans(docs, w = w).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val rolling = Dedup.duplicateSpansRolling(docs, w = w).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rolling === md5Form, s"strategies diverged at w=$w")
    }
  }

  test("windowFps kernel: rolling fingerprints equal direct polynomial evaluation") {
    // The rolling recurrence F(j+1) = (F(j) - th(j)·B^(w-1))·B + th(j+w)
    // must equal evaluating each window's polynomial from scratch — a
    // drift bug in the update would pass the twin gate only by collision.
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val toks = "the quick brown fox jumps over the lazy dog the quick brown".split(" ")
    val arr: ArrayData = new GenericArrayData(toks.map(t => UTF8String.fromString(t): AnyRef))
    val w = 4
    val got = graft.functions.Sketches.windowFps(arr, w).toLongArray()
    // direct per-window evaluation via a length-w slice (degenerate roll)
    val expect = (0 to toks.length - w).map { j =>
      val slice: ArrayData = new GenericArrayData(
        toks.slice(j, j + w).map(t => UTF8String.fromString(t): AnyRef))
      graft.functions.Sketches.windowFps(slice, w).toLongArray()(0)
    }.toArray
    assert(got.toSeq === expect.toSeq)
    // identical windows (positions 0 and 9 start "the quick brown fox"?
    // no — 9 starts "the quick brown" only w=3; here assert distinctness
    // sanity instead: some collision-free spread
    assert(got.distinct.length > 1)
  }

  test("windowFps128 kernel: both streams roll exactly and fail independently") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    def fps(tokens: Seq[String], w: Int): Seq[(Long, Long)] = {
      val arr: ArrayData = new GenericArrayData(
        tokens.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val out = graft.functions.Sketches.windowFps128(arr, w)
      (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2).asInstanceOf[GenericInternalRow]
        (r.getLong(0), r.getLong(1))
      }
    }
    val toks = "the quick brown fox jumps over the lazy dog the quick brown".split(" ").toSeq
    val w = 4
    val got = fps(toks, w)
    // rolling == direct per-window evaluation on BOTH streams (degenerate
    // roll over a length-w slice computes each polynomial from scratch)
    val expect = (0 to toks.length - w).map(j => fps(toks.slice(j, j + w), w).head)
    assert(got === expect)
    // equal token windows => equal 128-bit fingerprints (determinism)
    assert(fps(Seq("a", "b", "c"), 3) === fps(Seq("a", "b", "c"), 3))
    // the two streams are not in lockstep: across distinct windows the
    // hi stream and lo stream must not be a function of each other
    // (guards against deriving both from one token hash)
    val his = got.map(_._1)
    val los = got.map(_._2)
    assert(his.distinct.length > 1 && los.distinct.length > 1)
    assert(his.zip(los).map { case (h, l) => h ^ l }.distinct.length > 1)
    // a single-token change flips BOTH streams
    val mutated = fps(toks.updated(1, "quack"), w)
    assert(mutated.head._1 !== got.head._1)
    assert(mutated.head._2 !== got.head._2)
    // shorter-than-window input yields no fingerprints
    assert(fps(Seq("a", "b"), 3).isEmpty)
  }

  test("cdcChunkStats: boundaries are content-defined (offset-shift robust), edges handled") {
    import org.apache.spark.sql.functions.{col, length, lit, md5, when, sequence, array, filter => afilter, transform => atransform, concat, zip_with}
    import spark.implicits._
    // the REGISTERED chunker: the native single-pass CdcChunks kernel
    def chunksOf(texts: Seq[String]): Seq[Seq[String]] = {
      graft.functions.GraftFunctions.register(spark)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      df.orderBy("doc_id")
        .select(graft.functions.GraftFunctions.cdcChunks(col("text"), 8))
        .collect().map(_.getSeq[String](0).toSeq).toSeq
    }
    // INDEPENDENT formulation of the identical boundary rule in pure
    // built-ins (sequence/substr/md5 HOFs) — the kernel must match it
    // chunk-for-chunk (incl. multi-byte UTF-8, where char-defined
    // windows and byte-range hashing must agree)
    def chunksOfHof(texts: Seq[String]): Seq[Seq[String]] = {
      val w = 8
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val len = length(col("text"))
      val positions = when(len >= w, sequence(lit(w), len)).otherwise(array().cast("array<int>"))
      val bounds = afilter(positions, p =>
        md5(col("text").substr(p - (w - 1), lit(w)).cast("binary")).startsWith("0"))
      val starts = concat(array(lit(1)), atransform(bounds, b => b + 1))
      val ends = concat(bounds, array(len))
      val chunks = afilter(
        zip_with(starts, ends, (s, e) => when(e >= s, col("text").substr(s, e - s + 1))),
        c => c.isNotNull)
      df.orderBy("doc_id").select(chunks).collect().map(_.getSeq[String](0).toSeq).toSeq
    }
    // a long pseudo-random ASCII body with enough entropy for boundaries
    val body = (0 until 2000).map(i => ((i * 131 + 7) % 83 + 40).toChar).mkString
    val prefix = "PREFIXED DIFFERENT LEAD-IN @@ "
    // kernel == independent HOF formulation, chunk-for-chunk — incl. a
    // multi-byte UTF-8 doc (é/中/emoji) where byte offsets != char offsets
    val utf8Doc = "héllo wörld 中文测试 🌍 " + body.take(300) + " ünïcode tail"
    val fixture = Seq(body, prefix + body, utf8Doc, "short", "")
    assert(chunksOf(fixture) === chunksOfHof(fixture))
    val Seq(base, shifted) = chunksOf(Seq(body, prefix + body))
    assert(base.length > 5, s"fixture produced only ${base.length} chunks")
    // CONTENT-DEFINED: every chunk of the body except the first must
    // reappear verbatim in the prefixed doc — boundaries re-align after
    // the seam because they depend only on the trailing window content
    val shiftedSet = shifted.toSet
    base.drop(1).foreach(c => assert(shiftedSet.contains(c), s"chunk lost after shift: ${c.take(20)}"))
    // fixed-stride chunking would NOT have this property (the prefix
    // length 30 is not a multiple of any stride that matters)
    assert(prefix.length === 30)
    // edges: shorter-than-window doc = 1 whole-text chunk; empty doc = 0
    assert(chunksOf(Seq("short")) === Seq(Seq("short")))
    assert(chunksOf(Seq("")) === Seq(Seq()))
    // chunks reassemble the document exactly (partition, no gaps/overlap)
    assert(base.mkString === body && shifted.mkString === prefix + body)
  }

  test("removeDuplicateSpans: exact coverage on a hand corpus; in-doc repeats; clean docs intact") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ") // exactly one window wide
    val corpus = Seq(
      (1L, s"alpha beta $shared gamma delta"),      // shared span mid-doc
      (2L, s"$shared epsilon zeta eta theta iota"), // same span at doc start
      (3L, "totally unrelated words here only five six seven eight nine"),
      (4L, s"$shared $shared"),                     // in-doc repeat: ALL covered
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(corpus, w = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 1: 12 tokens; positions 2..9 hold the shared window — but ONLY
    // that window's fingerprint repeats (windows straddling the span mix
    // in unique context tokens), so exactly tokens 2..9 are removed
    assert(out(1L) === ((12L, 8L, md5hex("alpha beta gamma delta"))))
    // doc 2: span at start; same reasoning, survivors are the tail
    assert(out(2L) === ((13L, 8L, md5hex("epsilon zeta eta theta iota"))))
    // doc 3: no duplicated window anywhere — byte-identical survivor
    assert(out(3L) === ((10L, 0L,
      md5hex("totally unrelated words here only five six seven eight nine"))))
    // doc 4: two copies back-to-back; every window of the doc repeats
    // corpus-wide (and the doc-internal repeat alone would dup them),
    // so the whole doc is removed and the cleaned text is empty
    assert(out(4L) === ((16L, 16L, md5hex(""))))
  }

  test("contaminationBloom: row-identical to the exact path, and the prefilter prunes") {
    import org.apache.spark.sql.functions.{col, explode, lit, not, xxhash64}
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val bench = col("doc_id") < 5
    val exact = Dedup.contamination(corpus, bench, n = 3).collect().map(_.toSeq)
    val bloom = Dedup.contaminationBloom(corpus, bench, n = 3).collect().map(_.toSeq)
    assert(bloom.length === exact.length)
    assert(bloom.toSeq === exact.toSeq) // false positives must die in the exact join
    // the prefilter must actually drop corpus shingles (otherwise it's
    // just overhead): rebuild the same filter and measure the survivor rate
    graft.functions.GraftFunctions.register(spark)
    val benchGrams = corpus.filter(bench)
      .select(explode(Dedup.shingles("text", 3)).as("g")).distinct()
    val nG = benchGrams.count()
    val bf = benchGrams
      .select(graft.functions.GraftFunctions.bloomAgg(xxhash64(col("g")), nG, nG * 16))
      .head().getAs[Array[Byte]](0)
    val corpusGrams = corpus.filter(not(bench))
      .select(explode(Dedup.shingles("text", 3)).as("g"))
    val total = corpusGrams.count()
    val survive = corpusGrams
      .filter(graft.functions.GraftFunctions.bloomMightContain(lit(bf), xxhash64(col("g"))))
      .count()
    val trueHits = corpusGrams.join(benchGrams, Seq("g"), "left_semi").count()
    info(s"shingles: total=$total survive=$survive trueHits=$trueHits")
    assert(survive < total, "bloom prefilter dropped nothing")
    // fpp budget: survivors beyond true hits stay under 1% of the corpus side
    assert(survive - trueHits <= math.max(1L, total / 100))
  }
}
