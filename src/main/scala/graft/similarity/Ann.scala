package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    Query set must be small (it broadcasts); the corpus side streams.
  *  - [[lshBuckets]] / [[lshTopK]]: random-hyperplane LSH. Hyperplane
  *    components are ±1 derived from xxhash64 so the "random" planes are
  *    deterministic, shippable in the plan, and identical on every executor
  *    — no driver-side randomness, no broadcast of plane matrices.
  *
  * At 100 TB the bucketed join shuffles only (bucket, id, vec) rows and
  * each bucket's candidate set is ~corpus/2^nPlanes, giving tunable
  * recall/cost. Multi-probe = union of per-table buckets (nTables seeds).
  *
  * Tuning: per-plane sign agreement for neighbors at angle θ is 1-θ/π, so
  * a table's hit probability is (1-θ/π)^nPlanes and recall ≈
  * 1-(1-p)^nTables. Tight clusters (small θ) tolerate many planes; for
  * weakly-separated corpora drop nPlanes / raise nTables — candidates per
  * query scale as nTables·corpus/2^nPlanes, so recall is bought with
  * candidate volume (measured floor on the near-isotropic harness
  * embeddings: planes=4, tables=8 → recall@5 ≈ 0.64; see AnnSpec).
  */
object Ann {

  private def asDouble(vecCol: String): Column = col(vecCol).cast("array<double>")

  // codegen'd: norm(e) = sqrt(graft_dot(e, e)); same sequential
  // accumulation as the interpreted HOF it replaced (AnnSpec pins dot
  // bit-equality), so every cosine stays bit-identical to the oracles
  private def norm(e: Column): Column = sqrt(graft.functions.GraftFunctions.dot(e, e))

  // native codegen'd O(dim) inner loop; same accumulation order as the
  // interpreted HOF it replaced, so oracle parity is unchanged. Callers
  // must GraftFunctions.register the session first (each entry point does).
  private def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.dot(a, b)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), ranked by raw cosine desc with id
    * tie-break. The ranking window partitions by query id, so the sort is
    * per-query, never global.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), asDouble(vecCol).as("qe"))
      .withColumn("qn", norm(col("qe")))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(vecCol).as("ce"))
      .withColumn("cn", norm(col("ce")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    broadcast(q)
      .crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }

  /** MMR-diversified rerank over a retrieval's candidate lists: takes the
    * (query_id, neighbor_id, cos_sim) output of ANY top-N path —
    * [[bruteForceTopK]] at audit scale, [[ivfTopKFromIndex]] / [[lshTopK]]
    * at corpus scale — picks each candidate's embedding back up from the
    * corpus, and runs the greedy Maximal-Marginal-Relevance selection
    * ([[graft.functions.MmrSelect]]) per query: k picks maximizing
    * `lam·sim(q,c) − (1−lam)·max sim(c, picked)`, the standard
    * diversity-aware cut a curation pipeline applies so a near-dup-heavy
    * neighborhood doesn't fill the whole result list.
    *
    * Scale shape: the candidate set (queries·N rows) broadcasts into the
    * corpus scan for the embedding pickup — no shuffle of the corpus —
    * then ONE hash aggregate collects each query's ≤N candidates and the
    * whole selection runs as one codegen'd kernel call per query,
    * embarrassingly parallel across queries. Per-task state is N
    * candidate vectors, never the corpus.
    */
  def mmrRerank(
      candidates: DataFrame,
      corpus: DataFrame,
      k: Int,
      lam: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val withEmb = corpus
      .select(col(idCol).as("neighbor_id"), asDouble(vecCol).as("ce"))
      .join(broadcast(candidates.select(col("query_id"), col("neighbor_id"), col("cos_sim"))),
        "neighbor_id")
    withEmb
      .groupBy(col("query_id"))
      .agg(collect_list(struct(col("neighbor_id"), col("cos_sim"), col("ce"))).as("cands"))
      .select(col("query_id"),
        explode(graft.functions.GraftFunctions.mmrSelect(col("cands"), k, lam)).as("m"))
      .select(col("query_id"), col("m.neighbor_id").as("neighbor_id"),
        col("m.mmr_rank").as("mmr_rank"), col("m.mmr_score").as("mmr_score"))
  }

  /** Random-hyperplane LSH bucket id (nPlanes sign bits). Plane p's j-th
    * component is ±1 from a splitmix64 stream keyed by (seed, p·dim+j) —
    * the native codegen'd [[graft.functions.LshBucket]] kernel (the
    * interpreted nested-aggregate HOF formulation cost O(planes·dim)
    * lambda evaluations per row).
    */
  def bucketExpr(emb: DataFrame, vecCol: String, nPlanes: Int, seed: Int): Column = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    graft.functions.GraftFunctions.lshBucket(col(vecCol).cast("array<double>"), nPlanes, seed)
  }

  /** Assign each vector its LSH bucket per hash table. */
  def lshBuckets(
      emb: DataFrame,
      dim: Int,
      nPlanes: Int = 12,
      nTables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame =
    emb.select(
      col(idCol) +: (0 until nTables).map(t => bucketExpr(emb, vecCol, nPlanes, t).as(s"bucket_$t")): _*
    )

  /** Per-query recall@k of an approximate top-k against the exact top-k,
    * reported as a boolean vs `recallFloor`. When both sides are
    * deterministic, the result is a pure function of the data — which
    * makes ANN *quality* oracle-checkable: the oracle simply asserts
    * every sampled query meets the floor.
    *
    * Scale shape: this is the sampled quality audit a production corpus
    * runs continuously — exact top-k over a small query sample (broadcast
    * side) vs the indexed path; never an all-pairs computation.
    */
  def recallVsExact(exact: DataFrame, approx: DataFrame, k: Int, recallFloor: Double): DataFrame =
    recallOf(exact, approx, k)
      .select(col("query_id"), (col("recall") >= recallFloor).as("recall_floor_met"))
      .orderBy(col("query_id"))

  /** Per-query recall@k as a fraction (the raw number behind
    * [[recallVsExact]]'s boolean).
    */
  def recallOf(exact: DataFrame, approx: DataFrame, k: Int): DataFrame =
    exact.select(col("query_id"), col("neighbor_id"))
      .join(
        approx.select(col("query_id"), col("neighbor_id"), lit(1L).as("hit")),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((sum(coalesce(col("hit"), lit(0L))) / k.toDouble).as("recall"))

  /** Monotonicity audit of the IVF operating curve: per query,
    * recall@k at `nProbeHi` must be >= recall@k at `nProbeLo` (probing
    * more lists scans a candidate SUPERSET, and any candidate that could
    * displace a true neighbor from the approximate top-k ranks above it
    * under the shared (cos desc, id) order — so it is itself a true
    * neighbor; a violation therefore means the quantizer or kernel
    * broke, not the data), and the hi setting must find strictly more
    * true neighbors IN TOTAL than the lo one. A single recall floor
    * can't see a regression that flattens the curve — this gate can.
    */
  def ivfRecallMonotonic(
      emb: DataFrame,
      dim: Int,
      k: Int,
      queryFilter: Column,
      nLists: Int,
      nProbeLo: Int,
      nProbeHi: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    require(nProbeLo < nProbeHi, s"need nProbeLo < nProbeHi, got $nProbeLo >= $nProbeHi")
    val exact = bruteForceTopK(emb.filter(queryFilter), emb, k, idCol, vecCol)
    val lo = recallOf(exact, ivfTopK(emb, dim, k, queryFilter, nLists, nProbeLo, idCol, vecCol), k)
      .withColumnRenamed("recall", "r_lo")
    val hi = recallOf(exact, ivfTopK(emb, dim, k, queryFilter, nLists, nProbeHi, idCol, vecCol), k)
      .withColumnRenamed("recall", "r_hi")
    val joined = lo.join(hi, Seq("query_id"))
    val totals = joined.agg(
      sum(col("r_lo")).as("s_lo"), sum(col("r_hi")).as("s_hi"),
      count(lit(1)).as("nq"))
    // strict_gain: probing more lists must find strictly more true
    // neighbors in total — UNLESS recall@lo is already perfect (s_lo at
    // its maximum of one per query), where no gain is possible and a
    // correct implementation must still pass (small corpora / favorable
    // quantizers hit this). The escape is gated on s_hi not regressing:
    // strict_gain must never read true while total recall went DOWN,
    // even if consumers forget to also assert monotone_ok. 1e-9 absorbs
    // the hits/k float division.
    joined.crossJoin(broadcast(totals))
      .select(
        col("query_id"),
        (col("r_hi") >= col("r_lo")).as("monotone_ok"),
        ((col("s_hi") > col("s_lo")) ||
          (col("s_lo") >= col("nq").cast("double") - lit(1e-9) &&
            col("s_hi") >= col("s_lo") - lit(1e-9))).as("strict_gain"))
      .orderBy(col("query_id"))
  }

  /** Recall audit of the LSH path (see [[recallVsExact]]). */
  def lshRecallVsExact(
      emb: DataFrame,
      dim: Int,
      k: Int,
      queryFilter: Column,
      nPlanes: Int,
      nTables: Int,
      recallFloor: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = recallVsExact(
    bruteForceTopK(emb.filter(queryFilter), emb, k, idCol, vecCol),
    lshTopK(emb, dim, k, queryFilter, nPlanes, nTables, idCol, vecCol),
    k, recallFloor)

  /** Matryoshka/truncated-dimension recall: search with only the FIRST
    * `truncDim` components (the matryoshka-representation deployment
    * trick — an MRL-trained encoder front-loads information, so a prefix
    * slice is a usable low-cost embedding: Kusupati et al. 2022),
    * recall@k vs the full-dim exact top-k. The truncated scan reads
    * truncDim/dim of the bytes and does truncDim/dim of the multiplies —
    * the cheap first stage of a coarse→fine funnel; this gate measures
    * what that cut costs on the harness vectors. Both sides are
    * brute-force here: the variable under test is the DIMENSION cut, not
    * the index.
    */
  def truncatedRecallVsExact(
      emb: DataFrame,
      truncDim: Int,
      k: Int,
      queryFilter: Column,
      recallFloor: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val truncated = emb.withColumn(vecCol, expr(s"slice($vecCol, 1, $truncDim)"))
    recallVsExact(
      bruteForceTopK(emb.filter(queryFilter), emb, k, idCol, vecCol),
      bruteForceTopK(truncated.filter(queryFilter), truncated, k, idCol, vecCol),
      k, recallFloor)
  }

  // ------------------------------------------------------------------ IVF

  /** Deterministic coarse quantizer for the IVF path: Lloyd k-means over a
    * fixed sample (the `nSample` lowest-id vectors), fixed iteration
    * count, first-`nLists` init, lowest-index tie-breaks — every run and
    * every executor sees identical centroids, no RNG anywhere. The sample
    * collects to the driver (bounded by nSample·dim doubles); at 100 TB
    * the sample is still tiny — training the quantizer on a sample is the
    * standard IVF construction.
    */
  def trainCentroids(
      emb: DataFrame,
      dim: Int,
      nLists: Int,
      nSample: Int = 256,
      iters: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): Array[Array[Double]] = {
    val sample = emb.orderBy(col(idCol)).limit(nSample)
      .select(asDouble(vecCol)).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= nLists, s"sample ${sample.length} < nLists $nLists")
    lloyd(sample, dim, nLists, iters)
  }

  /** Deterministic in-memory Lloyd iteration (first-k init, lowest-index
    * tie-breaks, empty list keeps its centroid) — the shared core of
    * [[trainCentroids]] and the per-cell fine training in
    * [[trainTwoLevel]].
    */
  def lloyd(sample: Array[Array[Double]], dim: Int, k: Int, iters: Int): Array[Array[Double]] = {
    var centroids = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty list keeps its centroid
        else { val s = sums(c); val n = counts(c).toDouble; s.map(_ / n) }
      }
    }
    centroids
  }

  /** A trained two-level quantizer: coarse centroids, the flattened fine
    * matrix, and each cell's [start, start+len) slice of it. Global fine
    * list id = start(cell) + local index; `totalLists` = fine.length.
    */
  final case class TwoLevelQuantizer(
      coarse: Array[Array[Double]],
      fine: Array[Array[Double]],
      start: Array[Int],
      len: Array[Int],
  ) {
    def totalLists: Int = fine.length
    /** Upper bound on per-vector assignment distances (the flop bound the
      * DedupSpec property pins): coarse cells + the largest cell's list
      * count — vs the flat quantizer's totalLists.
      */
    def maxAssignDistances: Int = coarse.length + len.max
  }

  /** Train the TWO-LEVEL (IVF-in-IVF) quantizer for the >1e5-list regime
    * where flat proportional-nLists assignment goes quadratic
    * (n·nLists·dim flops; see Dedup.semanticNLists): kCoarse ≈ √kTotal
    * coarse cells, then per-cell fine centroids sized to the cell's
    * MEASURED population at ~targetPerList vectors/list — so within-list
    * dedup work keeps the SemDeDup bound while per-vector assignment
    * drops from kTotal to ~2·√kTotal distances.
    *
    * Deterministic end-to-end: coarse training is [[trainCentroids]] on
    * the lowest-id sample; cell populations come from ONE distributed
    * count-by-cell; fine training is per-cell [[lloyd]] over the
    * lowest-id fine sample partitioned by coarse cell on the driver
    * (sample-bounded — no per-cell Spark jobs, no RNG). A cell whose
    * sample is empty keeps its coarse centroid as its single fine list;
    * fine list counts are clamped to the cell's sample size (first-k
    * init needs that many distinct seeds).
    */
  def trainTwoLevel(
      emb: DataFrame,
      dim: Int,
      kTotal: Int,
      targetPerList: Long = 512L,
      iters: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): TwoLevelQuantizer = {
    import graft.functions.GraftFunctions
    GraftFunctions.register(emb.sparkSession)
    val kCoarse = math.max(2, math.ceil(math.sqrt(kTotal.toDouble)).toInt)
    val coarse = trainCentroids(emb, dim, kCoarse,
      nSample = math.max(256, 2 * kCoarse), iters = iters, idCol = idCol, vecCol = vecCol)
    // one distributed pass: measured population per coarse cell
    val pops = emb
      .select(GraftFunctions.nearestCentroid(
        col(vecCol).cast("array<double>"), coarse).as("cell"))
      .groupBy(col("cell")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // driver-side fine sample, partitioned by coarse cell
    val fineSample = emb.orderBy(col(idCol)).limit(math.max(256, 4 * kTotal))
      .select(asDouble(vecCol)).collect()
      .map(_.getSeq[Double](0).toArray)
    val byCell = fineSample.groupBy(v => nearestCentroid(v, coarse))
    val fineB = Array.newBuilder[Array[Double]]
    val start = new Array[Int](kCoarse)
    val len = new Array[Int](kCoarse)
    var off = 0
    for (c <- 0 until kCoarse) {
      val cellSample = byCell.getOrElse(c, Array.empty[Array[Double]])
      val pop = pops.getOrElse(c, 0L)
      val want = math.max(1L, (pop + targetPerList - 1) / targetPerList)
      val kf = math.min(want, math.max(1L, cellSample.length.toLong)).toInt
      val cents =
        if (cellSample.isEmpty) Array(coarse(c).clone())
        else lloyd(cellSample, dim, kf, iters)
      start(c) = off
      len(c) = cents.length
      cents.foreach(fineB += _)
      off += cents.length
    }
    TwoLevelQuantizer(coarse, fineB.result(), start, len)
  }

  private def nearestCentroid(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var j = 0
      while (j < v.length) { val t = v(j) - cent(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c } // strict <: lowest index wins ties
      c += 1
    }
    best
  }

  /** ANN top-k via IVF (inverted-file): corpus vectors partition into
    * `nLists` centroid lists; each query probes its `nProbe` nearest
    * lists and ranks candidates by exact cosine. Shuffles only
    * (list_id, id, vec) — candidates per query ≈ nProbe/nLists of the
    * corpus, the recall/cost dial. Fully deterministic given the data
    * (see [[trainCentroids]]). Assignment and probe fan-out are native
    * codegen'd expressions with the centroid matrix as a plan constant
    * ([[graft.functions.NearestCentroid]] / [[graft.functions.ProbeLists]])
    * — no Dataset-encoder serialization boundary in the per-row path.
    */
  def ivfTopK(
      emb: DataFrame,
      dim: Int,
      k: Int,
      queryFilter: Column,
      nLists: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions
    GraftFunctions.register(emb.sparkSession)
    val centroids = trainCentroids(emb, dim, nLists, idCol = idCol, vecCol = vecCol)
    val assigned = emb.select(col(idCol).as("id"), asDouble(vecCol).as("e"))
      .withColumn("nrm", norm(col("e")))
      .withColumn("list_id", GraftFunctions.nearestCentroid(col("e"), centroids))
    val probes = emb.filter(queryFilter)
      .select(col(idCol).as("query_id"), asDouble(vecCol).as("qe"))
      .withColumn("qn", norm(col("qe")))
      .withColumn("list_id", explode(GraftFunctions.probeLists(col("qe"), centroids, nProbe)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    probes
      .join(assigned.select(col("list_id"), col("id").as("neighbor_id"), col("e").as("ce"), col("nrm").as("cn")), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }

  /** Recall audit of the IVF path (see [[recallVsExact]]). */
  def ivfRecallVsExact(
      emb: DataFrame,
      dim: Int,
      k: Int,
      queryFilter: Column,
      nLists: Int,
      nProbe: Int,
      recallFloor: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = recallVsExact(
    bruteForceTopK(emb.filter(queryFilter), emb, k, idCol, vecCol),
    ivfTopK(emb, dim, k, queryFilter, nLists, nProbe, idCol, vecCol),
    k, recallFloor)

  // -------------------------------------------------- persisted IVF index

  /** Build the IVF index ON DISK: train the quantizer once, assign every
    * corpus vector to its list, and store the lists partitioned by
    * `list_id` — the production shape where index construction is a batch
    * job and queries run against the stored lists without retraining or
    * re-assigning anything. Layout under `path`:
    *
    *   centroids/  (list_id, centroid) parquet — nLists rows, tiny
    *   lists/      (id, e, nrm) parquet, partitionBy(list_id)
    *
    * Because lists are hive-partitioned directories, a query's probe
    * filter prunes at PLANNING time: scan I/O ∝ nProbe/nLists of the
    * corpus no matter how large the index grows.
    */
  def buildIvfIndex(
      emb: DataFrame,
      dim: Int,
      nLists: Int,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): Unit = {
    import graft.functions.GraftFunctions
    val spark = emb.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val centroids = trainCentroids(emb, dim, nLists, idCol = idCol, vecCol = vecCol)
    // centroids FIRST, lists LAST: callers gate index reuse on
    // lists/_SUCCESS, so the gate artifact must be the final write — a
    // crash between the two writes must never leave a check-passing index
    // with missing or stale centroids
    centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    emb.select(col(idCol).as("id"), asDouble(vecCol).as("e"))
      .withColumn("nrm", norm(col("e")))
      .withColumn("list_id", GraftFunctions.nearestCentroid(col("e"), centroids))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
  }

  /** Build a TWO-LEVEL (IVF-in-IVF) index on disk — the production
    * shape once proportional nLists makes flat assignment quadratic
    * (n·kTotal·dim flops; see Dedup.semanticNLists): ~√kTotal coarse
    * cells route each vector to a cell, then to one of the cell's
    * MEASURED-population-sized fine lists, so per-vector assignment is
    * ~2·√kTotal distances and per-query routing is kCoarse +
    * Σ len(probed cells) ([[graft.functions.ProbeLists2]]).
    *
    * On-disk layout is a strict SUPERSET of [[buildIvfIndex]]'s:
    *
    *   coarse/     (cell_id, centroid, start, len) parquet — kCoarse rows
    *   centroids/  (list_id, centroid) — the GLOBAL fine lists, so the
    *               flat probe/append/delete/compact machinery still
    *               works on a two-level index unchanged
    *   lists/      (id, e, nrm) parquet, partitionBy(list_id)
    *
    * Same write order discipline: coarse + centroids first, lists (the
    * `_SUCCESS` reuse gate) LAST.
    */
  def buildIvfIndexTwoLevel(
      emb: DataFrame,
      dim: Int,
      kTotal: Int,
      path: String,
      targetPerList: Long = 512L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): Unit = {
    import graft.functions.GraftFunctions
    val spark = emb.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val q = trainTwoLevel(emb, dim, kTotal, targetPerList, idCol = idCol, vecCol = vecCol)
    q.coarse.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq, q.start(i), q.len(i)) }
      .toDF("cell_id", "centroid", "start", "len")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/coarse")
    q.fine.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    emb.select(col(idCol).as("id"), asDouble(vecCol).as("e"))
      .withColumn("nrm", norm(col("e")))
      .withColumn("list_id",
        GraftFunctions.nearestCentroid2(col("e"), q.coarse, q.fine, q.start, q.len))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
  }

  /** Load the two-level routing tables of a [[buildIvfIndexTwoLevel]]
    * index: (coarse matrix, fine matrix, start, len).
    */
  def loadTwoLevel(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[Array[Double]], Array[Array[Double]], Array[Int], Array[Int]) = {
    val rows = spark.read.parquet(s"$path/coarse").orderBy(col("cell_id"))
      .select(col("centroid"), col("start"), col("len")).collect()
    (rows.map(_.getSeq[Double](0).toArray),
      loadIvfCentroids(spark, path),
      rows.map(_.getInt(1)),
      rows.map(_.getInt(2)))
  }

  /** Query a persisted TWO-LEVEL index: route each query through the
    * coarse cells ([[graft.functions.GraftFunctions.probeLists2]] — the
    * probed set is the `nPerCell` nearest fine lists inside each of the
    * `nCells` nearest cells), then the identical partition-pruned lists
    * scan + exact-cosine rank as the flat [[ivfTopKFromIndex]] — the
    * two levels change WHO gets probed, never how candidates score.
    * Tombstones honored the same way.
    */
  def ivfTopKFromIndex2(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nCells: Int = 2,
      nPerCell: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val (coarse, fine, start, len) = loadTwoLevel(spark, path)
    val probes = queries
      .select(col(idCol).as("query_id"), asDouble(vecCol).as("qe"))
      .withColumn("qn", norm(col("qe")))
      .withColumn("list_id",
        explode(GraftFunctions.probeLists2(col("qe"), coarse, fine, start, len, nCells, nPerCell)))
    val probedLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = dropTombstoned(
      spark.read.parquet(listsDir(spark, path))
        .filter(col("list_id").isin(probedLists.map(Integer.valueOf): _*)), path)
      .select(col("list_id"), col("id").as("neighbor_id"), col("e").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    probes.join(lists, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }

  /** Build the SQ8-QUANTIZED IVF index on disk: same layout and same
    * quantizer as [[buildIvfIndex]], but each list row stores the vector
    * as one-byte-per-component SQ8 codes plus its (lo, hi) range and the
    * DEQUANTIZED norm — 8× smaller list rows than the ARRAY<DOUBLE> form
    * (4× vs float32), which at 100 TB of embeddings is what keeps the
    * probed lists page-cache-resident. Assignment uses the FLOAT vector
    * (quantize after routing, so quantization error never moves a vector
    * across a cluster boundary); search dequantizes inside the fused
    * [[graft.functions.Sq8Dot]] kernel — the code bytes never expand to
    * an array.
    *
    *   centroids/  (list_id, centroid) parquet — nLists rows, tiny
    *   lists/      (id, code, lo, hi, nrm) parquet, partitionBy(list_id)
    */
  def buildIvfIndexSq8(
      emb: DataFrame,
      dim: Int,
      nLists: Int,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): Unit = {
    import graft.functions.GraftFunctions
    val spark = emb.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val centroids = trainCentroids(emb, dim, nLists, idCol = idCol, vecCol = vecCol)
    centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    emb.select(col(idCol).as("id"), asDouble(vecCol).as("e"))
      .withColumn("lo", array_min(col("e")))
      .withColumn("hi", array_max(col("e")))
      .withColumn("code", GraftFunctions.sq8Encode(col("e"), col("lo"), col("hi")))
      // norm of the DEQUANTIZED vector: query-time cosine normalizes in
      // the quantized space, so identical inputs still score exactly 1
      .withColumn("nrm", GraftFunctions.sq8Nrm(col("code"), col("lo"), col("hi")))
      .withColumn("list_id", GraftFunctions.nearestCentroid(col("e"), centroids))
      .select(col("id"), col("code"), col("lo"), col("hi"), col("nrm"), col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
  }

  /** Train the PQ codebook: split the dimension into `m` contiguous
    * subspaces of dim/m components and run the same deterministic
    * [[lloyd]] (first-k init, lowest-index tie-breaks) independently per
    * subspace over the lowest-id sample's sub-vectors. Returns the
    * row-major codebook (row s*ksub + c = subspace s's centroid c) that
    * every PQ kernel takes as a plan constant. Training is
    * sample-bounded driver work, exactly like [[trainCentroids]] — the
    * standard PQ construction at any corpus size.
    */
  def trainPqCodebook(
      emb: DataFrame,
      dim: Int,
      m: Int,
      ksub: Int,
      nSample: Int = 256,
      iters: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): Array[Array[Double]] = {
    require(dim % m == 0, s"dim $dim must divide into m $m subspaces")
    val dsub = dim / m
    val sample = emb.orderBy(col(idCol)).limit(nSample)
      .select(asDouble(vecCol)).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= ksub, s"sample ${sample.length} < ksub $ksub")
    val book = Array.ofDim[Array[Double]](m * ksub)
    var s = 0
    while (s < m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      val cents = lloyd(sub, dsub, ksub, iters)
      var c = 0
      while (c < ksub) { book(s * ksub + c) = cents(c); c += 1 }
      s += 1
    }
    book
  }

  /** Build the PQ-QUANTIZED IVF index on disk: same layout and quantizer
    * as [[buildIvfIndex]], but each list row stores only the m PQ code
    * bytes plus the reconstruction's norm — at the registered operating
    * point (dim=64, m=32, ksub=16) that is 32 bytes of payload per
    * vector, 16× smaller than the ARRAY<DOUBLE> lists and 2× smaller
    * than SQ8 codes. Routing uses the
    * FLOAT vector (quantize after assignment, so PQ error never moves a
    * vector across a list boundary); search is ADC against the stored
    * codebook (see [[graft.functions.PqKernels]]).
    *
    *   centroids/  (list_id, centroid) parquet — nLists rows, tiny
    *   codebook/   (row_id, centroid) parquet — m*ksub rows, tiny
    *   lists/      (id, code, nrm) parquet, partitionBy(list_id)
    */
  def buildIvfIndexPq(
      emb: DataFrame,
      dim: Int,
      nLists: Int,
      m: Int,
      ksub: Int,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): Unit = {
    import graft.functions.GraftFunctions
    val spark = emb.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val centroids = trainCentroids(emb, dim, nLists, idCol = idCol, vecCol = vecCol)
    val codebook = trainPqCodebook(emb, dim, m, ksub, idCol = idCol, vecCol = vecCol)
    // lists LAST (the reuse gate checks lists/_SUCCESS): a crashed build
    // can never leave a check-passing index with stale centroids/codebook
    centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    codebook.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("row_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    emb.select(col(idCol).as("id"), asDouble(vecCol).as("e"))
      .withColumn("code", GraftFunctions.pqEncode(col("e"), codebook, ksub))
      // norm of the RECONSTRUCTED vector: cosine normalizes in the
      // quantized space, so identical inputs still score exactly 1
      .withColumn("nrm", GraftFunctions.pqNrm(col("code"), codebook, ksub))
      .withColumn("list_id", GraftFunctions.nearestCentroid(col("e"), centroids))
      .select(col("id"), col("code"), col("nrm"), col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
  }

  /** The stored PQ codebook, in row order (row s*ksub + c). */
  def loadPqCodebook(spark: org.apache.spark.sql.SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(s"$path/codebook").orderBy(col("row_id"))
      .select(col("centroid")).collect().map(_.getSeq[Double](0).toArray)

  /** ANN top-k against a [[buildIvfIndexPq]] index: identical probe/
    * prune/rank shape to [[ivfTopKFromIndex]], with candidate scoring by
    * ADC — each probe row carries its precomputed lookup table
    * (graft_pq_lut, one per query row, BEFORE the join), and every
    * candidate costs m table adds (graft_pq_adc_dot) instead of a dim-
    * length dot. The 16×-smaller lists plus O(m) scoring are what let a
    * 100 TB corpus's probed lists stay RAM-resident AND cheap to rank.
    * With `refineWith` set, the ADC ranking produces a
    * refineFactor·k-deep shortlist that is re-ranked by exact cosine
    * over full vectors fetched by key from the given corpus — the
    * standard PQ refine stage; without it the ADC order is final.
    */
  def ivfTopKFromIndexPq(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      ksub: Int,
      nProbe: Int = 4,
      refineWith: Option[DataFrame] = None,
      refineFactor: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val centroids = loadIvfCentroids(spark, path)
    val codebook = loadPqCodebook(spark, path)
    val shortK = if (refineWith.isDefined) refineFactor * k else k
    val probes = queries
      .select(col(idCol).as("query_id"), asDouble(vecCol).as("qe"))
      .withColumn("qn", norm(col("qe")))
      .withColumn("lut", GraftFunctions.pqLut(col("qe"), codebook, ksub))
      .withColumn("list_id", explode(GraftFunctions.probeLists(col("qe"), centroids, nProbe)))
      .drop("qe")
    val probedLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = dropTombstoned(
      spark.read.parquet(listsDir(spark, path))
        .filter(col("list_id").isin(probedLists.map(Integer.valueOf): _*)), path)
      .select(col("list_id"), col("id").as("neighbor_id"), col("code"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    val adcTopK = probes.join(lists, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        GraftFunctions.pqAdcDot(col("lut"), col("code")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= shortK)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
    refineWith match {
      case None => adcTopK
      case Some(corpus) =>
        // the standard IVF-PQ REFINE step (Jégou et al. §V): the ADC
        // shortlist (|queries|·refineFactor·k rows — broadcast-scale) is
        // re-ranked by EXACT cosine over full vectors fetched by key.
        // ADC's reconstruction error then only matters if it pushes a
        // true neighbor out of the 4k-deep shortlist, not the top k —
        // at 100 TB the fetch is a key-value point read per shortlist
        // row, expressed here as a broadcast semi-join against the
        // corpus (column-pruned to id+vec by the scan).
        val qs = queries.select(col(idCol).as("query_id"), asDouble(vecCol).as("qe"))
          .withColumn("qn", norm(col("qe")))
        val cands = corpus.select(col(idCol).as("neighbor_id"), asDouble(vecCol).as("ce"))
          .join(broadcast(adcTopK.select(col("query_id"), col("neighbor_id"))), Seq("neighbor_id"))
          .withColumn("cn", norm(col("ce")))
        val w2 = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
        cands.join(broadcast(qs), Seq("query_id"))
          .withColumn("cos_sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
          .withColumn("rk", row_number().over(w2).cast("bigint"))
          .filter(col("rk") <= k)
          .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
    }
  }

  /** ANN top-k against a [[buildIvfIndexSq8]] index: identical probe/
    * prune/rank shape to [[ivfTopKFromIndex]] — partition-pruned probed
    * lists, (cos desc, id) tie-break — with the cosine computed by the
    * fused dequantizing dot kernel over the stored code bytes.
    */
  def ivfTopKFromIndexSq8(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val centroids = loadIvfCentroids(spark, path)
    val probes = queries
      .select(col(idCol).as("query_id"), asDouble(vecCol).as("qe"))
      .withColumn("qn", norm(col("qe")))
      .withColumn("list_id", explode(GraftFunctions.probeLists(col("qe"), centroids, nProbe)))
    val probedLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = dropTombstoned(
      spark.read.parquet(listsDir(spark, path))
        .filter(col("list_id").isin(probedLists.map(Integer.valueOf): _*)), path)
      .select(col("list_id"), col("id").as("neighbor_id"),
        col("code"), col("lo"), col("hi"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    probes.join(lists, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        GraftFunctions.sq8Dot(col("qe"), col("code"), col("lo"), col("hi"))
          / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }

  /** Cheap content key for index caching: the DataFrame's input files as
    * sorted (path, length, mtime) triples, hashed. O(#files) driver
    * METADATA work — no data scan, so it stays viable when the corpus is
    * 100 TB — while regenerated data at the same logical path (fresh file
    * names or mtimes) yields a fresh key and thus a fresh index.
    */
  def inputFingerprint(df: DataFrame): String = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val entries = df.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    val h = entries.foldLeft(1125899906842597L)((acc, e) =>
      e.foldLeft(acc * 31 + e.length)((a, c) => a * 131 + c))
    java.lang.Long.toHexString(h)
  }

  /** The stored quantizer, in list order. */
  def loadIvfCentroids(spark: org.apache.spark.sql.SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(s"$path/centroids").orderBy(col("list_id"))
      .select(col("centroid")).collect().map(_.getSeq[Double](0).toArray)

  /** APPEND a new shard to a [[buildIvfIndex]]-persisted index WITHOUT
    * retraining — the index-maintenance half of the build-once contract.
    * A 100 TB corpus lands in shards; re-clustering the world per shard
    * would invalidate every stored assignment, so production IVF
    * systems freeze the quantizer and route new vectors through it
    * (exactly like the frozen BPE merge table: train once, apply
    * forever; re-train is a deliberate full rebuild). Assignment uses
    * the STORED centroids as a plan constant; the shard's rows append
    * to the hive-partitioned lists, so queries pick the new vectors up
    * with no change anywhere — the probed-list pruning, kernels, and
    * tie-breaks are oblivious to which build wrote a row.
    *
    * NOT idempotent (append twice = rows twice): callers own the
    * applied-shards bookkeeping, e.g. the gate query's `_APPENDED`
    * marker protocol. AnnSpec pins quantizer immutability under append
    * and that disk assignment == an independent recomputation.
    */
  def appendToIvfIndex(
      shard: DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): Unit = {
    import graft.functions.GraftFunctions
    val spark = shard.sparkSession
    GraftFunctions.register(spark)
    val centroids = loadIvfCentroids(spark, path)
    shard.select(col(idCol).as("id"), asDouble(vecCol).as("e"))
      .withColumn("nrm", norm(col("e")))
      .withColumn("list_id", GraftFunctions.nearestCentroid(col("e"), centroids))
      .write.mode("append").partitionBy("list_id").parquet(listsDir(spark, path))
  }

  /** TOMBSTONE DELETE for a persisted IVF index: the ids land as an
    * append-only parquet under `path/tombstones` — O(deletes) I/O, no
    * touch of the hive-partitioned lists (at 100 TB a delete must never
    * rewrite list files). Probe scans honor tombstones immediately via a
    * broadcast anti-join (the tombstone set is small by construction —
    * compaction folds it into the lists and clears it before it isn't).
    * Idempotent: deleting an id twice, or an id the index never held, is
    * harmless (the anti-join doesn't care).
    */
  def deleteFromIvfIndex(
      ids: DataFrame,
      path: String,
      idCol: String = "vec_id"): Unit =
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .coalesce(1).write.mode("append").parquet(s"$path/tombstones")

  /** Self-heal a compaction publish that crashed mid-swap, then return
    * the lists directory. [[compactIvfIndex]]'s publish is two renames,
    * and a crash between them leaves NO `lists` directory. If the
    * compacted candidate completed (`lists_compacting/_SUCCESS`
    * present), roll FORWARD — publish it and clear the retired dir and
    * the tombstones, finishing the crashed compaction; otherwise roll
    * BACK to `lists_retired`. Every lists reader and appender resolves
    * the directory through here, so a crashed publish heals on the next
    * touch of the index (compaction remains a single-writer maintenance
    * window — a probe racing the swap itself can still observe the gap,
    * see the compactIvfIndex doc).
    */
  private def listsDir(spark: org.apache.spark.sql.SparkSession, path: String): String = {
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val lists = s"$path/lists"
    if (!graft.io.Fio.exists(lists)) {
      val tmp = s"$path/lists_compacting"
      val retired = s"$path/lists_retired"
      if (graft.io.Fio.exists(s"$tmp/_SUCCESS")) {
        require(graft.io.Fio.rename(tmp, lists),
          s"ivf recover: could not roll the completed compaction forward at $path")
        graft.io.Fio.delete(retired)
        graft.io.Fio.delete(s"$path/tombstones")
      } else if (graft.io.Fio.exists(retired)) {
        require(graft.io.Fio.rename(retired, lists),
          s"ivf recover: could not roll back to the retired lists at $path")
        graft.io.Fio.delete(tmp)
      }
    }
    lists
  }

  /** The live tombstone set, if any delete has ever landed. */
  private def tombstones(
      spark: org.apache.spark.sql.SparkSession, path: String): Option[DataFrame] = {
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    if (graft.io.Fio.exists(s"$path/tombstones/_SUCCESS"))
      Some(spark.read.parquet(s"$path/tombstones").select(col("id")))
    else None
  }

  /** Drop tombstoned rows from a lists frame (broadcast anti-join; no-op
    * when no delete has ever landed — the common case plans scan-only).
    */
  private def dropTombstoned(lists: DataFrame, path: String): DataFrame =
    tombstones(lists.sparkSession, path) match {
      case Some(t) => lists.join(broadcast(t), Seq("id"), "left_anti")
      case None => lists
    }

  /** COMPACT a persisted IVF index: fold the tombstones into the lists
    * and merge the small files shard appends accumulate into ONE file
    * per list — the maintenance pass a long-lived 100 TB index needs
    * (every append lands ≥1 file per touched list; a thousand appends
    * make probe scans open thousands of small files). The quantizer is
    * FROZEN: assignments are read off the stored `list_id` hive column,
    * never recomputed, so compaction is one shuffle keyed on list_id —
    * corpus-linear I/O, no distance math, no driver materialization.
    * Publish is swap-by-rename (write beside, retire, rename in). A
    * crash never leaves a MIX of old and new list files, but the swap is
    * two renames, so a crash between them leaves no lists directory at
    * all — [[listsDir]] heals that window on the next touch of the
    * index (roll forward if the candidate completed, roll back to the
    * retired lists otherwise). Compaction is a single-writer maintenance
    * operation: a probe planned concurrently with the swap itself can
    * still observe the gap, so run it from the index's maintenance owner,
    * not alongside live probes. The tombstone set is cleared only after
    * the swapped-in lists exclude it.
    *
    * Layout-agnostic: the pass never reads a vector column, only the
    * hive key — so it compacts float (`id,e,nrm`), SQ8
    * (`id,code,lo,hi,nrm`) and PQ lists identically, and all three
    * probe paths honor the same tombstone set before compaction.
    */
  def compactIvfIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val live = dropTombstoned(spark.read.parquet(listsDir(spark, path)), path)
    val tmp = s"$path/lists_compacting"
    graft.io.Fio.delete(tmp) // a crashed earlier compaction's leftovers
    // hash-repartition on the hive key: each list's rows converge on one
    // task, so partitionBy emits exactly one file per list directory
    live.repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(tmp)
    val retired = s"$path/lists_retired"
    graft.io.Fio.delete(retired)
    require(graft.io.Fio.rename(s"$path/lists", retired),
      s"ivf compact: could not retire $path/lists")
    require(graft.io.Fio.rename(tmp, s"$path/lists"),
      s"ivf compact: could not publish compacted lists at $path")
    graft.io.Fio.delete(retired)
    graft.io.Fio.delete(s"$path/tombstones")
  }

  /** ANN top-k against a [[buildIvfIndex]]-persisted index. The probed
    * list ids collect to the driver (bounded by |queries|·nProbe ints) and
    * become a partition-pruning filter on the lists scan — only probed
    * list directories are read. Produces exactly [[ivfTopK]]'s output for
    * the same parameters (same kernels, same tie-breaks). Tombstoned ids
    * (deleteFromIvfIndex) are anti-joined out; after compaction the
    * anti-join disappears from the plan entirely.
    */
  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val centroids = loadIvfCentroids(spark, path)
    val probes = queries
      .select(col(idCol).as("query_id"), asDouble(vecCol).as("qe"))
      .withColumn("qn", norm(col("qe")))
      .withColumn("list_id", explode(GraftFunctions.probeLists(col("qe"), centroids, nProbe)))
    val probedLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = dropTombstoned(
      spark.read.parquet(listsDir(spark, path))
        .filter(col("list_id").isin(probedLists.map(Integer.valueOf): _*)), path)
      .select(col("list_id"), col("id").as("neighbor_id"), col("e").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    probes.join(lists, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }

  /** ANN top-k via LSH: candidates = corpus vectors sharing any table's
    * bucket with the query; exact cosine rank within candidates.
    */
  def lshTopK(
      emb: DataFrame,
      dim: Int,
      k: Int,
      queryFilter: Column,
      nPlanes: Int = 12,
      nTables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = lshBuckets(emb, dim, nPlanes, nTables, idCol, vecCol)
      .join(emb.select(col(idCol), asDouble(vecCol).as("e")), Seq(idCol))
      .withColumn("nrm", norm(col("e")))
    val long = bucketed.select(
      col(idCol),
      col("e"),
      col("nrm"),
      explode(array((0 until nTables).map(t => struct(lit(t).as("tbl"), col(s"bucket_$t").as("bucket"))): _*))
        .as("tb"),
    ).select(col(idCol), col("e"), col("nrm"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val q = long.filter(queryFilter)
      .select(col("tbl"), col("bucket"), col(idCol).as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val c = long.select(col("tbl"), col("bucket"), col(idCol).as("neighbor_id"), col("e").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos_sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }
}
