package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LSH ANN quality vs the exact baseline on the harness embeddings
  * (deterministic planes ⇒ deterministic recall). This is the promised
  * companion to the rows-only `emb_lsh_topk` registered query.
  */
class AnnSpec extends AnyFunSuite with SparkSpec {

  // sf0.01 = 500 vectors: enough for meaningful bucket statistics.
  // These synthetic embeddings are near-isotropic — hyperplane LSH's worst
  // case (top-5 cosine ≈ 0.35 ⇒ per-plane agreement ≈ 0.6): measured
  // recalls here are the conservative floor, clustered real embeddings
  // bucket far better.
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  private val k = 5
  private def qf = col("vec_id") < 10

  private lazy val exact = Ann.bruteForceTopK(emb.filter(qf), emb, k)
    .select("query_id", "neighbor_id").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallWith(planes: Int, tables: Int): Double = {
    val a = Ann.lshTopK(emb, 64, k, qf, nPlanes = planes, nTables = tables)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact intersect a).size.toDouble / exact.size
  }

  test("native graft_dot is bit-identical to the interpreted HOF dot") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val pairs = emb.limit(50).select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
      .crossJoin(emb.limit(7).select(col("embedding").cast("array<double>").as("b")))
    val both = pairs.select(
      graft.functions.GraftFunctions.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("hof"),
    ).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) === java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("lshTopK recall@5 vs bruteForceTopK clears the floor at the default operating point") {
    assert(exact.size === 10 * k)
    val recall = recallWith(4, 8) // the registered query's operating point
    assert(recall >= 0.5, f"LSH recall@5 = $recall%.2f below floor")
  }

  test("recall responds to tuning: more tables help, more planes cut candidates") {
    assert(recallWith(4, 16) >= recallWith(4, 4) - 1e-9)
    assert(recallWith(2, 8) >= recallWith(8, 8) - 1e-9)
  }

  test("ivfTopK: deterministic quantizer, recall clears the registered floor") {
    // centroids are a pure function of the data: two trainings identical
    val c1 = Ann.trainCentroids(emb, 64, 16)
    val c2 = Ann.trainCentroids(emb, 64, 16)
    assert(c1.length === 16)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    val rows = Ann.ivfRecallVsExact(emb, 64, k, qf, nLists = 16, nProbe = 4, recallFloor = 0.4)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(rows.map(_._1).toSeq === (0L until 10L))
    assert(rows.forall(_._2), s"queries below floor: ${rows.filterNot(_._2).mkString(",")}")
    // probing every list is exhaustive: recall must be exactly 1.0
    val full = Ann.ivfRecallVsExact(emb, 64, k, qf, nLists = 16, nProbe = 16, recallFloor = 0.999)
      .collect().map(_.getBoolean(1))
    assert(full.forall(identity), "nProbe=nLists must recover the exact top-k")
  }

  test("IVF recall curve: monotone non-decreasing in nProbe, exact at full probe") {
    // the whole operating curve, not one point: each step widens the
    // candidate set, so per-query recall may never drop
    def meanRecall(nProbe: Int): Double =
      Ann.recallOf(
        Ann.bruteForceTopK(emb.filter(qf), emb, k),
        Ann.ivfTopK(emb, 64, k, qf, nLists = 16, nProbe = nProbe), k)
        .agg(avg("recall")).collect().head.getDouble(0)
    val curve = Seq(1, 2, 4, 8, 16).map(meanRecall)
    curve.sliding(2).foreach { case Seq(lo, hi) =>
      assert(hi >= lo - 1e-12, s"recall curve not monotone: $curve")
    }
    assert(math.abs(curve.last - 1.0) < 1e-12, s"full probe must be exact, got ${curve.last}")
    // and the registered gate's shape: strict gain from 4 → 8 probes
    val rows = Ann.ivfRecallMonotonic(emb, 64, k, qf, nLists = 16, nProbeLo = 4, nProbeHi = 8)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.map(_._1).toSeq === (0L until 10L))
    assert(rows.forall(_._2), s"per-query monotonicity violated: ${rows.mkString(",")}")
    assert(rows.forall(_._3), "expected a strict total-recall gain from probe 4 to 8")
  }

  test("persisted IVF index: query-from-disk output is identical to the in-memory path") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    Ann.buildIvfIndex(emb, dim = 64, nLists = 16, path = idx)

    val fromIndex = Ann.ivfTopKFromIndex(spark, idx, emb.filter(qf), k, nProbe = 4)
    val inMemory = Ann.ivfTopK(emb, 64, k, qf, nLists = 16, nProbe = 4)
    val a = fromIndex.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val b = inMemory.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(a === b, "persisted and in-memory IVF must produce bit-identical top-k")

    // the probe filter prunes list directories at planning time
    val pruned = spark.read.parquet(s"$idx/lists").filter(col("list_id") === 0)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(pruned.nonEmpty && pruned.forall(_.contains("list_id=0")))

    // stored quantizer round-trips exactly
    val stored = Ann.loadIvfCentroids(spark, idx)
    val trained = Ann.trainCentroids(emb, 64, 16)
    assert(stored.map(_.toSeq).toSeq === trained.map(_.toSeq).toSeq)
  }

  test("two-level IVF: probe kernel == reference, disk assignment == recomputation, recall floor") {
    import graft.functions.GraftFunctions
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf2-spec").toString
    val n = emb.count()
    Ann.buildIvfIndexTwoLevel(emb, dim = 64, kTotal = 16, path = idx,
      targetPerList = math.max(1L, n / 16L))
    val (coarse, fine, start, len) = Ann.loadTwoLevel(spark, idx)
    assert(start.zip(len).map { case (s, l) => s + l }.max === fine.length)

    // probeLists2 == a driver-side reference over the loaded quantizer
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val qs = emb.filter(qf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("probed", GraftFunctions.probeLists2(col("e"), coarse, fine, start, len, 2, 4))
      .collect()
    qs.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val cells = coarse.indices.sortBy(c => (l2(v, coarse(c)), c)).take(2)
      val want = cells.flatMap { c =>
        (0 until len(c)).sortBy(i => (l2(v, fine(start(c) + i)), i)).take(4).map(start(c) + _)
      }
      assert(r.getSeq[Int](2) === want, s"probe mismatch for query ${r.getLong(0)}")
    }

    // disk assignment == independent two-level recomputation
    val stored = spark.read.parquet(s"$idx/lists")
      .select(col("id"), col("list_id"),
        GraftFunctions.nearestCentroid2(col("e"), coarse, fine, start, len).as("re"))
    assert(stored.filter(col("list_id") =!= col("re")).count() === 0L)

    // end-to-end recall floor through the persisted two-level probe
    val topk = Ann.ivfTopKFromIndex2(spark, idx, emb.filter(qf), k, nCells = 2, nPerCell = 4)
    val rec = Ann.recallVsExact(Ann.bruteForceTopK(emb.filter(qf), emb, k), topk, k, 0.4)
    assert(rec.filter(!col("recall_floor_met")).count() === 0L)
  }

  test("SQ8 quantization: per-component error bounded by half a step; constant vectors exact") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val rows = emb.limit(100)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("lo", array_min(col("e")))
      .withColumn("hi", array_max(col("e")))
      .withColumn("code", GraftFunctions.sq8Encode(col("e"), col("lo"), col("hi")))
      .collect()
    rows.foreach { r =>
      val e = r.getSeq[Double](1)
      val lo = r.getDouble(2); val hi = r.getDouble(3)
      val code = r.getAs[Array[Byte]](4)
      assert(code.length === e.length)
      val step = (hi - lo) / 255.0
      e.indices.foreach { i =>
        val deq = lo + (code(i) & 0xff) * step
        assert(math.abs(deq - e(i)) <= step / 2 + 1e-12,
          s"vec ${r.getLong(0)} comp $i: |$deq - ${e(i)}| > ${step / 2}")
      }
    }
    // degenerate range (constant vector): codes are all zero and the
    // dequantized norm is |lo|*sqrt(dim) exactly
    import spark.implicits._
    val const = Seq((1L, Seq(0.25, 0.25, 0.25, 0.25))).toDF("vec_id", "e")
      .withColumn("code", GraftFunctions.sq8Encode(col("e"), lit(0.25), lit(0.25)))
      .withColumn("nrm", GraftFunctions.sq8Nrm(col("code"), lit(0.25), lit(0.25)))
    val cr = const.select("code", "nrm").head()
    assert(cr.getAs[Array[Byte]](0).toSeq === Seq[Byte](0, 0, 0, 0))
    assert(math.abs(cr.getDouble(1) - 0.5) < 1e-15) // 0.25 * sqrt(4)
  }

  test("SQ8 persisted IVF: recall floor holds, identical copies score cos 1, lists are code bytes") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-sq8-spec").toString
    Ann.buildIvfIndexSq8(emb, dim = 64, nLists = 16, path = idx)
    // recall vs exact float brute force clears the same floor as the
    // float index at the same operating point
    val rows = Ann.recallVsExact(
      Ann.bruteForceTopK(emb.filter(qf), emb, k),
      Ann.ivfTopKFromIndexSq8(spark, idx, emb.filter(qf), k, nProbe = 4),
      k, recallFloor = 0.4)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(rows.map(_._1).toSeq === (0L until 10L))
    assert(rows.forall(_._2), s"queries below floor: ${rows.filterNot(_._2).mkString(",")}")
    // an identical copy of the query vector must rank FIRST. Search is
    // asymmetric (ADC: float query against dequantized codes), so the
    // score is 1 - O(quantization error), not exactly 1 — the bound here
    // is generous vs the measured ~2e-5 on these 64-dim vectors.
    val withCopy = emb.unionByName(
      emb.filter(col("vec_id") === 3).withColumn("vec_id", lit(100003L)))
    val idx2 = java.nio.file.Files.createTempDirectory("graft-ivf-sq8-copy").toString
    Ann.buildIvfIndexSq8(withCopy, dim = 64, nLists = 16, path = idx2)
    val top = Ann.ivfTopKFromIndexSq8(spark, idx2,
      withCopy.filter(col("vec_id") === 3), k = 1, nProbe = 1)
      .collect().head
    assert(top.getLong(1) === 100003L, s"copy not ranked first: $top")
    assert(top.getDouble(2) > 0.999, s"copy cosine ${top.getDouble(2)} below ADC bound")
    // stored list rows are BINARY codes of dim bytes — the 8x storage win
    val one = spark.read.parquet(s"$idx/lists").limit(1).collect().head
    assert(one.getAs[Array[Byte]]("code").length === 64)
  }

  test("lshRecallVsExact: every audited query clears the registered floor") {
    val rows = Ann.lshRecallVsExact(emb, 64, k, qf, nPlanes = 4, nTables = 8, recallFloor = 0.2)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(rows.map(_._1).toSeq === (0L until 10L)) // one row per query, ordered
    assert(rows.forall(_._2), s"queries below floor: ${rows.filterNot(_._2).mkString(",")}")
    // an unattainable floor must flip rows false, not drop them
    val strict = Ann.lshRecallVsExact(emb, 64, k, qf, 4, 8, recallFloor = 1.01)
      .collect().map(_.getBoolean(1))
    assert(strict.length === 10 && strict.forall(!_))
  }

  test("truncatedRecallVsExact: full-dim truncation is the identity (recall 1); half-dim stays a valid ranking") {
    // truncating to ALL 64 dims changes nothing → recall exactly 1 per query
    val full = Ann.truncatedRecallVsExact(emb, truncDim = 64, k, qf, recallFloor = 0.999)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(full.map(_._1).toSeq === (0L until 10L) && full.forall(_._2))
    // half-dim: every query row present, floor semantics intact (recall
    // on these non-MRL synthetic vectors is low — that's the point of
    // the emb_matryoshka_hits measurement; here we only pin mechanics)
    val half = Ann.truncatedRecallVsExact(emb, truncDim = 32, k, qf, recallFloor = 0.0)
      .collect()
    assert(half.length === 10 && half.forall(_.getBoolean(1)))
  }

  test("appendToIvfIndex: frozen quantizer, disk assignment == recomputation, search sees all") {
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    val base = emb.filter(col("vec_id") % 2 === 0)
    val shard = emb.filter(col("vec_id") % 2 === 1)
    Ann.buildIvfIndex(base, dim = 64, nLists = 16, path = idx)
    val before = Ann.loadIvfCentroids(spark, idx)
    Ann.appendToIvfIndex(shard, path = idx)
    // 1. append must NOT touch the quantizer (the frozen-table contract)
    val after = Ann.loadIvfCentroids(spark, idx)
    assert(before.length === after.length)
    before.zip(after).foreach { case (a, b) => assert(a.sameElements(b)) }
    // 2. every corpus id is on disk exactly once, in exactly the list an
    //    independent recomputation with the stored centroids assigns
    graft.functions.GraftFunctions.register(spark)
    val onDisk = spark.read.parquet(s"$idx/lists")
      .select(col("id"), col("list_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val recomputed = emb.select(col("vec_id"),
        graft.functions.GraftFunctions.nearestCentroid(
          col("embedding").cast("array<double>"), before).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(onDisk.size === recomputed.size) // no duplicates, no misses
    assert(onDisk === recomputed)
    // 3. search over the appended index ranks appended vectors too: an
    //    odd id's exact duplicate... the corpus has none, so assert the
    //    weaker-but-real property that top-k results INCLUDE odd
    //    (appended) neighbors for at least one audited query
    val topk = Ann.ivfTopKFromIndex(spark, idx, emb.filter(qf), k, nProbe = 4)
      .select(col("neighbor_id")).collect().map(_.getLong(0))
    assert(topk.exists(_ % 2 === 1), "appended (odd) vectors never surfaced in search")
  }

  test("delete + compact: tombstones honored pre-compaction, folded in by compaction, files merged") {
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_compact").toString
    Ann.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0), dim = 64, nLists = 16, path = idx)
    Ann.appendToIvfIndex(emb.filter(col("vec_id") % 2 === 1), path = idx)
    val centroidsBefore = Ann.loadIvfCentroids(spark, idx)
    val rowsBefore = spark.read.parquet(s"$idx/lists").count()
    val deleted = emb.filter(col("vec_id") % 7 === 2).select(col("vec_id"))
    val nDeleted = deleted.count()
    assert(nDeleted > 0)
    Ann.deleteFromIvfIndex(deleted, idx)

    // BEFORE compaction: tombstones already filter the probe scan
    val preFull = Ann.ivfTopKFromIndex(spark, idx, emb.filter(qf), k, nProbe = 16)
      .select(col("query_id"), col("neighbor_id"), col("rk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(preFull.nonEmpty && preFull.forall(_._2 % 7 != 2),
      "tombstoned id surfaced before compaction")
    // ...and the lists themselves are untouched (O(deletes) delete)
    assert(spark.read.parquet(s"$idx/lists").count() === rowsBefore)

    Ann.compactIvfIndex(spark, idx)
    // tombstoned rows are physically gone and the tombstone set cleared
    val after = spark.read.parquet(s"$idx/lists")
    assert(after.count() === rowsBefore - nDeleted)
    assert(after.filter(col("id") % 7 === 2).count() === 0L)
    assert(!new java.io.File(s"$idx/tombstones").exists())
    // the quantizer is untouched (frozen-table contract survives compact)
    val centroidsAfter = Ann.loadIvfCentroids(spark, idx)
    centroidsBefore.zip(centroidsAfter).foreach { case (a, b) => assert(a.sameElements(b)) }
    // build+append left >=2 files in touched lists; compaction merges to 1
    val listDirs = new java.io.File(s"$idx/lists").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("list_id="))
    assert(listDirs.nonEmpty)
    listDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"${d.getName}: ${parts.length} files after compaction")
    }
    // search parity: compacted output == the tombstone-filtered output
    // the same index gave BEFORE compaction (same kernels, same
    // tie-breaks, same live rows — only the layout moved)
    val postTopk = Ann.ivfTopKFromIndex(spark, idx, emb.filter(qf), k, nProbe = 16)
      .select(col("query_id"), col("neighbor_id"), col("rk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(postTopk === preFull)
    // deleting an id twice / an unknown id is harmless (idempotence)
    Ann.deleteFromIvfIndex(deleted.limit(3), idx)
    Ann.deleteFromIvfIndex(spark.range(900000, 900005).select(col("id").as("vec_id")), idx)
    assert(Ann.ivfTopKFromIndex(spark, idx, emb.filter(qf), k, nProbe = 16)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet === postTopk.map(_._2).toSet)
  }

  test("compaction crash window heals on next touch: roll back and roll forward") {
    import org.apache.spark.sql.functions.col
    def topk(idx: String) = Ann.ivfTopKFromIndex(spark, idx, emb.filter(qf), k, nProbe = 16)
      .select(col("query_id"), col("neighbor_id"), col("rk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // ROLL BACK: crash after retiring the old lists, before the candidate
    // completed — no lists dir, an INCOMPLETE lists_compacting (no
    // _SUCCESS), the old lists under lists_retired. The next probe must
    // restore the retired lists and discard the partial candidate.
    val idx1 = java.nio.file.Files.createTempDirectory("graft_ivf_crash_rb").toString
    Ann.buildIvfIndex(emb, dim = 64, nLists = 16, path = idx1)
    val expected1 = topk(idx1)
    assert(new java.io.File(s"$idx1/lists").renameTo(new java.io.File(s"$idx1/lists_retired")))
    val partial = new java.io.File(s"$idx1/lists_compacting")
    assert(partial.mkdirs())
    java.nio.file.Files.write(partial.toPath.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    assert(topk(idx1) === expected1, "probe after roll-back recovery diverged")
    assert(new java.io.File(s"$idx1/lists").isDirectory)
    assert(!new java.io.File(s"$idx1/lists_retired").exists())
    assert(!new java.io.File(s"$idx1/lists_compacting").exists())

    // ROLL FORWARD: crash between the two publish renames with a COMPLETE
    // candidate (_SUCCESS present) — the next probe finishes the crashed
    // compaction: publishes the candidate, drops the retired dir, clears
    // the tombstones (harmless unknown-id tombstones stand in for a folded
    // set: a candidate produced by a real compaction excludes its ids).
    val idx2 = java.nio.file.Files.createTempDirectory("graft_ivf_crash_rf").toString
    Ann.buildIvfIndex(emb, dim = 64, nLists = 16, path = idx2)
    val expected2 = topk(idx2)
    Ann.deleteFromIvfIndex(spark.range(900000, 900003).select(col("id").as("vec_id")), idx2)
    assert(new java.io.File(s"$idx2/lists").renameTo(new java.io.File(s"$idx2/lists_compacting")))
    assert(new java.io.File(s"$idx2/lists_retired").mkdirs())
    assert(topk(idx2) === expected2, "probe after roll-forward recovery diverged")
    assert(new java.io.File(s"$idx2/lists").isDirectory)
    assert(!new java.io.File(s"$idx2/lists_retired").exists())
    assert(!new java.io.File(s"$idx2/lists_compacting").exists())
    assert(!new java.io.File(s"$idx2/tombstones").exists(), "tombstones cleared by roll-forward")
  }

  test("SQ8 index honors tombstones and compacts under the same lifecycle") {
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_sq8_compact").toString
    Ann.buildIvfIndexSq8(emb, dim = 64, nLists = 16, path = idx)
    val rowsBefore = spark.read.parquet(s"$idx/lists").count()
    Ann.deleteFromIvfIndex(emb.filter(col("vec_id") % 11 === 5).select(col("vec_id")), idx)
    // pre-compaction: the SQ8 probe path anti-joins the tombstones too
    val pre = Ann.ivfTopKFromIndexSq8(spark, idx, emb.filter(qf), k, nProbe = 16)
      .select(col("query_id"), col("neighbor_id"), col("rk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pre.nonEmpty && pre.forall(_._2 % 11 != 5))
    // compaction is layout-agnostic: SQ8 code rows survive bit-for-bit
    Ann.compactIvfIndex(spark, idx)
    val after = spark.read.parquet(s"$idx/lists")
    assert(after.count() === rowsBefore - emb.filter(col("vec_id") % 11 === 5).count())
    assert(after.filter(col("id") % 11 === 5).count() === 0L)
    val post = Ann.ivfTopKFromIndexSq8(spark, idx, emb.filter(qf), k, nProbe = 16)
      .select(col("query_id"), col("neighbor_id"), col("rk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(post === pre)
  }
}
