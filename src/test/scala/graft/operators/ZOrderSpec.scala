package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: interleave algebra, key normalization, and the
  * end-to-end cluster → manifest → file-skipping read path.
  */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  test("interleave2 magic spreading == generic bit loop, distributed over random lanes") {
    import spark.implicits._
    val lanes = spark.range(4096).select(
      pmod(hash(col("id")), lit(65536)).cast("long").as("a"),
      pmod(hash(col("id") * 31 + 7), lit(65536)).cast("long").as("b"))
    val diff = lanes.select(
      ZOrder.interleave2(col("a"), col("b")).as("m"),
      ZOrder.interleaveN(Seq(col("a"), col("b")), 16).as("g"))
      .filter(col("m") =!= col("g")).count()
    assert(diff === 0L)
    // spot-check the algebra against a hand-computed Morton pair
    val one = lanes.sparkSession.range(1).select(
      ZOrder.interleave2(lit(0b1011L), lit(0b0110L)).as("z")).head().getLong(0)
    // a=1011 -> bits 0,1,3 at even positions; b=0110 -> bits 1,2 at odd
    assert(one === (1L | (1L << 2) | (1L << 6) | (1L << 3) | (1L << 5)))
  }

  test("withZKey: exact integer bucketing; constant and null lanes bucket to 0") {
    import spark.implicits._
    val df = Seq((0L, 10L), (50L, 10L), (100L, 10L)).toDF("x", "c")
      .unionByName(Seq((Option.empty[Long], Option(10L))).toDF("x", "c"))
    val keyed = ZOrder.withZKey(df, Seq("x", "c"), bits = 16)
      .orderBy(col("x").asc_nulls_first).select("zkey").as[Long].collect()
    // c is constant -> lane 0; z = spread(bucket(x)): null->0, 0->0,
    // 50->32767, 100->65535
    def spreadRef(v: Long): Long =
      (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).reduce(_ | _)
    assert(keyed(0) === 0L && keyed(1) === 0L)
    assert(keyed(2) === spreadRef(32767L))
    assert(keyed(3) === spreadRef(65535L))
  }

  test("cluster -> manifest -> prunedRead: box reads few files, row-exact vs direct filter") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val src = spark.range(100000).select(
      col("id"),
      (col("id") % 317).as("x"),
      ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 32, out)

    val (pruned, probe) = ZOrder.prunedRead(spark, out, Seq(("x", 50L, 80L), ("y", 100L, 140L)))
    assert(probe.filesTotal === 32)
    assert(probe.filesSelected < probe.filesTotal,
      s"no skipping: ${probe.filesSelected}/${probe.filesTotal}")
    assert(probe.filesSelected <= 12, s"weak locality: ${probe.filesSelected}/32 files for a ~1.2% box")

    val got = pruned.select("id").as[Long].collect().sorted
    val want = src.filter(col("x").between(50, 80) && col("y").between(100, 140))
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))

    // an out-of-domain box selects zero files and still returns a typed,
    // empty result
    val (none, noneProbe) = ZOrder.prunedRead(spark, out, Seq(("x", 1000L, 2000L)))
    assert(noneProbe.filesSelected === 0 && none.count() === 0L)
  }

  test("prunedReadDistributed: identical file lists to the driver path, probe for probe") {
    val out = java.nio.file.Files.createTempDirectory("graft-zdist").toString
    val src = spark.range(100000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 32, out)
    val probes = Seq(
      Seq(("x", 50L, 80L), ("y", 100L, 140L)), // the house box
      Seq(("x", 0L, 316L)),                    // full domain: no skipping
      Seq(("y", 0L, 0L)),                      // one y value
      Seq(("x", 1000L, 2000L)))                // out of domain: empty selection
    probes.foreach { box =>
      val (dDf, d) = ZOrder.prunedRead(spark, out, box)
      val (sDf, s) = ZOrder.prunedReadDistributed(spark, out, box)
      assert(s.filesSelected === d.filesSelected && s.filesTotal === d.filesTotal, box.toString)
      if (d.filesSelected > 0)
        assert(sDf.inputFiles.sorted.toSeq === dDf.inputFiles.sorted.toSeq, box.toString)
      assert(sDf.count() === dDf.count(), box.toString)
    }
    // the auto selector takes the driver path below the threshold and the
    // distributed path above it — same result either way
    val (aDf, a) = ZOrder.prunedReadAuto(spark, out, probes.head)
    val (bDf, b) = ZOrder.prunedReadAuto(spark, out, probes.head, distributedThreshold = 1)
    assert(a === b && aDf.count() === bDf.count())
  }

  test("quantile lanes: equi-depth CDF buckets; skewed column keeps the skip bound linear loses") {
    import spark.implicits._
    // x = 2^(id mod 20): 12 of 20 values collapse into the bottom sliver
    // of a LINEAR value range (60 % of rows), so the z-key degenerates to
    // a y-sort and an x probe must touch ~every file. Equi-depth buckets
    // spread each value by rank mass instead.
    val src = spark.range(100000).select(
      col("id"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 20 AS INT))").as("x"),
      ((col("id") * 7919) % 331).as("y"))
    val outL = java.nio.file.Files.createTempDirectory("graft-zq-lin").toString
    val outQ = java.nio.file.Files.createTempDirectory("graft-zq-q").toString
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 32, outL)
    ZOrder.clusterQuantile(src, Seq("x", "y"), nFiles = 32, outQ)
    val box = Seq(("x", 32L, 32L))
    val (lDf, l) = ZOrder.prunedRead(spark, outL, box)
    val (qDf, q) = ZOrder.prunedRead(spark, outQ, box)
    val direct = src.filter(col("x") === 32).count()
    assert(lDf.count() === direct && qDf.count() === direct, "skipping must stay row-exact")
    assert(l.filesSelected >= 20,
      s"expected linear lanes to LOSE the bound under skew: ${l.filesSelected}/${l.filesTotal}")
    // a single-value probe through a 2-D curve touches O(sqrt(files))
    // blocks; <= 14 is 2x that plus the +-1-file repartitionByRange
    // sampling jitter the hilbert pin documents, and quantile must beat
    // linear by at least 2x outright
    assert(q.filesSelected <= 14 && q.filesSelected * 2 <= l.filesSelected,
      s"quantile lanes must keep the bound: ${q.filesSelected}/${q.filesTotal} vs linear ${l.filesSelected}")
  }

  test("quantile append: frozen boundaries reproduce cluster-time keys; unseen values clamp") {
    import spark.implicits._
    val src = spark.range(50000).select(
      col("id"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 20 AS INT))").as("x"),
      ((col("id") * 7919) % 331).as("y"))
    val out = java.nio.file.Files.createTempDirectory("graft-zq-app").toString
    ZOrder.clusterQuantile(src, Seq("x", "y"), nFiles = 8, out)
    // re-append the SAME rows through the frozen boundary table: every
    // seen value must reproduce its cluster-time bucket, hence every id
    // must carry exactly one distinct zkey across its two copies
    ZOrder.appendQuantile(src, Seq("x", "y"), out, nFiles = 2)
    val byId = spark.read.parquet(out).groupBy("id")
      .agg(count(lit(1)).as("n"), countDistinct(col("zkey")).as("nk"))
    assert(byId.filter(col("n") =!= 2).count() === 0L, "each row appended exactly once")
    assert(byId.filter(col("nk") =!= 1).count() === 0L,
      "frozen-boundary key diverged from the cluster-time key for a seen value")
    // skipping stays row-exact over the appended layout
    val (df2, p2) = ZOrder.prunedRead(spark, out, Seq(("x", 32L, 32L)))
    assert(df2.count() === 2 * src.filter(col("x") === 32).count())
    assert(p2.filesTotal === 10)
    // unseen out-of-range values clamp to the edge bucket and stay findable
    val far = spark.range(100).select(
      (col("id") + 900000).as("id"), lit(1L << 25).as("x"), (col("id") % 331).as("y"))
    ZOrder.appendQuantile(far, Seq("x", "y"), out, nFiles = 1)
    val (df3, _) = ZOrder.prunedRead(spark, out, Seq(("x", 1L << 25, 1L << 25)))
    assert(df3.count() === 100L)
  }

  test("hilbertKey2 IS a Hilbert curve: bijective and unit-step adjacent on the full grid") {
    import spark.implicits._
    // bits=4: the whole 16x16 grid, every consecutive pair of curve
    // positions must be grid-adjacent (|dx|+|dy| == 1) — the defining
    // locality property, orientation-agnostic
    val cells = spark.range(256).select(
      (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
      .select(col("x"), col("y"), ZOrder.hilbertKey2(col("x"), col("y"), bits = 4).as("d"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1)))).sortBy(_._1)
    assert(cells.map(_._1).toSeq === (0L until 256L).toSeq, "bijective onto 0..255")
    val nonAdjacent = cells.sliding(2).count { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(nonAdjacent === 0, "every curve step moves to a grid neighbor")
  }

  test("withHilbert3Key IS a 3-D Hilbert curve: bijective, unit-step adjacent, == Skilling reference") {
    // independent pure-Scala Skilling AxesToTranspose reference
    def ref(x: Long, y: Long, z: Long, bits: Int): Long = {
      val X = Array(x, y, z)
      var q = 1L << (bits - 1)
      while (q > 1) { // inverse undo
        val p = q - 1
        var i = 0
        while (i < 3) {
          if ((X(i) & q) != 0) X(0) ^= p
          else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
          i += 1
        }
        q >>= 1
      }
      X(1) ^= X(0); X(2) ^= X(1) // Gray encode
      var t = 0L
      q = 1L << (bits - 1)
      while (q > 1) { if ((X(2) & q) != 0) t ^= q - 1; q >>= 1 }
      X(0) ^= t; X(1) ^= t; X(2) ^= t
      (0 until bits).flatMap(qb => (0 until 3).map(i =>
        ((X(i) >> qb) & 1L) << (qb * 3 + (2 - i)))).reduce(_ | _)
    }
    // bits=3: the whole 8x8x8 grid — bijective onto 0..511 and every
    // consecutive pair of curve positions grid-adjacent (|dx|+|dy|+|dz|
    // == 1), the defining Hilbert locality property in 3-D
    val n = 8
    val cells = spark.range(n.toLong * n * n).select(
      (col("id") % n).as("x"),
      ((col("id") / n) % n).cast("long").as("y"),
      (col("id") / (n * n)).cast("long").as("z"))
    val got = ZOrder.withHilbert3Key(
        cells, Seq(col("x"), col("y"), col("z")), bits = 3, "d")
      .collect().map(r => (r.getLong(3), (r.getLong(0), r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L until 512L).toSeq, "bijective onto 0..511")
    val nonAdjacent = got.sliding(2).count {
      case Array((_, (x1, y1, z1)), (_, (x2, y2, z2))) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) != 1
    }
    assert(nonAdjacent === 0, "every curve step moves to a 3-D grid neighbor")
    got.foreach { case (d, (x, y, z)) => assert(d === ref(x, y, z, 3)) }
    // bits=8 over random lanes: staged algebra == the reference
    val rnd = new scala.util.Random(99)
    val probes = Seq.fill(512)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong))
    import spark.implicits._
    val big = probes.toDF("x", "y", "z")
    val gotBig = ZOrder.withHilbert3Key(big, Seq(col("x"), col("y"), col("z")), bits = 8, "d")
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    probes.foreach { case (x, y, z) =>
      assert(gotBig((x, y, z)) === ref(x, y, z, 8), s"($x,$y,$z)")
    }
    // the codegen'd kernel (what the layout path executes) is pinned
    // equal to the staged algebra and the reference on the same probes
    graft.functions.GraftFunctions.register(spark)
    val kernelBig = big.select(col("x"), col("y"), col("z"),
        graft.functions.GraftFunctions.hilbertKey3(col("x"), col("y"), col("z"), 8).as("d"))
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(kernelBig === gotBig, "graft_hilbert_key3 kernel != staged Skilling algebra")
  }

  test("quantile lanes x hilbert3: composed key == independent CDF-bucket + kernel computation") {
    import spark.implicits._
    // the q30 composition end to end on a small skewed corpus: equi-depth
    // CDF bucketing of three lanes feeding the 3-D Hilbert kernel. The
    // expected keys are computed INDEPENDENTLY: exact integer CDF over
    // the collected per-value histograms + the pure-Scala kernel function
    // (itself pinned to the staged algebra and the Skilling reference in
    // the tests above) — so this pins the bucket-map joins and lane
    // plumbing, the part the composition adds.
    val rows = (0 until 5000).map { i =>
      (i.toLong, 1L << (i % 20), (i.toLong * 7919) % 103, (i.toLong * 104729) % 97)
    }
    val df = rows.toDF("id", "x", "y", "w")
    val got = ZOrder.withZKeyQuantile(df, Seq("x", "y", "w"), bits = 8,
        keyCol = "k", curve = "hilbert")
      .select("id", "k").as[(Long, Long)].collect().toMap
    def cdfBuckets(vs: Seq[Long]): Map[Long, Long] = {
      val n = vs.size.toLong
      val hist = vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      var before = 0L
      hist.map { case (v, c) =>
        val b = before * 256L / n
        before += c
        v -> b
      }.toMap
    }
    val bx = cdfBuckets(rows.map(_._2))
    val by = cdfBuckets(rows.map(_._3))
    val bw = cdfBuckets(rows.map(_._4))
    rows.foreach { case (id, x, y, w) =>
      val want = graft.functions.HilbertKey3Expr.d(bx(x), by(y), bw(w), 8)
      assert(got(id) === want, s"id=$id ($x,$y,$w) buckets=(${bx(x)},${by(y)},${bw(w)})")
    }
  }

  test("streaming ingest: foreachBatch appendQuantile keeps skipping row-exact batch over batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // continuous ingestion into a clustered layout — the Delta/Iceberg
    // "stream into an OPTIMIZE'd table" shape: boundaries are trained
    // ONCE at bootstrap (frozen `_zqbounds`), every micro-batch lands
    // through them via foreachBatch, and the skipping contract must
    // hold row-exact at EVERY point between batches (manifest
    // intersection is a superset guarantee; appended files merely widen
    // envelopes until compaction).
    val out = java.nio.file.Files.createTempDirectory("graft-zstream").toString
    def shaped(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 20 AS INT))").as("x"),
      ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(spark.range(20000).toDF("id")), Seq("x", "y"),
      nFiles = 8, out)
    val input = MemoryStream[Long]
    val query = input.toDF().withColumnRenamed("value", "id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        ZOrder.appendQuantile(shaped(batch), Seq("x", "y"), out, nFiles = 1)
        ()
      }
      .start()
    try {
      def probeExact(upTo: Long): Unit = {
        val (df, p) = ZOrder.prunedRead(spark, out, Seq(("x", 32L, 32L)))
        // x == 32 <=> id % 20 == 5
        val want = (0L until upTo).count(_ % 20 == 5).toLong
        assert(df.count() === want, s"mid-stream skipping lost rows at upTo=$upTo")
        assert(p.filesSelected < p.filesTotal, "no skipping mid-stream")
      }
      input.addData(20000L until 25000L: _*)
      query.processAllAvailable()
      probeExact(25000L)
      input.addData(25000L until 30000L: _*)
      query.processAllAvailable()
      probeExact(30000L)
      // every id landed exactly once, with exactly one key (frozen
      // boundaries: batch-time buckets == cluster-time buckets)
      val byId = spark.read.parquet(out).groupBy("id")
        .agg(count(lit(1)).as("n"), countDistinct(col("zkey")).as("nk"))
      assert(byId.filter(col("n") =!= 1 || col("nk") =!= 1).count() === 0L)
    } finally query.stop()
  }

  test("appendQuantileOnce: exactly-once across foreachBatch replays, both crash windows") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zonce").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 20 AS INT))").as("x"),
      ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    ZOrder.writeBloomSidecar(spark, out, Seq("id"))
    def assertExact(upTo: Long): Unit = {
      // global exactly-once: every id exactly once, one key each
      val byId = spark.read.parquet(out).groupBy("id")
        .agg(count(lit(1)).as("n"), countDistinct(col("zkey")).as("nk"))
      assert(byId.filter(col("n") =!= 1 || col("nk") =!= 1).count() === 0L)
      assert(spark.read.parquet(out).count() === upTo)
      // skipping stays row-exact (manifest superset rule over the batch files)
      val (df, p) = ZOrder.prunedRead(spark, out, Seq(("x", 32L, 32L)))
      assert(df.count() === (0L until upTo).count(_ % 20 == 5).toLong)
      assert(p.filesSelected < p.filesTotal)
      // the manifest carries no duplicate (file, column) rows
      val dupManifest = spark.read.parquet(s"$out/_zmanifest")
        .groupBy("file", "column").count().filter(col("count") > 1).count()
      assert(dupManifest === 0L)
    }
    // window 1 — the common replay: marker exists, second call no-ops
    assert(ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0) > 0)
    assert(ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0) === 0)
    assertExact(25000)
    // window 2 — crash between publish and marker: delete the marker to
    // simulate it, replay must purge the batch's files + sidecar rows
    // and republish, never duplicate
    assert(ZOrder.appendQuantileOnce(shaped(25000, 30000), Seq("x", "y"), out, batchId = 1) > 0)
    graft.io.Fio.delete(s"$out/_zbatches/1")(graft.io.FioConf.of(spark))
    assert(ZOrder.appendQuantileOnce(shaped(25000, 30000), Seq("x", "y"), out, batchId = 1) > 0)
    assertExact(30000)
    // the bloom coverage rule still holds after the purge path touched
    // the sidecar: a key only in batch files (uncovered) is always kept
    val (hit, _) = ZOrder.prunedReadPoint(spark, out, "id", Seq(29999L, 7L))
    assert(hit.select("id").as[Long].collect().sorted.toSeq === Seq(7L, 29999L))
  }

  test("appendOnce: the linear-lane twin is exactly-once across replays too") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zlinonce").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    assert(ZOrder.appendOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0) > 0)
    assert(ZOrder.appendOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0) === 0)
    graft.io.Fio.delete(s"$out/_zbatches/0")(graft.io.FioConf.of(spark))
    assert(ZOrder.appendOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0) > 0)
    val byId = spark.read.parquet(out).groupBy("id")
      .agg(count(lit(1)).as("n"), countDistinct(col("zkey")).as("nk"))
    assert(byId.filter(col("n") =!= 1 || col("nk") =!= 1).count() === 0L)
    assert(spark.read.parquet(out).count() === 25000L)
    val (df, p) = ZOrder.prunedRead(spark, out, Seq(("x", 50L, 80L)))
    assert(df.count() ===
      (0L until 25000L).count(i => { val x = i % 317; x >= 50 && x <= 80 }).toLong)
    assert(p.filesSelected < p.filesTotal)
  }

  test("appendQuantileOnce: stream RESTART from checkpoint lands every batch exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the full production shape: a checkpointed foreachBatch query is
    // STOPPED and a new query takes over from the checkpoint — batchIds
    // continue, any uncommitted batch replays, and the exactly-once sink
    // must land every row once regardless of where the handover fell
    val out = java.nio.file.Files.createTempDirectory("graft-zrestart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-zrestart-ckpt").toString
    def shaped(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 20 AS INT))").as("x"),
      ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(spark.range(20000).toDF("id")), Seq("x", "y"),
      nFiles = 8, out)
    val input = MemoryStream[Long]
    def start() = input.toDF().withColumnRenamed("value", "id")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        ZOrder.appendQuantileOnce(shaped(batch), Seq("x", "y"), out,
          batchId = batchId, nFiles = 1)
        ()
      }
      .start()
    val q1 = start()
    try {
      input.addData(20000L until 25000L: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      input.addData(25000L until 30000L: _*)
      q2.processAllAvailable()
      val byId = spark.read.parquet(out).groupBy("id")
        .agg(count(lit(1)).as("n"), countDistinct(col("zkey")).as("nk"))
      assert(byId.filter(col("n") =!= 1 || col("nk") =!= 1).count() === 0L,
        "restart duplicated or dropped rows")
      assert(spark.read.parquet(out).count() === 30000L)
      val (df, p) = ZOrder.prunedRead(spark, out, Seq(("x", 32L, 32L)))
      assert(df.count() === (0L until 30000L).count(_ % 20 == 5).toLong)
      assert(p.filesSelected < p.filesTotal)
    } finally q2.stop()
  }

  test("deleteWhere: tombstones subtract exactly the matched rows; re-delete is idempotent") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zdel").toString
    val src = spark.range(30000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(src, Seq("x", "y"), nFiles = 8, out)
    val n1 = ZOrder.deleteWhere(spark, out, col("id") % 7 === 3)
    assert(n1 === (0L until 30000L).count(_ % 7 == 3).toLong)
    val got = ZOrder.readWithDeletes(spark, out).select("id").as[Long].collect().sorted
    val want = (0L until 30000L).filter(_ % 7 != 3)
    assert(got.toSeq === want)
    // overlapping re-delete: duplicate tombstones, read unchanged
    val n2 = ZOrder.deleteWhere(spark, out, col("id") % 14 === 3)
    assert(n2 > 0) // positions re-tombstoned (the rows are already dead)
    assert(ZOrder.readWithDeletes(spark, out).count() === want.size.toLong)
    // a second predicate layers on top
    ZOrder.deleteWhere(spark, out, col("id") < 100)
    val want2 = want.filter(_ >= 100)
    assert(ZOrder.readWithDeletes(spark, out)
      .select("id").as[Long].collect().sorted.toSeq === want2)
    // data files untouched: deletes never rewrite
    assert(spark.read.parquet(out).count() === 30000L)
  }

  test("deletes compose with pruning: every pruned read face subtracts tombstones row-exactly") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zdelprune").toString
    val src = spark.range(30000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 16, out)
    ZOrder.writeBloomSidecar(spark, out, Seq("id"))
    ZOrder.deleteWhere(spark, out, col("id") % 3 === 0)
    val survivors = (0L until 30000L).filterNot(_ % 3 == 0)
    // box pruning still skips files and returns exactly the live rows
    val (boxDf, p) = ZOrder.prunedRead(spark, out, Seq(("x", 50L, 80L)))
    assert(p.filesSelected < p.filesTotal)
    assert(boxDf.select("id").as[Long].collect().sorted.toSeq ===
      survivors.filter(i => { val x = i % 317; x >= 50 && x <= 80 }))
    // bloom point pruning: a dead key returns nothing, a live one itself
    val (pt, _) = ZOrder.prunedReadPoint(spark, out, "id", Seq(9L, 10L))
    assert(pt.select("id").as[Long].collect().toSeq === Seq(10L))
  }

  test("compactQuantile applies tombstones physically: dest holds survivors only, no sidecar") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zdelcomp").toString
    val dest = java.nio.file.Files.createTempDirectory("graft-zdelcomp-out").toString
    val src = spark.range(30000).select(
      col("id"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 20 AS INT))").as("x"),
      ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(src, Seq("x", "y"), nFiles = 8, out)
    ZOrder.deleteWhere(spark, out, col("id") % 5 === 2)
    ZOrder.compactQuantile(spark, out, dest, Seq("x", "y"), nFiles = 8)
    val survivors = (0L until 30000L).filterNot(_ % 5 == 2)
    assert(spark.read.parquet(dest).select("id").as[Long].collect().sorted.toSeq === survivors)
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    assert(!graft.io.Fio.exists(s"$dest/_zdeletes"))
    // retrained CDF == a fresh clustering of the survivor set: same keys
    val fresh = java.nio.file.Files.createTempDirectory("graft-zdelcomp-fresh").toString
    ZOrder.clusterQuantile(src.filter(col("id") % 5 =!= 2), Seq("x", "y"), nFiles = 8, fresh)
    val a = spark.read.parquet(dest).select("id", "zkey").as[(Long, Long)].collect().sorted
    val b = spark.read.parquet(fresh).select("id", "zkey").as[(Long, Long)].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("exactly-once replay purges tombstones of replaced files (stale positions never survive)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zdelonce").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    assert(ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0) > 0)
    // tombstone rows that live in batch-0 files AND one seed row
    ZOrder.deleteWhere(spark, out, col("id") === 22222L || col("id") === 5L)
    assert(ZOrder.readWithDeletes(spark, out).count() === 24998L)
    // publish-then-crash window: marker gone, replay rewrites the files.
    // row_index positions against the old files are meaningless now —
    // the replay must purge them; the batch they targeted never
    // committed, so its deletes die with it. The SEED tombstone stays.
    graft.io.Fio.delete(s"$out/_zbatches/0")(graft.io.FioConf.of(spark))
    assert(ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0) > 0)
    val ids = ZOrder.readWithDeletes(spark, out).select("id").as[Long].collect().sorted
    assert(ids.length === 24999)
    assert(!ids.contains(5L) && ids.contains(22222L))
  }

  test("mergeInto: upsert is replay-idempotent across both crash windows, old versions die") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zmerge").toString
    val src = spark.range(20000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(src, Seq("x", "y"), nFiles = 8, out)
    val updates = src.filter(col("id") % 10 === 0)
      .withColumn("y", col("y") + 1000)
      .select(col("id"), col("x"), col("y"))
    def assertMerged(): Unit = {
      val live = ZOrder.readWithDeletes(spark, out)
      assert(live.count() === 20000L)
      // every id exactly once; updated rows carry the new y
      assert(live.groupBy("id").count().filter(col("count") =!= 1).count() === 0L)
      val got = live.filter(col("id") % 10 === 0).select(col("id"), col("y"))
        .as[(Long, Long)].collect().sorted
      val want = (0L until 20000L by 10).map(i => (i, (i * 7919) % 331 + 1000L))
      assert(got.toSeq === want)
      // old versions are tombstoned, not rewritten: the raw dir still
      // holds both generations
      assert(spark.read.parquet(out).count() === 22000L)
    }
    val (tombs, files) = ZOrder.mergeInto(spark, out, updates,
      keys = Seq("id"), cols = Seq("x", "y"), batchId = 0L)
    assert(tombs === 2000L && files > 0)
    assertMerged()
    // window 1 — full replay: append short-circuits on the marker, the
    // tombstone pass re-runs (duplicates are read-idempotent)
    val (_, files2) = ZOrder.mergeInto(spark, out, updates,
      keys = Seq("id"), cols = Seq("x", "y"), batchId = 0L)
    assert(files2 === 0)
    assertMerged()
    // window 2 — crash between publish and marker: replay purges and
    // republishes the batch files; tombstones on OLD files survive the
    // purge (those files are immutable), the state converges again
    graft.io.Fio.delete(s"$out/_zbatches/0")(graft.io.FioConf.of(spark))
    val (_, files3) = ZOrder.mergeInto(spark, out, updates,
      keys = Seq("id"), cols = Seq("x", "y"), batchId = 0L)
    assert(files3 > 0)
    assertMerged()
    // a second merge batch layers on top (update the same keys again)
    val updates2 = updates.withColumn("y", col("y") + 1000)
    ZOrder.mergeInto(spark, out, updates2,
      keys = Seq("id"), cols = Seq("x", "y"), batchId = 1L)
    val y2 = ZOrder.readWithDeletes(spark, out).filter(col("id") === 40)
      .select("y").as[Long].collect().toSeq
    assert(y2 === Seq((40L * 7919) % 331 + 2000L))
    assert(ZOrder.readWithDeletes(spark, out).count() === 20000L)
  }

  test("readAsOfBatch/readCommitted/vacuum: snapshots are exact, crashed publishes invisible") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zasof").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    ZOrder.appendQuantileOnce(shaped(20000, 23000), Seq("x", "y"), out, batchId = 0)
    ZOrder.appendQuantileOnce(shaped(23000, 26000), Seq("x", "y"), out, batchId = 1)
    ZOrder.appendQuantileOnce(shaped(26000, 30000), Seq("x", "y"), out, batchId = 2)
    // crashed publish: files + manifest rows landed, marker never did
    ZOrder.appendQuantileOnce(shaped(30000, 31000), Seq("x", "y"), out, batchId = 3)
    graft.io.Fio.delete(s"$out/_zbatches/3")(graft.io.FioConf.of(spark))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().sorted.toSeq
    assert(ids(ZOrder.readAsOfBatch(spark, out, -1L)) === (0L until 20000L))
    assert(ids(ZOrder.readAsOfBatch(spark, out, 0L)) === (0L until 23000L))
    assert(ids(ZOrder.readAsOfBatch(spark, out, 1L)) === (0L until 26000L))
    // the crashed batch is invisible to every committed view...
    assert(ids(ZOrder.readAsOfBatch(spark, out, 3L)) === (0L until 30000L))
    assert(ids(ZOrder.readCommitted(spark, out)) === (0L until 30000L))
    // ...but a naive dir scan DOES see it — the window vacuum closes
    assert(spark.read.parquet(out).count() === 31000L)
    val removed = ZOrder.vacuum(spark, out)
    assert(removed.nonEmpty)
    assert(ids(spark.read.parquet(out)) === (0L until 30000L))
    // committed reads byte-identical across the vacuum; sidecars consistent
    assert(ids(ZOrder.readCommitted(spark, out)) === (0L until 30000L))
    val manifestFiles = spark.read.parquet(s"$out/_zmanifest")
      .select("file").distinct().as[String].collect().toSet
    assert(manifestFiles.forall(n => !n.startsWith("zb3-")))
    // vacuum is idempotent
    assert(ZOrder.vacuum(spark, out).isEmpty)
    // skipping still row-exact on the committed layout
    val (df, p) = ZOrder.prunedRead(spark, out, Seq(("x", 50L, 80L)))
    assert(df.count() ===
      (0L until 30000L).count(i => { val x = i % 317; x >= 50 && x <= 80 }).toLong)
    assert(p.filesSelected < p.filesTotal)
  }

  test("versioned tombstones: delete-aware snapshots see exactly their lineage; merges are version-atomic") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zasofdel").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0)
    ZOrder.deleteWhere(spark, out, col("id") % 9 === 4) // stamped version 0
    ZOrder.appendQuantileOnce(shaped(25000, 30000), Seq("x", "y"), out, batchId = 1)
    ZOrder.deleteWhere(spark, out, col("id") % 9 === 7) // stamped version 1
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().sorted.toSeq
    // pre-delete snapshots unchanged by default
    assert(ids(ZOrder.readAsOfBatch(spark, out, 0L)) === (0L until 25000L))
    // version 0 lineage: batch-0 files minus ONLY the version-0 deletes
    assert(ids(ZOrder.readAsOfBatch(spark, out, 0L, applyDeletes = true)) ===
      (0L until 25000L).filterNot(_ % 9 == 4))
    // version 1 lineage: both delete generations apply — each to the
    // rows that EXISTED when it was issued (the version-0 delete never
    // saw batch 1, so batch-1 rows with id % 9 == 4 survive)
    assert(ids(ZOrder.readAsOfBatch(spark, out, 1L, applyDeletes = true)) ===
      (0L until 30000L).filterNot(i => (i % 9 == 4 && i < 25000) || i % 9 == 7))
    assert(ids(ZOrder.readCommitted(spark, out, applyDeletes = true)) ===
      ids(ZOrder.readWithDeletes(spark, out)))
    // a MERGE is atomic in version space: its tombstones carry the
    // merge's own batch id, so as-of the merge the update is complete
    // and one version earlier it never happened
    val updates = shaped(0, 20000).filter(col("id") % 50 === 0)
      .withColumn("y", col("y") + 5000).select(col("id"), col("x"), col("y"))
    ZOrder.mergeInto(spark, out, updates, keys = Seq("id"), cols = Seq("x", "y"),
      batchId = 2L)
    val pre = ZOrder.readAsOfBatch(spark, out, 1L, applyDeletes = true)
    val post = ZOrder.readAsOfBatch(spark, out, 2L, applyDeletes = true)
    // scope to the UPDATED keys (id < 20000): later-batch rows that
    // happen to share the id % 50 residue were never merge targets
    assert(pre.filter(col("id") % 50 === 0 && col("id") < 20000
      && col("y") >= 5000).count() === 0L)
    assert(post.filter(col("id") % 50 === 0 && col("id") < 20000
      && col("y") < 5000).count() === 0L)
    assert(post.groupBy("id").count().filter(col("count") =!= 1).count() === 0L)
  }

  test("analyzeLayout: live-table stats with exact rows/nulls and bounded-error NDV") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zstats").toString
    val src = spark.range(30000).select(
      col("id"),
      (col("id") % 317).as("x"),
      // a genuinely nullable column: every 4th row null
      when(col("id") % 4 === 0, lit(null).cast("long"))
        .otherwise((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(src, Seq("x"), nFiles = 8, out)
    ZOrder.deleteWhere(spark, out, col("id") % 3 === 0)
    val stats = ZOrder.analyzeLayout(spark, out, Seq("id", "x", "y"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val liveIds = (0L until 30000L).filterNot(_ % 3 == 0)
    val rows = liveIds.size.toLong
    assert(stats("id")._1 === rows && stats("x")._1 === rows && stats("y")._1 === rows)
    assert(stats("id")._2 === 0L && stats("x")._2 === 0L)
    assert(stats("y")._2 === liveIds.count(_ % 4 == 0).toLong)
    def within(est: Long, exact: Long) = math.abs(est - exact) <= exact * 0.05
    assert(within(stats("id")._3, rows))
    assert(within(stats("x")._3, 317L))
    assert(within(stats("y")._3, liveIds.filterNot(_ % 4 == 0).map(i => (i * 7919) % 331).distinct.size.toLong))
    // the sidecar persisted and a re-analyze overwrites it cleanly
    assert(spark.read.parquet(s"$out/_zstats").count() === 3L)
    ZOrder.analyzeLayout(spark, out, Seq("id"))
    assert(spark.read.parquet(s"$out/_zstats").count() === 1L)
  }

  test("publishBatchOnce: replaying one writer's batch never touches another batch's files") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-ztwow").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    // two writers' batches land (distinct ids — the multi-writer shape)
    ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 10)
    ZOrder.appendQuantileOnce(shaped(25000, 30000), Seq("x", "y"), out, batchId = 11)
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val b10Before = graft.io.Fio.listNames(out).filter(_.startsWith("zb10-")).sorted
    // the LATEST writer crashed post-publish: its replay purges ONLY zb11-*
    graft.io.Fio.delete(s"$out/_zbatches/11")
    ZOrder.appendQuantileOnce(shaped(25000, 30000), Seq("x", "y"), out, batchId = 11)
    assert(graft.io.Fio.listNames(out).filter(_.startsWith("zb10-")).sorted === b10Before)
    // an OLDER batch's replay after later commits is REFUSED by the
    // monotonic guard — it would purge later merges' tombstones against
    // its files and never re-issue them (the foreachBatch contract,
    // enforced instead of assumed)
    graft.io.Fio.delete(s"$out/_zbatches/10")
    val refused = intercept[IllegalArgumentException] {
      ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 10)
    }
    assert(refused.getMessage.contains("not newer than the max committed batch 11"))
    // restore the marker the simulation removed so the committed view
    // below sees all 30000 rows again
    graft.io.Fio.writeString(s"$out/_zbatches/10",
      graft.io.Fio.listNames(out).filter(_.startsWith("zb10-")).sorted.mkString("\n"))
    val byId = spark.read.parquet(out).groupBy("id")
      .agg(count(lit(1)).as("n"), countDistinct(col("zkey")).as("nk"))
    assert(byId.filter(col("n") =!= 1 || col("nk") =!= 1).count() === 0L)
    assert(spark.read.parquet(out).count() === 30000L)
    val dupManifest = spark.read.parquet(s"$out/_zmanifest")
      .groupBy("file", "column").count().filter(col("count") > 1).count()
    assert(dupManifest === 0L)
  }

  test("prunedReadCommitted: a crashed publish is invisible to committed pruned reads") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zprcommit").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0)
    // crashed publish: files + manifest rows landed, marker never did
    ZOrder.appendQuantileOnce(shaped(25000, 30000), Seq("x", "y"), out, batchId = 1)
    graft.io.Fio.delete(s"$out/_zbatches/1")(graft.io.FioConf.of(spark))
    val box = Seq(("x", 50L, 80L))
    def want(n: Long) = (0L until n).count(i => { val x = i % 317; x >= 50 && x <= 80 }).toLong
    // the plain pruned read sees the phantom rows (the window vacuum or
    // replay closes); the committed read never does
    val (dirty, _) = ZOrder.prunedRead(spark, out, box)
    assert(dirty.count() === want(30000))
    val (clean, p) = ZOrder.prunedReadCommitted(spark, out, box)
    assert(clean.count() === want(25000))
    assert(p.filesSelected < p.filesTotal)
    // after vacuum the two views coincide again
    ZOrder.vacuum(spark, out)
    val (afterDirty, _) = ZOrder.prunedRead(spark, out, box)
    val (afterClean, _) = ZOrder.prunedReadCommitted(spark, out, box)
    assert(afterDirty.count() === want(25000))
    assert(afterClean.count() === want(25000))
    // committed pruning composes with tombstones like every other face
    ZOrder.deleteWhere(spark, out, col("id") % 3 === 0)
    val (deleted, _) = ZOrder.prunedReadCommitted(spark, out, box)
    assert(deleted.count() ===
      (0L until 25000L).count(i => { val x = i % 317; x >= 50 && x <= 80 && i % 3 != 0 }).toLong)
  }

  test("bloom sidecar: point skipping on an unclustered key, row-exact, no false negatives") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zbloom").toString
    val src = spark.range(100000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 32, out)
    ZOrder.writeBloomSidecar(spark, out, Seq("id"))
    // present keys: every matching row comes back (false negatives are
    // impossible), few files touched
    val keys = Seq(0L, 31337L, 99999L)
    val (hit, p) = ZOrder.prunedReadPoint(spark, out, "id", keys)
    val got = hit.select("id").as[Long].collect().sorted
    assert(got.toSeq === keys.sorted, "bloom skipping dropped a present key")
    assert(p.filesSelected < p.filesTotal && p.filesSelected <= 6,
      s"no bloom win: ${p.filesSelected}/${p.filesTotal}")
    // the envelope path cannot prune this predicate at all — the
    // manifest has no id stats, so every file survives
    val (_, env) = ZOrder.prunedRead(spark, out, Seq(("id", 31337L, 31337L)))
    assert(env.filesSelected === env.filesTotal)
    // absent keys: zero rows regardless of bloom false positives (the
    // residual IN is the row-exact layer)
    val (miss, mp) = ZOrder.prunedReadPoint(spark, out, "id", Seq(400000L, 500000L))
    assert(miss.count() === 0L)
    assert(mp.filesSelected <= 2, s"absent keys selected ${mp.filesSelected} files (fpp blowout)")
    // COVERAGE rule: a file appended AFTER the sidecar was built has no
    // bloom row — it must always be KEPT (bloom-pruning it would be a
    // false negative), so a key living only there still comes back
    ZOrder.append(
      spark.range(1).select(lit(700000L).as("id"), lit(100L).as("x"), lit(100L).as("y")),
      Seq("x", "y"), out, nFiles = 1)
    val (late, lp) = ZOrder.prunedReadPoint(spark, out, "id", Seq(700000L))
    assert(late.count() === 1L, "un-bloomed appended file was wrongly pruned")
    assert(lp.filesTotal === 33 && lp.filesSelected >= 1)
    // the INCREMENTAL update builds blooms for exactly the uncovered
    // file and restores pruning without re-hashing the layout
    assert(ZOrder.updateBloomSidecar(spark, out, Seq("id")) === 1)
    val (late2, lp2) = ZOrder.prunedReadPoint(spark, out, "id", Seq(700000L))
    assert(late2.count() === 1L)
    assert(lp2.filesSelected <= 2, s"updated sidecar still keeps ${lp2.filesSelected} files")
    // a present pre-append key still prunes through the merged sidecar
    val (again, ap) = ZOrder.prunedReadPoint(spark, out, "id", Seq(31337L))
    assert(again.count() === 1L && ap.filesSelected <= 6)
    // idempotent: nothing left to cover
    assert(ZOrder.updateBloomSidecar(spark, out, Seq("id")) === 0)
  }

  test("bloom sidecar on a STRING key: url-style lookups prune and stay row-exact") {
    import spark.implicits._
    // the common dedup shape: the lookup key is a string (URL, content
    // fingerprint), not an integral — build hashes the RAW column, the
    // probe casts each literal to the column's type and hashes with the
    // same engine expression, so parity holds for any hashable type
    val out = java.nio.file.Files.createTempDirectory("graft-zbloom-str").toString
    val src = spark.range(50000).select(
      concat(lit("https://host-"), (col("id") % 97).cast("string"),
        lit("/doc/"), col("id").cast("string")).as("url"),
      (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 16, out)
    ZOrder.writeBloomSidecar(spark, out, Seq("url"))
    val keys = Seq("https://host-5/doc/2042", "https://host-13/doc/401")
    val (hit, p) = ZOrder.prunedReadPoint(spark, out, "url", keys)
    assert(hit.select("url").as[String].collect().sorted.toSeq === keys.sorted)
    assert(p.filesSelected < p.filesTotal && p.filesSelected <= 4,
      s"no bloom win on strings: ${p.filesSelected}/${p.filesTotal}")
    val (miss, _) = ZOrder.prunedReadPoint(spark, out, "url", Seq("https://host-1/doc/999999"))
    assert(miss.count() === 0L)
  }

  test("combined box+point pruning: intersection of both indexes, row-exact, tighter than either") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zboxpt").toString
    val src = spark.range(100000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 32, out)
    ZOrder.writeBloomSidecar(spark, out, Seq("id"))
    // "rows for these keys inside this box": id 16050 has x=16050%317=200
    // (in box), y=(16050*7919)%331 — include a second key outside the box
    // to prove the residual filters it even when its file survives
    val box = Seq(("x", 150L, 250L))
    val keys = Seq(16050L, 16051L, 3L)
    val (df, p) = ZOrder.prunedReadBoxPoint(spark, out, box, "id", keys)
    val direct = src.filter(col("x").between(150, 250) && col("id").isin(keys: _*))
    val got = df.select("id").as[Long].collect().sorted.toSeq
    val want = direct.select("id").as[Long].collect().sorted.toSeq
    assert(got === want, "combined pruning diverged from the direct filter")
    // the intersection must be at least as tight as each index alone
    val (_, boxOnly) = ZOrder.prunedRead(spark, out, box)
    val (_, ptOnly) = ZOrder.prunedReadPoint(spark, out, "id", keys)
    assert(p.filesSelected <= math.min(boxOnly.filesSelected, ptOnly.filesSelected))
    assert(p.filesSelected < p.filesTotal)
  }

  test("prunedReadPointDistributed: identical file lists to the driver path, probe for probe") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zptdist").toString
    val src = spark.range(100000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 32, out)
    ZOrder.writeBloomSidecar(spark, out, Seq("id"))
    // a file appended AFTER the sidecar was built: uncovered — BOTH
    // paths' coverage rule must keep it unconditionally
    ZOrder.append(spark.range(100000, 101000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y")),
      Seq("x", "y"), out, nFiles = 1)
    val probes = Seq(
      Seq(0L, 31337L, 99999L), // present, covered files
      Seq(100500L),            // present only in the uncovered appended file
      Seq(400000L, 500000L))   // absent everywhere
    probes.foreach { keys =>
      val (dDf, d) = ZOrder.prunedReadPoint(spark, out, "id", keys)
      val (sDf, s) = ZOrder.prunedReadPointDistributed(spark, out, "id", keys)
      assert(s.filesSelected === d.filesSelected && s.filesTotal === d.filesTotal, keys.toString)
      if (d.filesSelected > 0)
        assert(sDf.inputFiles.sorted.toSeq === dDf.inputFiles.sorted.toSeq, keys.toString)
      assert(sDf.select("id").as[Long].collect().sorted.toSeq ===
        dDf.select("id").as[Long].collect().sorted.toSeq, keys.toString)
    }
    // auto selector: driver path below the threshold, distributed above —
    // same probe either way
    val (aDf, a) = ZOrder.prunedReadPointAuto(spark, out, "id", probes.head)
    val (bDf, b) = ZOrder.prunedReadPointAuto(spark, out, "id", probes.head,
      distributedThreshold = 1)
    assert(a === b && aDf.count() === bDf.count())
  }

  test("prunedReadBoxPoint: a data file with no manifest rows is never silently dropped") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zorphan").toString
    val src = spark.range(100000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 16, out)
    ZOrder.writeBloomSidecar(spark, out, Seq("id"))
    // an ORPHAN file written outside cluster/append: zero manifest rows,
    // zero sidecar rows — envelope-unprunable AND bloom-uncovered, so
    // the superset guarantee must keep it in every combined probe
    spark.range(200000, 200010).select(
      col("id"), lit(200L).as("x"), lit(120L).as("y"))
      .coalesce(1).write.mode("append").parquet(out)
    val box = Seq(("x", 150L, 250L))
    val keys = Seq(200005L, 16050L)
    val (df, p) = ZOrder.prunedReadBoxPoint(spark, out, box, "id", keys)
    val got = df.select("id").as[Long].collect().sorted.toSeq
    assert(got === Seq(16050L, 200005L),
      s"orphan-file row lost by combined pruning: $got")
    // the probe's universe is the listing, orphan included
    assert(p.filesTotal === 17, s"filesTotal=${p.filesTotal}")
    assert(p.filesSelected < p.filesTotal)
  }

  test("prunedReadBoxPointDistributed: identical file lists to the driver path, orphans included") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zbpdist").toString
    val src = spark.range(100000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 16, out)
    ZOrder.writeBloomSidecar(spark, out, Seq("id"))
    // orphan: no manifest rows, no sidecar rows — both paths must keep it
    spark.range(200000, 200010).select(
      col("id"), lit(200L).as("x"), lit(120L).as("y"))
      .coalesce(1).write.mode("append").parquet(out)
    val probes = Seq(
      (Seq(("x", 150L, 250L)), Seq[Any](16050L, 200005L, 3L)),
      (Seq(("x", 0L, 316L)), Seq[Any](31337L)),       // full-domain box
      (Seq(("x", 1000L, 2000L)), Seq[Any](31337L)))   // out-of-domain box
    probes.foreach { case (box, keys) =>
      val (dDf, d) = ZOrder.prunedReadBoxPoint(spark, out, box, "id", keys)
      val (sDf, s) = ZOrder.prunedReadBoxPointDistributed(spark, out, box, "id", keys)
      assert(s.filesSelected === d.filesSelected && s.filesTotal === d.filesTotal,
        s"$box $keys: ${s.filesSelected}/${s.filesTotal} vs ${d.filesSelected}/${d.filesTotal}")
      if (d.filesSelected > 0)
        assert(sDf.inputFiles.sorted.toSeq === dDf.inputFiles.sorted.toSeq, s"$box $keys")
      assert(sDf.select("id").as[Long].collect().sorted.toSeq ===
        dDf.select("id").as[Long].collect().sorted.toSeq, s"$box $keys")
    }
    // auto face: driver path below the threshold, distributed above
    val (box, keys) = probes.head
    val (aDf, a) = ZOrder.prunedReadBoxPointAuto(spark, out, box, "id", keys)
    val (bDf, b) = ZOrder.prunedReadBoxPointAuto(spark, out, box, "id", keys,
      distributedThreshold = 1)
    assert(a === b && aDf.count() === bDf.count())
  }

  test("updateBloomSidecar: first call on an un-indexed layout builds instead of throwing") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zbloomfb").toString
    val src = spark.range(50000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 8, out)
    // no writeBloomSidecar first — update must fall back to a full build
    assert(ZOrder.updateBloomSidecar(spark, out, Seq("id")) === 8)
    val (hit, p) = ZOrder.prunedReadPoint(spark, out, "id", Seq(31337L))
    assert(hit.select("id").as[Long].collect().toSeq === Seq(31337L))
    assert(p.filesSelected < p.filesTotal)
    // idempotent from here on
    assert(ZOrder.updateBloomSidecar(spark, out, Seq("id")) === 0)
  }

  test("hilbert kernel == staged Column algebra == nested Column algebra") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    // bits=16 over random lanes: the codegen'd kernel (layout path) vs
    // the staged withColumns form (the oracle's stage-for-stage CTE
    // mirror); bits=4 additionally vs the nested single-Column form
    val lanes = spark.range(4096).select(
      pmod(hash(col("id")), lit(65536)).cast("long").as("a"),
      pmod(hash(col("id") * 31 + 7), lit(65536)).cast("long").as("b"))
    // compare via collect, NOT a filter: pushing a predicate down
    // through the 16 staged projections alias-substitutes it at every
    // stage (~3^16 expression blowup — the exact hazard that makes the
    // kernel the layout path)
    val staged = ZOrder.withHilbertKey(lanes, col("a"), col("b"), bits = 16, keyCol = "s")
      .withColumn("k", GraftFunctions.hilbertKey2(col("a"), col("b"), bits = 16))
      .select("s", "k").collect()
    assert(staged.forall(r => r.getLong(0) == r.getLong(1)))
    val small = lanes.select((col("a") % 16).as("a"), (col("b") % 16).as("b"))
      .withColumn("n", ZOrder.hilbertKey2(col("a"), col("b"), bits = 4))
      .withColumn("k", GraftFunctions.hilbertKey2(col("a"), col("b"), bits = 4))
    assert(small.filter(col("n") =!= col("k")).count() === 0L)
  }

  test("hilbert clustering skips as few files as morton (one-file sampling margin) on the same box") {
    val outM = java.nio.file.Files.createTempDirectory("graft-zh-m").toString
    val outH = java.nio.file.Files.createTempDirectory("graft-zh-h").toString
    val src = spark.range(100000).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    val box = Seq(("x", 50L, 80L), ("y", 100L, 140L))
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 32, outM)
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 32, outH, curve = "hilbert")
    val (mDf, m) = ZOrder.prunedRead(spark, outM, box)
    val (hDf, h) = ZOrder.prunedRead(spark, outH, box)
    // one-file margin: repartitionByRange samples boundaries (unseeded),
    // so file cuts jitter by +-1 across builds
    assert(h.filesSelected <= m.filesSelected + 1,
      s"hilbert ${h.filesSelected} vs morton ${m.filesSelected}")
    assert(h.filesSelected <= 12 && h.filesSelected < h.filesTotal)
    assert(hDf.count() === mDf.count())
  }

  test("lifecycle: append under frozen bounds stays row-exact; compact restores locality") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zlife").toString
    val src = spark.range(100000).select(
      col("id"),
      (col("id") % 317).as("x"),
      ((col("id") * 7919) % 331).as("y"))
    val box = Seq(("x", 50L, 80L), ("y", 100L, 140L))
    val want = src.filter(col("x").between(50, 80) && col("y").between(100, 140))
      .select("id").as[Long].collect().sorted

    // build on the even half, append the odd half through frozen bounds
    ZOrder.cluster(src.filter(col("id") % 2 === 0), Seq("x", "y"), nFiles = 16, out)
    ZOrder.append(src.filter(col("id") % 2 === 1), Seq("x", "y"), out, nFiles = 4)
    val (afterAppend, appendProbe) = ZOrder.prunedRead(spark, out, box)
    assert(appendProbe.filesTotal === 20, "manifest covers the appended files")
    assert(afterAppend.select("id").as[Long].collect().sorted.sameElements(want),
      "append keeps skipping row-exact")

    // compact: full re-cluster, retrained bounds, locality restored
    val dest = java.nio.file.Files.createTempDirectory("graft-zlife-c").toString
    ZOrder.compact(spark, out, dest, Seq("x", "y"), nFiles = 32)
    val (afterCompact, compactProbe) = ZOrder.prunedRead(spark, dest, box)
    assert(compactProbe.filesTotal === 32)
    assert(compactProbe.filesSelected <= 12,
      s"compaction must restore locality: ${compactProbe.filesSelected}/32")
    assert(afterCompact.select("id").as[Long].collect().sorted.sameElements(want))

    // compacted keys equal a fresh single-shot clustering's keys (the
    // rebuild contract: compaction of an appended layout == cluster of
    // the union)
    val fresh = java.nio.file.Files.createTempDirectory("graft-zlife-f").toString
    ZOrder.cluster(src, Seq("x", "y"), nFiles = 32, fresh)
    val a = spark.read.parquet(dest).select("id", "zkey").as[(Long, Long)].collect().sortBy(_._1)
    val b = spark.read.parquet(fresh).select("id", "zkey").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("writer lock: a second live writer on the same batch id fails deterministically; a stale lock is taken over") {
    import spark.implicits._
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-zlock").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    // writer A holds the inflight lock (simulated: the lock file exists
    // and is fresh) — writer B must fail BEFORE touching the table
    graft.io.Fio.mkdirs(s"$out/_zbatches")
    assert(graft.io.Fio.createExclusive(s"$out/_zbatches/5.inflight", "writer-a"))
    val before = graft.io.Fio.listNames(out).sorted
    val lost = intercept[GraftConcurrentWriteException] {
      ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 5)
    }
    assert(lost.getMessage.contains("live concurrent writer"))
    assert(graft.io.Fio.listNames(out).sorted === before,
      "the losing writer left no trace in the table dir")
    assert(!graft.io.Fio.exists(s"$out/_zbatches/5"))
    // age the lock past the stale window: the holder is presumed crashed
    // and the replay takes over — the exactly-once path stays open
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$out/_zbatches/5.inflight"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    assert(ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 5) > 0)
    assert(graft.io.Fio.exists(s"$out/_zbatches/5"))
    assert(!graft.io.Fio.exists(s"$out/_zbatches/5.inflight"), "lock released after commit")
    assert(ZOrder.readCommitted(spark, out).count() === 25000L)
  }

  test("mergeInto: concurrent merges serialize on the table-level lock") {
    import spark.implicits._
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-zmlock").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    // another merge holds the table lock: this one must fail before
    // touching the table (two merges with overlapping keys and
    // different ids could otherwise tombstone each other's versions)
    graft.io.Fio.mkdirs(s"$out/_zbatches")
    assert(graft.io.Fio.createExclusive(s"$out/_zbatches/merge.inflight", "merge-a"))
    val before = graft.io.Fio.listNames(out).sorted
    intercept[GraftConcurrentWriteException] {
      ZOrder.mergeInto(spark, out, shaped(0, 100).withColumn("y", col("y") + 1000),
        keys = Seq("id"), cols = Seq("x", "y"), batchId = 0)
    }
    assert(graft.io.Fio.listNames(out).sorted === before)
    // the holder crashed: age the lock, the merge takes over and both
    // phases run
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$out/_zbatches/merge.inflight"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    val (tombs, files) = ZOrder.mergeInto(spark, out,
      shaped(0, 100).withColumn("y", col("y") + 1000),
      keys = Seq("id"), cols = Seq("x", "y"), batchId = 0)
    assert(tombs === 100L && files > 0)
    assert(!graft.io.Fio.exists(s"$out/_zbatches/merge.inflight"))
    assert(ZOrder.readWithDeletes(spark, out).count() === 20000L)
  }

  test("compactQuantileCommitted: compaction is a commit — history survives, current view compacts") {
    import spark.implicits._
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-zcompactc").toString
    def shaped(ids: Seq[Long]) = ids.toDF("id").select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    val evens = (0L until 20000L).filter(_ % 2 == 0)
    val odds = (0L until 20000L).filter(_ % 2 == 1)
    val (odd0, odd2) = odds.splitAt(odds.length / 2)
    ZOrder.clusterQuantile(shaped(evens), Seq("x", "y"), nFiles = 8, out)
    ZOrder.appendQuantileOnce(shaped(odd0), Seq("x", "y"), out, batchId = 0)
    ZOrder.deleteWhere(spark, out, col("id") % 5 === 3) // stamped version 0
    // the pre-compaction snapshot, captured as data for the identity pin
    val asOf0Before = ZOrder.readAsOfBatch(spark, out, 0L, applyDeletes = true)
      .select("id").as[Long].collect().sorted
    val n = ZOrder.compactQuantileCommitted(spark, out, Seq("x", "y"), nFiles = 4, batchId = 1)
    assert(n > 0)
    assert(ZOrder.compactQuantileCommitted(spark, out, Seq("x", "y"), nFiles = 4, batchId = 1) === 0,
      "a replay of a committed compaction short-circuits")
    ZOrder.appendQuantileOnce(shaped(odd2), Seq("x", "y"), out, batchId = 2)

    // HISTORY SURVIVES: the as-of-0 read is byte-identical across the
    // compaction (old files, markers, and stamped tombstones untouched)
    val asOf0After = ZOrder.readAsOfBatch(spark, out, 0L, applyDeletes = true)
      .select("id").as[Long].collect().sorted
    assert(asOf0After.sameElements(asOf0Before))
    val wantAsOf0 = (evens ++ odd0).filterNot(_ % 5 == 3).sorted.toArray
    assert(asOf0Before.sameElements(wantAsOf0))

    // CURRENT VIEW: compaction survivors + the post-compaction batch,
    // served from ONLY zb1-*/zb2-* files (base and zb0 are folded)
    val cur = ZOrder.readCommitted(spark, out, applyDeletes = true)
    val wantCur = ((evens ++ odd0).filterNot(_ % 5 == 3) ++ odd2).sorted.toArray
    assert(cur.select("id").as[Long].collect().sorted.sameElements(wantCur))
    // (the no-deletes face shares the keep set and is a direct scan, so
    // the _metadata pseudo-column resolves)
    val served = ZOrder.readCommitted(spark, out)
      .select(element_at(split(col("_metadata.file_path"), "/"), -1))
      .distinct().as[String].collect()
    assert(served.forall(f => f.startsWith("zb1-") || f.startsWith("zb2-")),
      s"current committed view must read only post-compaction files: ${served.mkString(",")}")
    // readWithDeletes (the current-state read) resolves through the
    // compaction too — a raw dir scan would double-read every old row
    assert(ZOrder.readWithDeletes(spark, out).count() === wantCur.length.toLong)
    // the committed pruned read admits only live files as well
    val (pruned, probe) = ZOrder.prunedReadCommitted(spark, out, Seq(("x", 50L, 80L)))
    val wantBox = wantCur.count(i => { val x = i % 317; x >= 50 && x <= 80 }).toLong
    assert(pruned.count() === wantBox)
    assert(probe.filesTotal <= 6, s"probe universe is the live snapshot, got ${probe.filesTotal}")
    // post-compaction appends bucket through the RETRAINED boundaries
    // (bounds rewritten before the compaction marker): spot-pin that the
    // boundary table now reflects survivor training, i.e. it differs
    // from what the original even-half training wrote
    assert(spark.read.parquet(s"$out/_zqbounds").count() > 0)
    // the POINT pruning face serves the committed snapshot too — bloom
    // rows for folded files exist (the sidecar indexes the dir) but the
    // shared scanKeep filters them out, so no pre-compaction row is
    // double-read and the deleted id stays deleted
    ZOrder.writeBloomSidecar(spark, out, Seq("id"))
    val (pointDf, _) = ZOrder.prunedReadPoint(spark, out, "id", Seq(8L, 9L, 25L))
    assert(pointDf.select("id").as[Long].collect().sorted.sameElements(Array(9L, 25L)),
      "8 is tombstone-deleted; 9 and 25 survive exactly once each")
  }

  test("expireSnapshots: reclaims folded lineage; current reads identical; expired versions fail by name") {
    import spark.implicits._
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-zexpire").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0)
    ZOrder.deleteWhere(spark, out, col("id") % 7 === 2)
    // nothing to expire before a compaction exists: the live tail is
    // never droppable
    assert(ZOrder.expireSnapshots(spark, out) === Nil)
    ZOrder.compactQuantileCommitted(spark, out, Seq("x", "y"), nFiles = 4, batchId = 1)
    ZOrder.appendQuantileOnce(shaped(25000, 30000), Seq("x", "y"), out, batchId = 2)
    val before = ZOrder.readCommitted(spark, out, applyDeletes = true)
      .select("id").as[Long].collect().sorted
    val filesBefore = graft.io.Fio.listNames(out).count(_.endsWith(".parquet"))
    val removed = ZOrder.expireSnapshots(spark, out)
    assert(removed.nonEmpty, "base + zb0 lineage must be reclaimed")
    assert(graft.io.Fio.listNames(out).count(_.endsWith(".parquet")) ===
      filesBefore - removed.size, "storage actually reclaimed")
    assert(graft.io.Fio.listNames(out).filter(_.endsWith(".parquet"))
      .forall(f => f.startsWith("zb1-") || f.startsWith("zb2-")))
    val after = ZOrder.readCommitted(spark, out, applyDeletes = true)
      .select("id").as[Long].collect().sorted
    assert(after.sameElements(before), "committed current reads byte-identical across expiry")
    // the expired version fails LOUD by version number, never silently empty
    val gone = intercept[IllegalStateException] {
      ZOrder.readAsOfBatch(spark, out, 0L)
    }
    assert(gone.getMessage.contains("expired") && gone.getMessage.contains("0"))
    // the surviving lineage still time-travels: as-of the compaction
    // itself is exactly the pre-batch-2 state
    val asOf1 = ZOrder.readAsOfBatch(spark, out, 1L, applyDeletes = true)
    assert(asOf1.count() === before.length - 5000L)
    // dead tombstones (against dropped files) were purged with them
    val deadTombs = spark.read.parquet(s"$out/_zdeletes")
      .filter(!col("file").startsWith("zb1-") && !col("file").startsWith("zb2-")).count()
    assert(deadTombs === 0L)
    // a second expiry is a no-op, and the floor persists
    assert(ZOrder.expireSnapshots(spark, out) === Nil)
    intercept[IllegalStateException] { ZOrder.readAsOfBatch(spark, out, 0L) }
  }

  test("vacuum: a live writer's unmarked files survive the grace window; a crashed writer's do not") {
    import spark.implicits._
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-zvacgrace").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 20000), Seq("x", "y"), nFiles = 8, out)
    ZOrder.appendQuantileOnce(shaped(20000, 25000), Seq("x", "y"), out, batchId = 0)
    // a publish in flight: renamed-in files, fresh lock, no marker yet
    graft.io.Fio.delete(s"$out/_zbatches/0")
    assert(graft.io.Fio.createExclusive(s"$out/_zbatches/0.inflight", "live-writer"))
    assert(ZOrder.vacuum(spark, out) === Nil,
      "vacuum must not eat a live writer's renamed-in files")
    assert(graft.io.Fio.listNames(out).exists(_.startsWith("zb0-")))
    // the writer crashed: age the lock past the stale window
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$out/_zbatches/0.inflight"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    val removed = ZOrder.vacuum(spark, out)
    assert(removed.nonEmpty && graft.io.Fio.listNames(out).forall(!_.startsWith("zb0-")))
    assert(spark.read.parquet(out).count() === 20000L)
  }

  test("version-atomic UPDATE: a crash before the marker rolls back to nothing-happened") {
    import spark.implicits._
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-zupdatomic").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 10000), Seq("x", "y"), nFiles = 4, out)
    ZOrder.appendQuantileOnce(shaped(10000, 11000), Seq("x", "y"), out, batchId = 0)
    def snapshot(): Seq[(Long, Long)] = ZOrder.readCommitted(spark, out, applyDeletes = true)
      .select(col("id"), col("y")).as[(Long, Long)].collect().sorted.toSeq
    val before = snapshot()
    val (bid, n, files) = ZOrder.updateWhere(spark, out,
      col("id") % 10 === 3, Seq(("y", col("y") + 100000)))
    assert(bid === 1L && n === 1100L && files > 0)
    val updated = snapshot()
    assert(updated.count(_._2 >= 100000) === 1100)
    // CRASH SIMULATION: the marker never landed — files unmarked AND the
    // pre-marker tombstones (stamped 1) dormant under the read ceiling:
    // the table must read EXACTLY as before the update, not half of it
    graft.io.Fio.delete(s"$out/_zbatches/1")
    assert(snapshot() === before,
      "a crashed UPDATE must be invisible in both halves (no dead old rows, no new rows)")
    // re-running the update converges exactly-once: the replay purge
    // drops the crashed attempt's files AND its stamped tombstones, so
    // the SET is not double-applied and no duplicate versions survive
    val (bid2, n2, _) = ZOrder.updateWhere(spark, out,
      col("id") % 10 === 3, Seq(("y", col("y") + 100000)))
    assert(bid2 === 1L && n2 === 1100L)
    assert(snapshot() === updated, "re-run after crash == the state one clean UPDATE produces")
    // vacuum also reclaims a crashed attempt's dormant tombstones (the
    // purge may leave the sidecar dir empty of parquet entirely)
    graft.io.Fio.delete(s"$out/_zbatches/1")
    ZOrder.vacuum(spark, out)
    assert(snapshot() === before)
    val remaining = graft.io.Fio.listNames(s"$out/_zdeletes").filter(_.endsWith(".parquet"))
    assert(remaining.isEmpty ||
      spark.read.parquet(s"$out/_zdeletes").filter(col("batch") > 0).count() === 0L,
      "dormant stamps reclaimed by vacuum")
  }

  test("schema contract: an append whose columns diverge from the table is refused by name") {
    import spark.implicits._
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-zschema").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 5000), Seq("x", "y"), nFiles = 4, out)
    // extra column
    val e1 = intercept[IllegalArgumentException] {
      ZOrder.appendQuantileOnce(
        shaped(5000, 5100).withColumn("extra", lit(1)), Seq("x", "y"), out, batchId = 0)
    }
    assert(e1.getMessage.contains("extra columns: extra"))
    // missing column
    val e2 = intercept[IllegalArgumentException] {
      ZOrder.appendQuantileOnce(shaped(5000, 5100).drop("id"), Seq("x", "y"), out, batchId = 0)
    }
    assert(e2.getMessage.contains("missing columns: id"))
    // nothing committed by the refusals; a conforming append still lands
    assert(ZOrder.committedBatches(out).isEmpty)
    assert(ZOrder.appendQuantileOnce(shaped(5000, 5100), Seq("x", "y"), out, batchId = 0) > 0)
    assert(ZOrder.readCommitted(spark, out).count() === 5100L)
  }

  test("schema widen: opt-in superset commits atomically, reads null-fill, time travel pre-widen, crash rolls back") {
    import spark.implicits._
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-zwiden").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 5000), Seq("x", "y"), nFiles = 4, out)
    // a superset batch WITHOUT the opt-in stays refused (the r20 base contract)
    intercept[IllegalArgumentException] {
      ZOrder.appendQuantileOnce(shaped(5000, 5100).withColumn("w", col("id") * 2),
        Seq("x", "y"), out, batchId = 0)
    }
    // the committed widen
    assert(ZOrder.appendQuantileOnce(shaped(5000, 5100).withColumn("w", col("id") * 2),
      Seq("x", "y"), out, batchId = 0, allowWiden = true) > 0)
    val cur = ZOrder.readCommitted(spark, out)
    assert(cur.columns.toSet === Set("id", "x", "y", "w", "zkey"))
    assert(cur.count() === 5100L)
    // old files null-fill the widened column at read time — no rewrites
    assert(cur.filter(col("w").isNull).count() === 5000L)
    assert(cur.filter(col("w") === col("id") * 2).count() === 100L)
    // time travel below the widen serves the PRE-widen schema
    assert(!ZOrder.readAsOfBatch(spark, out, -1L).columns.contains("w"))
    // the table's schema IS the widened one now: an old-shape batch is
    // refused by name, the widened shape is the new exact match
    val e = intercept[IllegalArgumentException] {
      ZOrder.appendQuantileOnce(shaped(5100, 5200), Seq("x", "y"), out, batchId = 1)
    }
    assert(e.getMessage.contains("missing columns: w"))
    assert(ZOrder.appendQuantileOnce(shaped(5100, 5200).withColumn("w", col("id") * 2),
      Seq("x", "y"), out, batchId = 1) > 0)
    // deletes compose with widening: a predicate over the widened column
    // evaluates (as NULL) over pre-widen files
    ZOrder.deleteWhere(spark, out, col("w").isNull && col("id") < 1000)
    assert(ZOrder.readWithDeletes(spark, out).count() === 4200L)
    // CRASH: a widen whose marker never landed is invisible in BOTH
    // halves (no rows, no schema), and a later conforming republish of
    // the id purges the dormant record
    assert(ZOrder.appendQuantileOnce(
      shaped(5200, 5300).withColumn("w", col("id") * 2).withColumn("w2", lit(7)),
      Seq("x", "y"), out, batchId = 2, allowWiden = true) > 0)
    graft.io.Fio.delete(s"$out/_zbatches/2")
    val afterCrash = ZOrder.readCommitted(spark, out)
    assert(!afterCrash.columns.contains("w2"), "crashed widen's schema must stay dormant")
    assert(afterCrash.count() === 5200L)
    assert(ZOrder.appendQuantileOnce(shaped(5200, 5300).withColumn("w", col("id") * 2),
      Seq("x", "y"), out, batchId = 2) > 0)
    assert(!graft.io.Fio.exists(s"$out/_zschema/2"), "republish must purge the dead record")
    val fin = ZOrder.readCommitted(spark, out)
    assert(fin.columns.toSet === Set("id", "x", "y", "w", "zkey"))
    assert(fin.count() === 5300L)
  }

  test("requireFresh: a marker appearing for a freshly derived id fails loud, never a silent replay") {
    import spark.implicits._
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-zfresh").toString
    def shaped(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 317).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(shaped(0, 5000), Seq("x", "y"), nFiles = 4, out)
    ZOrder.appendQuantileOnce(shaped(5000, 5100), Seq("x", "y"), out, batchId = 0)
    // replay semantics unchanged without the flag: short-circuits to 0
    assert(ZOrder.appendQuantileOnce(shaped(5000, 5100), Seq("x", "y"), out, batchId = 0) === 0)
    // with the flag (the SQL commands' contract): the same marker is a
    // concurrent-write error — the rows were NOT written
    val e = intercept[GraftConcurrentWriteException] {
      ZOrder.appendQuantileOnce(shaped(5100, 5200), Seq("x", "y"), out,
        batchId = 0, requireFresh = true)
    }
    assert(e.getMessage.contains("freshly derived"))
  }

  test("table lock heartbeat: a long-held lock never goes stale while its holder is alive") {
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-zhb").toString
    val windowMs = 600L
    @volatile var contenderError: Option[Throwable] = None
    ZOrder.withTableLock(out, staleLockMs = windowMs) {
      // hold the lock for 3× the stale window; the heartbeat (window/4)
      // must keep its mtime fresh the whole time
      Thread.sleep(3 * windowMs)
      val t = new Thread(() => {
        try ZOrder.withTableLock(out, staleLockMs = windowMs) { fail("contender must not enter") }
        catch { case e: Throwable => contenderError = Some(e) }
      })
      t.start(); t.join()
    }
    assert(contenderError.exists(_.isInstanceOf[GraftConcurrentWriteException]),
      s"contender saw: $contenderError")
    assert(contenderError.get.getMessage.contains("live concurrent writer"),
      "the aged-but-heartbeated lock must read as LIVE, not stale")
    // released: a fresh acquisition succeeds
    ZOrder.withTableLock(out, staleLockMs = windowMs) { () }
  }

  test("stale-lock takeover is atomic: racing waiters admit exactly one writer at a time") {
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-ztakeover").toString
    graft.io.Fio.mkdirs(s"$out/_zbatches")
    val lock = s"$out/_zbatches/merge.inflight"
    assert(graft.io.Fio.createExclusive(lock, "crashed-writer"))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(lock),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
    val winners = new java.util.concurrent.atomic.AtomicInteger(0)
    val losers = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 6).map { _ =>
      new Thread(() => {
        try {
          ZOrder.withTableLock(out) {
            val now = active.incrementAndGet()
            maxActive.getAndUpdate(m => math.max(m, now))
            Thread.sleep(50)
            active.decrementAndGet()
          }
          winners.incrementAndGet()
        } catch { case _: GraftConcurrentWriteException => losers.incrementAndGet() }
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(winners.get() + losers.get() === 6)
    assert(winners.get() >= 1, "the stale lock must be taken over by someone")
    assert(maxActive.get() === 1,
      s"mutual exclusion violated: ${maxActive.get()} writers inside the lock at once")
  }
}
