package graft.sources

import graft.SparkSpec
import graft.volume.{ChunkStore, ChunkVolume}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ChunkStoreSourceSpec extends AnyFunSuite with SparkSpec {

  private lazy val (storePath, vol) = {
    val dir = Files.createTempDirectory("dsv2").toString + "/store"
    val (dz, dy, dx) = (8L, 6L, 6L)
    val vox = spark.range(dz * dy * dx).select(
      expr(s"id div ${dy * dx}").as("z"),
      expr(s"(id div $dx) % $dy").as("y"),
      expr(s"id % $dx").as("x"),
      expr(s"id % 31").as("label"),
    )
    val v = ChunkVolume.fromVoxels(vox, dz, dy, dx, 4, 3, 3)
    ChunkStore.write(v, dir)
    (dir, v)
  }

  test("format(graftchunks) reads the store as a SQL-visible chunk table") {
    val df = spark.read.format("graftchunks").load(storePath)
    assert(df.columns.toSeq === Seq("cz", "cy", "cx", "z0", "y0", "x0", "nz", "ny", "nx", "lmin", "lmax", "data"))
    assert(df.count() === vol.chunks.count())
    // contents round-trip exactly (compare decoded voxel sums per chunk)
    val viaDsv2 = df.select(sum(expr("cz*1000000 + cy*1000 + cx")), sum(length(col("data"))))
      .collect().head
    val direct = vol.chunks.toDF()
      .select(sum(expr("cz*1000000 + cy*1000 + cx")), sum(length(col("data"))))
      .collect().head
    assert(viaDsv2 === direct)
  }

  test("DSv2 WRITE: read → write to a new store → identical table; stats ride commit messages") {
    val dst = Files.createTempDirectory("dsv2w").toString + "/copy"
    val src = spark.read.format("graftchunks").load(storePath)
    // first write: geometry options initialize the sidecar; lmin/lmax
    // input columns are recomputed, not trusted
    src.withColumn("lmin", expr("-999")).withColumn("lmax", expr("-999"))
      .write.format("graftchunks")
      .option("dimZ", vol.meta.dimZ).option("dimY", vol.meta.dimY).option("dimX", vol.meta.dimX)
      .option("chunkZ", vol.meta.chunkZ).option("chunkY", vol.meta.chunkY).option("chunkX", vol.meta.chunkX)
      .option("elementType", vol.meta.elementType)
      .mode("overwrite").save(dst)
    val back = spark.read.format("graftchunks").load(dst)
    assert(back.count() === src.count())
    // voxel-exact: decode both stores and compare
    val a = ChunkStore.read(spark, storePath).toVoxels.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val b = ChunkStore.read(spark, dst).toVoxels.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(a === b)
    // the consolidated stats index was committed by the DRIVER from the
    // tasks' commit messages, and the poisoned lmin/lmax were ignored
    val idx = ChunkStore.readStatsIndex(java.nio.file.Paths.get(dst).toAbsolutePath.toString)
    assert(idx.isDefined && idx.get.nonEmpty)
    assert(idx.get.values.forall { case (lo, hi) => lo >= 0 && hi >= lo })
    // append without options: sidecar metadata reused; idempotent per coord
    src.write.format("graftchunks").mode("append").save(dst)
    assert(spark.read.format("graftchunks").load(dst).count() === src.count())
  }

  test("coordinate filters prune input partitions with zero I/O (file-name pruning)") {
    // maxPartitionBytes=1 → one partition per file: per-file PRUNING is
    // what this test pins down (packing is exercised separately below)
    val df = spark.read.format("graftchunks").option("maxPartitionBytes", 1).load(storePath)
    val all = df.rdd.getNumPartitions
    assert(all === vol.chunks.count())
    val one = df.filter(col("cz") === 1 && col("cy") === 0 && col("cx") === 0)
    assert(one.rdd.getNumPartitions === 1) // exactly the one owning file planned
    assert(one.count() === 1)
    val slab = df.filter(col("cz") === 1)
    assert(slab.rdd.getNumPartitions === (vol.meta.ncy * vol.meta.ncx))
    // row-level residual filters still apply on non-pruned columns
    assert(df.filter(col("z0") === 4L).count() === (vol.meta.ncy * vol.meta.ncx))
  }

  test("scan packs files per InputPartition to the byte target") {
    // fixture grid is aligned: 2*2*2 = 8 uniform chunks of 4*3*3 voxels
    val chunkB = 4L * 3 * 3 * vol.meta.bytesPerVoxel
    def parts(target: Long): Int = spark.read.format("graftchunks")
      .option("maxPartitionBytes", target).load(storePath).rdd.getNumPartitions
    assert(parts(chunkB) === 8)
    assert(parts(chunkB * 3) === 3) // ceil(8/3)
    assert(parts(chunkB * 4) === 2)
    // default ~128 MB target swallows the whole tiny store in ONE task
    val packed = spark.read.format("graftchunks").load(storePath)
    assert(packed.rdd.getNumPartitions === 1)
    // point lookup still plans one single-file partition at the default
    // target (pruning runs before packing)
    val one = packed.filter(col("cz") === 1 && col("cy") === 1 && col("cx") === 0)
    assert(one.rdd.getNumPartitions === 1)
    assert(one.count() === 1)
    // packed read is content-identical to the per-file read
    assert(packed.select(sum(length(col("data"))), sum(expr("cz*100 + lmax"))).collect().head ===
      spark.read.format("graftchunks").option("maxPartitionBytes", 1).load(storePath)
        .select(sum(length(col("data"))), sum(expr("cz*100 + lmax"))).collect().head)
  }

  test("SQL over the chunk table") {
    spark.read.format("graftchunks").load(storePath).createOrReplaceTempView("chunks_v")
    val n = spark.sql("SELECT COUNT(*) FROM chunks_v WHERE cz = 0 AND nz = 4").collect().head.getLong(0)
    assert(n === vol.meta.ncy.toLong * vol.meta.ncx)
  }

  test("filterKeeps semantics: sound (keeps on unknown), exact on coords") {
    import org.apache.spark.sql.sources._
    val c = Map("cz" -> 3L, "cy" -> 1L, "cx" -> 0L)
    assert(ChunkStoreSource.filterKeeps(EqualTo("cz", 3), c))
    assert(!ChunkStoreSource.filterKeeps(EqualTo("cz", 4), c))
    assert(ChunkStoreSource.filterKeeps(And(GreaterThanOrEqual("cz", 2), LessThan("cy", 2)), c))
    assert(!ChunkStoreSource.filterKeeps(Or(EqualTo("cz", 9), EqualTo("cx", 5)), c))
    assert(ChunkStoreSource.filterKeeps(EqualTo("z0", 99L), c)) // unknown column: keep
    assert(ChunkStoreSource.filterKeeps(IsNotNull("cz"), c)) // unknown shape: keep
  }

  test("label-value pruning: lmin/lmax filters plan only candidate files (header peek)") {
    val df = spark.read.format("graftchunks").load(storePath)
    // labels are id % 31 over a dense grid: every chunk spans most labels,
    // but label 30 at z-slab granularity is absent from some chunks
    val hot = df.filter(col("lmin") <= 0L && col("lmax") >= 0L)
    assert(hot.rdd.getNumPartitions <= vol.chunks.count())
    // a label beyond the max prunes EVERYTHING at plan time
    val none = df.filter(col("lmin") <= 99L && col("lmax") >= 99L)
    assert(none.rdd.getNumPartitions === 0)
    assert(none.count() === 0)
  }

  test("stats index: written by write, trusted by the planner, peeks as fallback") {
    import graft.volume.ChunkStore
    // a fresh store so index tampering can't disturb the shared fixture
    val dir = Files.createTempDirectory("dsv2_idx").toString + "/store"
    val vox = spark.range(4L * 3 * 3).select(
      expr("id div 9").as("z"), expr("(id div 3) % 3").as("y"),
      expr("id % 3").as("x"), expr("id % 5").as("label"))
    ChunkStore.write(ChunkVolume.fromVoxels(vox, 4, 3, 3, 2, 3, 3), dir)
    val idxPath = java.nio.file.Paths.get(dir, ChunkStore.StatsIndexName)
    assert(Files.exists(idxPath))
    val idx = ChunkStore.readStatsIndex(dir).get
    assert(idx.size === 2) // one entry per chunk file
    // maxPartitionBytes=1 pins one file per partition: this test asserts
    // PRUNING (which files survive), not packing, so partition count must
    // equal surviving-file count regardless of the 128 MB packing default
    def hits(d: String) = spark.read.format("graftchunks")
      .option("maxPartitionBytes", 1).load(d)
      .filter(col("lmin") <= 3L && col("lmax") >= 3L).rdd.getNumPartitions
    assert(hits(dir) === 2)
    // tamper the index to claim every chunk excludes label 3: the planner
    // must plan ZERO partitions — proof it read the ONE index file, not
    // the (contradicting) per-file headers
    Files.writeString(idxPath,
      "GRAFT_STATS 1\n" + idx.keys.toSeq.sorted.map(n => s"$n 100 200").mkString("", "\n", "\n"))
    assert(hits(dir) === 0)
    // no index → header-peek fallback gives the true answer again
    Files.delete(idxPath)
    assert(hits(dir) === 2)
  }

  test("findLabel: header-peek candidates, exact counts, absent labels empty") {
    val found = graft.volume.ChunkStore.findLabel(spark, storePath, 7L)
      .collect().map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
    // ground truth from the decoded volume
    val truth = vol.toVoxels.filter(col("label") === 7L).count()
    assert(found.values.sum === truth)
    assert(found.nonEmpty)
    assert(graft.volume.ChunkStore.findLabel(spark, storePath, 99L).count() === 0)
  }
}
