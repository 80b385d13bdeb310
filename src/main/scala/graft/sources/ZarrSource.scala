package graft.sources

import graft.io.{Fio, FioConf}
import graft.volume.{AtomicDir, Chunk, UpscaleCli, VolumeMeta, ZarrStore}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util

/** DataSource V2 connector for spec-compliant zarr v2 array directories:
  * `spark.read.format("zarr").load(path)` exposes the chunk grid as a SQL
  * table with `SupportsPushDownFilters` on the chunk coordinates.
  *
  * Planning reads ONE file (`.zarray`) — the grid is a pure function of
  * shape/chunks, so coordinate predicates prune partitions with zero
  * directory I/O, and a point lookup plans exactly one task reading
  * exactly one chunk file. Absent chunk files decode as fill_value rows
  * per the zarr spec (the task probes existence, not the planner).
  */
class ZarrSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = ZarrSource.Name

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ZarrSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("zarr requires a path"))
    new ZarrTable(path)
  }

  override def supportsExternalMetadata(): Boolean = true
}

object ZarrSource {
  val Name = "zarr"

  val schema: StructType = StructType(Seq(
    StructField("cz", IntegerType, nullable = false),
    StructField("cy", IntegerType, nullable = false),
    StructField("cx", IntegerType, nullable = false),
    StructField("z0", LongType, nullable = false),
    StructField("y0", LongType, nullable = false),
    StructField("x0", LongType, nullable = false),
    StructField("nz", IntegerType, nullable = false),
    StructField("ny", IntegerType, nullable = false),
    StructField("nx", IntegerType, nullable = false),
    StructField("data", BinaryType, nullable = false),
  ))

  val CoordCols: Set[String] = Set("cz", "cy", "cx")
}

class ZarrTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"zarr(`$path`)"
  override def schema(): StructType = ZarrSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path, ChunkPacking.targetBytes(options))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ZarrWriteBuilder(path, info)
}

/** Groups pruned chunk coordinates into multi-chunk InputPartitions up to a
  * byte target — the moral equivalent of `spark.sql.files.maxPartitionBytes`
  * file packing. At the reference's 128 MB chunks and 100 TB, one task per
  * chunk file is ~800k tasks: schedulable, but task-launch overhead dominates
  * small-chunk stores and the driver holds ~800k partition objects. Packing
  * bounds the partition count by ceil(totalBytes / target) while coordinate
  * pruning stays per-chunk (a point lookup still plans exactly one partition
  * with exactly one chunk).
  */
object ChunkPacking {
  val OptionName = "maxPartitionBytes"
  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  def targetBytes(options: CaseInsensitiveStringMap): Long = {
    val t = options.getLong(OptionName, DefaultTargetBytes)
    require(t > 0, s"$OptionName must be positive, got $t")
    t
  }

  /** Greedy pack in input order (row-major grid order → neighboring chunks
    * share a partition). A single item never splits; a partition takes at
    * least one item regardless of size, so count ≤ max(1, items).
    */
  def pack[A](items: Iterator[A], sizeOf: A => Long, target: Long): Iterator[Seq[A]] =
    new Iterator[Seq[A]] {
      private val it = items.buffered
      override def hasNext: Boolean = it.hasNext
      override def next(): Seq[A] = {
        val group = Seq.newBuilder[A]
        var bytes = 0L
        var first = true
        while (it.hasNext && (first || bytes + sizeOf(it.head) <= target)) {
          val a = it.next()
          group += a
          bytes += sizeOf(a)
          first = false
        }
        group.result()
      }
    }
}

/** DSv2 WRITE path: `chunkDf.write.format("zarr").save(path)` lands chunk
  * files from executor tasks; the driver writes `.zarray` once up front
  * (array geometry from write options on first write, or the existing
  * store's metadata on append). Rows must match [[ZarrSource.schema]]
  * (what `format("zarr")` reads and `ChunkVolume.chunks.toDF` produces).
  *
  * Both modes publish ATOMICALLY at job commit; a job that fails (or a
  * driver that crashes) before commit leaves the destination exactly as
  * it was — never a partial store where missing chunks read as
  * fill_value sparsity (reference overwrite semantics,
  * upscale_streaming.py:118–127):
  *
  *  - `mode("overwrite")` (and first write to a fresh path) stages the
  *    whole array in a temp sibling; commit swaps it in with O(1)
  *    renames and retires the old tree in the background ([[AtomicDir]])
  *    — no O(files) driver truncate walk, ever.
  *  - `mode("append")` upserts chunk files idempotently (a re-landed
  *    coordinate overwrites its own file — the streaming-ingest
  *    contract). Tasks stage into a hidden `.__staging/<id>/` inside the
  *    store (invisible to readers, which address chunks by coordinate
  *    and never list); commit publishes each staged file with an atomic
  *    per-file rename, so readers see each chunk old-or-new, never torn,
  *    and an uncommitted job publishes nothing.
  *
  * First-write options: `dimZ dimY dimX chunkZ chunkY chunkX`
  * (required), `elementType` (MET_* tag, default MET_UINT), and
  * `compressor` (same vocabulary as `UpscaleCli --compressor`,
  * default zstd).
  */
class ZarrWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write with BatchWrite {
    override def toBatch: BatchWrite = this

    // resolved on the driver in createBatchWriterFactory, consumed by
    // commit/abort (DSv2 calls them on the same BatchWrite instance)
    @volatile private var staging: StoreStaging = _

    override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DataWriterFactory = {
      // driver-side init: pick the staging layout, then resolve-or-create
      // the array metadata so every task sees a consistent geometry
      implicit val fc: FioConf = FioConf.of(org.apache.spark.sql.SparkSession.active)
      val dest = Fio.qualify(path)
      AtomicDir.sweepLeftovers(dest)
      val appendToExisting = !doTruncate && Fio.exists(Fio.child(dest, ".zarray"))
      staging =
        if (appendToExisting) StoreStaging.Append(dest)
        else StoreStaging.Swap(dest)
      val writeDir = staging.writeDir
      Fio.mkdirs(writeDir)
      val opts = info.options
      val (zm, vm) =
        if (appendToExisting) ZarrStore.readMeta(dest)
        else {
          def req(k: String): Long = {
            val v = opts.get(k)
            require(v != null,
              s"zarr write to a new store requires option '$k' " +
                "(dimZ/dimY/dimX/chunkZ/chunkY/chunkX)")
            v.toLong
          }
          val (dz, dy, dx) = (req("dimZ"), req("dimY"), req("dimX"))
          val (cz, cy, cx) = (req("chunkZ").toInt, req("chunkY").toInt, req("chunkX").toInt)
          val elem = Option(opts.get("elementType")).getOrElse("MET_UINT")
          val codec = UpscaleCli.zarrCodec(Option(opts.get("compressor")).getOrElse("zstd"))
          val vm0 = VolumeMeta(
            dz, dy, dx, cz, cy, cx,
            ((dz + cz - 1) / cz).toInt, ((dy + cy - 1) / cy).toInt, ((dx + cx - 1) / cx).toInt,
            elem, 1.0, 1.0, 1.0)
          ZarrStore.initArray(writeDir, vm0, codec)
        }
      // a parsed blosc codec carries no typesize (that lives per chunk
      // header on read) — the writer needs it for the shuffle transforms
      val writeCodec = zm.codec match {
        case b: ZarrStore.BloscCodec => b.withTypesize(vm.bytesPerVoxel)
        case c => c
      }
      new ZarrWriterFactory(writeDir, writeCodec, vm, fc)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit =
      staging.commit(_ => ()) // chunk + metadata files ARE the store; nothing to finalize
    override def abort(messages: Array[WriterCommitMessage]): Unit = staging.abort()
  }
}

class ZarrWriterFactory(dir: String, codec: ZarrStore.Codec, vm: VolumeMeta, fc: FioConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        val c = Chunk(
          row.getInt(0), row.getInt(1), row.getInt(2),
          row.getLong(3), row.getLong(4), row.getLong(5),
          row.getInt(6), row.getInt(7), row.getInt(8),
          row.getBinary(9))
        ZarrStore.encodeChunkFile(c, dir, vm, codec)(fc)
      }
      override def commit(): WriterCommitMessage = new WriterCommitMessage {}
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

class ZarrScanBuilder(path: String, targetBytes: Long)
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(_.references.toSet.subsetOf(ZarrSource.CoordCols))
    filters // all stay as residuals (pruning is file-granular, not row-exact)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ZarrScan(path, pushed, targetBytes)
}

class ZarrScan(path: String, filters: Array[Filter], targetBytes: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = ZarrSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    implicit val fc: FioConf = FioConf.of(org.apache.spark.sql.SparkSession.active)
    val (zm, vm) = ZarrStore.readMeta(path) // the ONLY planning I/O
    val pathStr = Fio.qualify(path)
    // prune per chunk (zero I/O — the grid is a pure function of the
    // metadata), then pack surviving coordinates to the byte target using
    // the uncompressed payload size (what the task must hold in memory)
    val coords = for {
      cz <- (0 until vm.ncz).iterator
      cy <- (0 until vm.ncy).iterator
      cx <- (0 until vm.ncx).iterator
      known = Map("cz" -> cz.toLong, "cy" -> cy.toLong, "cx" -> cx.toLong)
      if filters.forall(f => ChunkStoreSource.filterKeeps(f, known))
    } yield (cz, cy, cx)
    val bpv = vm.bytesPerVoxel.toLong
    def payloadBytes(c: (Int, Int, Int)): Long = {
      val nz = math.min(vm.chunkZ.toLong, vm.dimZ - c._1.toLong * vm.chunkZ)
      val ny = math.min(vm.chunkY.toLong, vm.dimY - c._2.toLong * vm.chunkY)
      val nx = math.min(vm.chunkX.toLong, vm.dimX - c._3.toLong * vm.chunkX)
      nz * ny * nx * bpv
    }
    ChunkPacking.pack(coords, payloadBytes, targetBytes)
      .map(g => ZarrChunksPartition(pathStr, zm, vm, g, fc): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new ZarrReaderFactory
}

final case class ZarrChunksPartition(
    dir: String, zm: ZarrStore.ZarrMeta, vm: VolumeMeta,
    coords: Seq[(Int, Int, Int)], fc: FioConf) extends InputPartition

class ZarrReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ZarrChunksPartition]
    new PartitionReader[InternalRow] {
      private val it = p.coords.iterator
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (!it.hasNext) return false
        val (cz, cy, cx) = it.next()
        val sep = p.zm.dimSeparator
        val bytes = Fio.readAllIfExists(Fio.child(p.dir, s"$cz$sep$cy$sep$cx"))(p.fc)
        val c = ZarrStore.decodeChunk(bytes, p.zm, p.vm, cz, cy, cx)
        row = new GenericInternalRow(Array[Any](
          c.cz, c.cy, c.cx, c.z0, c.y0, c.x0, c.nz, c.ny, c.nx, c.data))
        true
      }

      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
