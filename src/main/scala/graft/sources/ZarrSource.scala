package graft.sources

import graft.volume.{ZarrStore, VolumeMeta}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.nio.file.{Files, Paths}
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

class ZarrTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"zarr(`$path`)"
  override def schema(): StructType = ZarrSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path)
}

class ZarrScanBuilder(path: String) extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(_.references.toSet.subsetOf(ZarrSource.CoordCols))
    filters // all stay as residuals (pruning is file-granular, not row-exact)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ZarrScan(path, pushed)
}

class ZarrScan(path: String, filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = ZarrSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val (zm, vm) = ZarrStore.readMeta(path) // the ONLY planning I/O
    val pathStr = Paths.get(path).toAbsolutePath.toString
    val parts = for {
      cz <- 0 until vm.ncz
      cy <- 0 until vm.ncy
      cx <- 0 until vm.ncx
      known = Map("cz" -> cz.toLong, "cy" -> cy.toLong, "cx" -> cx.toLong)
      if filters.forall(f => ChunkStoreSource.filterKeeps(f, known))
    } yield ZarrChunkPartition(pathStr, zm, vm, cz, cy, cx): InputPartition
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new ZarrReaderFactory
}

final case class ZarrChunkPartition(
    dir: String, zm: ZarrStore.ZarrMeta, vm: VolumeMeta,
    cz: Int, cy: Int, cx: Int) extends InputPartition

class ZarrReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ZarrChunkPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (done) return false
        val sep = p.zm.dimSeparator
        val f = Paths.get(p.dir, s"${p.cz}$sep${p.cy}$sep${p.cx}")
        val bytes = if (Files.exists(f)) Some(Files.readAllBytes(f)) else None
        val c = ZarrStore.decodeChunk(bytes, p.zm, p.vm, p.cz, p.cy, p.cx)
        row = new GenericInternalRow(Array[Any](
          c.cz, c.cy, c.cx, c.z0, c.y0, c.x0, c.nz, c.ny, c.nx, c.data))
        done = true
        true
      }

      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
