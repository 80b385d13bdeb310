package graft.sources

import graft.volume.ChunkVolume
import com.github.luben.zstd.Zstd
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
import scala.jdk.CollectionConverters._

/** DataSource V2 connector for the zarr-style chunk store (S4's idiomatic
  * end state per SURVEY §2.1): `spark.read.format("graftchunks")
  * .load(path)` exposes the store as a SQL-visible chunk table with
  * `SupportsPushDownFilters` — predicates on the chunk-grid coordinates
  * (cz/cy/cx) prune ENTIRE FILES from the scan using only their names
  * (`cz.cy.cx`), zero I/O. One InputPartition per surviving chunk file, so
  * a point lookup plans exactly one task reading exactly one file.
  */
class ChunkStoreSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = ChunkStoreSource.Name

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkStoreSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("graftchunks requires a path"))
    new ChunkStoreTable(path)
  }

  override def supportsExternalMetadata(): Boolean = true
}

object ChunkStoreSource {
  val Name = "graftchunks"

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

  /** Can `coord` (one of cz/cy/cx, known per file with zero I/O) satisfy
    * the filter? Unknown/unrelated filters keep the file (sound pruning).
    */
  private[sources] def filterKeeps(f: Filter, coords: Map[String, Int]): Boolean = f match {
    case EqualTo(a, v: Number) if coords.contains(a) => coords(a) == v.intValue()
    case In(a, vs) if coords.contains(a) => vs.exists(v => v.asInstanceOf[Number].intValue() == coords(a))
    case LessThan(a, v: Number) if coords.contains(a) => coords(a) < v.intValue()
    case LessThanOrEqual(a, v: Number) if coords.contains(a) => coords(a) <= v.intValue()
    case GreaterThan(a, v: Number) if coords.contains(a) => coords(a) > v.intValue()
    case GreaterThanOrEqual(a, v: Number) if coords.contains(a) => coords(a) >= v.intValue()
    case And(l, r) => filterKeeps(l, coords) && filterKeeps(r, coords)
    case Or(l, r) => filterKeeps(l, coords) || filterKeeps(r, coords)
    case _ => true
  }
}

class ChunkStoreTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graftchunks(`$path`)"
  override def schema(): StructType = ChunkStoreSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChunkStoreScanBuilder(path)
}

class ChunkStoreScanBuilder(path: String) extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // we prune files with coordinate filters but cannot guarantee
    // row-level exactness for every filter shape → keep all as residuals
    pushed = filters.filter { f =>
      def refs(f: Filter): Set[String] = f.references.toSet
      refs(f).subsetOf(Set("cz", "cy", "cx"))
    }
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ChunkStoreScan(path, pushed)
}

class ChunkStoreScan(path: String, filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = ChunkStoreSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Paths.get(path)
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("\\d+\\.\\d+\\.\\d+"))
      .filter { name =>
        val Array(cz, cy, cx) = name.split("\\.").map(_.toInt)
        val coords = Map("cz" -> cz, "cy" -> cy, "cx" -> cx)
        filters.forall(f => ChunkStoreSource.filterKeeps(f, coords))
      }
      .map(name => ChunkFilePartition(dir.resolve(name).toString, name): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new ChunkFileReaderFactory
}

final case class ChunkFilePartition(file: String, name: String) extends InputPartition

class ChunkFileReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChunkFilePartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (done) return false
        val Array(cz, cy, cx) = p.name.split("\\.").map(_.toInt)
        val bytes = Files.readAllBytes(Paths.get(p.file))
        val buf = java.nio.ByteBuffer.wrap(bytes, 0, 44)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val z0 = buf.getLong; val y0 = buf.getLong; val x0 = buf.getLong
        val nz = buf.getInt; val ny = buf.getInt; val nx = buf.getInt
        val rawLen = buf.getInt
        val data = new Array[Byte](rawLen)
        Zstd.decompressByteArray(data, 0, rawLen, bytes, 44, bytes.length - 44)
        row = new GenericInternalRow(Array[Any](cz, cy, cx, z0, y0, x0, nz, ny, nx, data))
        done = true
        true
      }

      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
