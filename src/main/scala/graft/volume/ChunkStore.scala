package graft.volume

import org.apache.spark.sql.{Dataset, SparkSession}
import com.github.luben.zstd.Zstd
import java.nio.file.{Files, Paths}

/** Zarr-style chunked directory store (K1/K2): one compressed file per
  * chunk at `path/cz.cy.cx`, written directly from executor tasks with
  * zstd — the high-throughput volume sink, mirroring the reference's
  * `zarr.DirectoryStore` + Blosc-zstd layout (upscale_streaming.py:103–127)
  * without parquet's page/dictionary machinery in the hot path.
  * (The parquet chunk table, [[ChunkVolume.write]], remains the
  * SQL-queryable interop format.)
  *
  * Each chunk file: 40-byte little-endian header (z0 y0 x0 as i64,
  * nz ny nx as i32, raw payload length as i32) + zstd-compressed payload.
  * Volume metadata travels in the usual JSON sidecar.
  */
object ChunkStore {

  private val HeaderBytes = 44

  def write(vol: ChunkVolume, path: String, level: Int = 1,
      extraProvenance: Map[String, String] = Map.empty): Unit = {
    val dir = Paths.get(path)
    if (Files.exists(dir)) { // overwrite semantics like the reference's rmtree
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(dir)
    appendChunks(vol.chunks, path, level)
    ChunkVolume.writeSidecar(path, vol.meta, extraProvenance)
  }

  /** Append chunk files into an existing store (same file format, no
    * delete, no sidecar) — the incremental-ingest building block used by
    * the streaming path; a chunk re-appearing overwrites its own file
    * (idempotent per chunk coordinate).
    */
  def appendChunks(chunks: org.apache.spark.sql.Dataset[Chunk], path: String, level: Int = 1): Unit = {
    val pathStr = Paths.get(path).toAbsolutePath.toString
    Files.createDirectories(Paths.get(pathStr))
    chunks.foreachPartition { (it: Iterator[Chunk]) =>
      // one reused compression buffer per task — multi-MB chunks would
      // otherwise churn 2 humongous allocations each through the GC
      var dst: Array[Byte] = null
      it.foreach { c =>
        val bound = Zstd.compressBound(c.data.length.toLong).toInt
        if (dst == null || dst.length < bound) dst = new Array[Byte](bound)
        val n = Zstd.compressByteArray(dst, 0, dst.length, c.data, 0, c.data.length, level).toInt
        val buf = java.nio.ByteBuffer.allocate(HeaderBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.putLong(c.z0).putLong(c.y0).putLong(c.x0)
          .putInt(c.nz).putInt(c.ny).putInt(c.nx).putInt(c.data.length)
        val out = Files.newOutputStream(Paths.get(pathStr, s"${c.cz}.${c.cy}.${c.cx}"))
        try { out.write(buf.array()); out.write(dst, 0, n) } finally out.close()
      }
    }
  }

  def read(spark: SparkSession, path: String): ChunkVolume = {
    val meta = ChunkVolume.readSidecar(path)
    val pathStr = Paths.get(path).toAbsolutePath.toString
    val names = Files.list(Paths.get(pathStr)).toArray.map(_.toString)
      .map(p => Paths.get(p).getFileName.toString)
      .filter(_.matches("\\d+\\.\\d+\\.\\d+"))
      .toSeq
    import spark.implicits._
    val chunks = spark.createDataset(names).repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { name =>
          val Array(cz, cy, cx) = name.split("\\.").map(_.toInt)
          val bytes = Files.readAllBytes(Paths.get(pathStr, name))
          val buf = java.nio.ByteBuffer.wrap(bytes, 0, HeaderBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val z0 = buf.getLong; val y0 = buf.getLong; val x0 = buf.getLong
          val nz = buf.getInt; val ny = buf.getInt; val nx = buf.getInt
          val rawLen = buf.getInt
          val data = new Array[Byte](rawLen)
          Zstd.decompressByteArray(data, 0, rawLen, bytes, HeaderBytes, bytes.length - HeaderBytes)
          Chunk(cz, cy, cx, z0, y0, x0, nz, ny, nx, data)
        }
      }
    ChunkVolume(chunks, meta)
  }
}
