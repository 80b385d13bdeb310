package graft.sources

import graft.volume.AtomicDir
import java.nio.file.{Files, Path, StandardCopyOption}

/** Where a DSv2 chunk-store batch write (zarr, graftchunks) stages files
  * and how job commit publishes them atomically:
  *
  *  - [[StoreStaging.Swap]] (overwrite / fresh store): build the whole
  *    store in a temp sibling, publish with O(1) renames via
  *    [[AtomicDir]]. A job failure leaves the destination untouched.
  *  - [[StoreStaging.Append]]: stage chunk files under a fixed hidden
  *    `.__staging/<id>/` inside the store, publish per-file atomic
  *    renames at commit — O(chunks written by THIS job) metadata work,
  *    bounded by the append, not the store. Readers never see staging
  *    (they address chunks by coordinate and never list).
  *
  * `commit(finalize)` runs the builder's finalizer (e.g. the graftchunks
  * stats-index merge) against the staged tree BEFORE a swap publishes
  * it, or against the destination AFTER an append lands its files — so
  * a store is never visible with missing store-level metadata.
  */
private[sources] sealed trait StoreStaging {
  /** Directory tasks (and driver-side store init) write into. */
  def writeDir: Path
  def commit(finalize: Path => Unit): Unit
  def abort(): Unit
}

private[sources] object StoreStaging {

  /** Overwrite / fresh store: build in a temp sibling, swap at commit. */
  final case class Swap(dest: Path) extends StoreStaging {
    val writeDir: Path = AtomicDir.tempSibling(dest)
    override def commit(finalize: Path => Unit): Unit = {
      finalize(writeDir)
      AtomicDir.publish(writeDir, dest)
    }
    override def abort(): Unit = AtomicDir.deleteInBackground(writeDir)
  }

  /** Append to an existing store. Creating the staging dir sweeps
    * `.__staging/<id>` leftovers a crashed earlier append abandoned —
    * listing O(crashed jobs) entries, never the store's chunk files.
    */
  final case class Append(dest: Path) extends StoreStaging {
    private val stagingRoot = dest.resolve(".__staging")
    val writeDir: Path = {
      if (Files.isDirectory(stagingRoot)) {
        val it = Files.list(stagingRoot)
        try it.forEach(p => AtomicDir.deleteInBackground(p)) finally it.close()
      }
      stagingRoot.resolve(java.util.UUID.randomUUID().toString.take(8))
    }
    override def commit(finalize: Path => Unit): Unit = {
      val it = Files.list(writeDir)
      try it.forEach { staged =>
        Files.move(staged, dest.resolve(staged.getFileName),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      } finally it.close()
      Files.delete(writeDir)
      // drop the (now usually empty) staging root; a concurrent writer's
      // live dir makes this fail harmlessly
      try Files.delete(stagingRoot) catch { case _: java.io.IOException => () }
      finalize(dest)
    }
    override def abort(): Unit = AtomicDir.deleteInBackground(writeDir)
  }
}
