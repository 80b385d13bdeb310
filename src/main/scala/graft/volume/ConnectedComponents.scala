package graft.volume

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** 3D connected-component labeling over a foreground mask — the
  * post-processing step every large-scale segmentation pipeline runs on
  * volumes like the reference's atlas (islands of a label, lesion /
  * soma counting). 6-connectivity, deterministic labels: every
  * component is labeled by the MINIMUM linear voxel id
  * ((z·dimY + y)·dimX + x) it contains, so output is reproducible
  * across partitionings and engines.
  *
  * Two forms, one contract:
  *   - [[voxelForm]]: relational — 3 shifted self-joins build the
  *     adjacency, then the same distributed min-label/pointer-jump CC
  *     the dedup pipeline uses ([[Dedup.connectedComponents]]). Fine
  *     for sparse masks that already live as rows.
  *   - [[chunkForm]]: the scale path — classic two-pass distributed CC
  *     (Kirk et al.-family): a sequential union-find INSIDE each dense
  *     chunk collapses every within-chunk component to its min global
  *     voxel id (one narrow kernel pass, no shuffle), then only FACE
  *     PLANES of local representatives cross the wire (2 planes per
  *     interior face), the tiny rep graph runs distributed CC, and a
  *     broadcast join stamps the global label onto the voxel rows.
  *     The volume body never shuffles; cross-chunk traffic is
  *     O(face area), and the rep graph is bounded by face voxels —
  *     orders of magnitude below the body at any chunk size worth
  *     having.
  */
object ConnectedComponents {

  /** Per-chunk union-find: local component representative (min GLOBAL
    * voxel id of the component within this chunk) for every cell;
    * -1 for background. Path-halving find + min-root union keeps the
    * pass effectively linear.
    */
  private[volume] def localReps(
      data: Array[Byte], nz: Int, ny: Int, nx: Int, bpp: Int, unsigned: Boolean,
      z0: Long, y0: Long, x0: Long, dimY: Long, dimX: Long,
      fg: Long => Boolean,
  ): Array[Long] = {
    val n = nz * ny * nx
    val parent = Array.tabulate(n)(identity)
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      var c = i
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val isFg = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      isFg(i) = fg(ChunkKernels.decodeLong(data, i, bpp, unsigned))
      i += 1
    }
    var z = 0
    while (z < nz) {
      var y = 0
      while (y < ny) {
        var x = 0
        while (x < nx) {
          val idx = (z * ny + y) * nx + x
          if (isFg(idx)) {
            if (x > 0 && isFg(idx - 1)) union(idx, idx - 1)
            if (y > 0 && isFg(idx - nx)) union(idx, idx - nx)
            if (z > 0 && isFg(idx - ny * nx)) union(idx, idx - ny * nx)
          }
          x += 1
        }
        y += 1
      }
      z += 1
    }
    val minG = new Array[Long](n)
    java.util.Arrays.fill(minG, Long.MaxValue)
    i = 0
    while (i < n) {
      if (isFg(i)) {
        val r = find(i)
        val zz = i / (ny * nx); val rem = i % (ny * nx)
        val g = ((z0 + zz) * dimY + (y0 + rem / nx)) * dimX + (x0 + rem % nx)
        if (g < minG(r)) minG(r) = g
      }
      i += 1
    }
    val reps = new Array[Long](n)
    i = 0
    while (i < n) {
      reps(i) = if (isFg(i)) minG(find(i)) else -1L
      i += 1
    }
    reps
  }

  /** Relational form: mask is a DataFrame of foreground (z,y,x) rows.
    * Returns (z,y,x,component). Three shuffle self-joins build the
    * +z/+y/+x adjacency (6-connectivity, no wrap — components must not
    * bleed across the volume boundary); isolated voxels label
    * themselves.
    */
  def voxelForm(mask: DataFrame, dimZ: Long, dimY: Long, dimX: Long): DataFrame = {
    val m = mask.select(col("z"), col("y"), col("x"),
      ((col("z") * dimY + col("y")) * dimX + col("x")).as("id"))
    def shifted(dz: Int, dy: Int, dx: Int): DataFrame =
      m.select((col("z") - dz).as("z"), (col("y") - dy).as("y"), (col("x") - dx).as("x"),
        col("id").as("nbr_id"))
    val edges = Seq((1, 0, 0), (0, 1, 0), (0, 0, 1))
      .map { case (dz, dy, dx) =>
        m.join(shifted(dz, dy, dx), Seq("z", "y", "x"))
          .select(col("id").as("src"), col("nbr_id").as("dst"))
      }
      .reduce(_ unionAll _)
    val cc = Dedup.connectedComponents(edges, "src", "dst")
      .select(col("id").as("cc_id"), col("cluster_rep"))
    m.join(cc, m("id") === cc("cc_id"), "left")
      .select(col("z"), col("y"), col("x"),
        coalesce(col("cluster_rep"), col("id")).as("component"))
  }

  /** Chunk form (scale path): see object doc. `fg` classifies a decoded
    * label as foreground. The union-find kernel deliberately runs twice
    * (once under the voxel-row emitter, once under the face-plane
    * emitter) — recomputing a linear kernel is cheaper at scale than
    * shuffling rep-annotated chunk bodies through a groupByKey just to
    * share one computation.
    */
  def chunkForm(vol: ChunkVolume, fg: Long => Boolean): DataFrame = {
    val meta = vol.meta
    require(!meta.isFloating, "connected components decode integral labels")
    val bpp = meta.bytesPerVoxel
    val unsigned = meta.isUnsigned
    val (dimY, dimX) = (meta.dimY, meta.dimX)
    val (ncz, ncy, ncx) = (meta.ncz, meta.ncy, meta.ncx)
    val spark = vol.chunks.sparkSession
    import spark.implicits._

    // (z, y, x, rep) for every foreground voxel — narrow from the scan
    val voxelRows = vol.chunks.flatMap { c =>
      val reps = localReps(c.data, c.nz, c.ny, c.nx, bpp, unsigned,
        c.z0, c.y0, c.x0, dimY, dimX, fg)
      Iterator.range(0, reps.length).filter(reps(_) >= 0L).map { i =>
        val z = i / (c.ny * c.nx); val rem = i % (c.ny * c.nx)
        (c.z0 + z, c.y0 + rem / c.nx, c.x0 + rem % c.nx, reps(i))
      }
    }.toDF("z", "y", "x", "rep")

    // face-plane exchange: each interior face is a group of exactly two
    // rep planes — the lower chunk's high plane and the upper chunk's
    // low plane — keyed by (lower grid coord, axis). Payload is reps on
    // the face only.
    val faceMsgs = vol.chunks.flatMap { c =>
      val reps = localReps(c.data, c.nz, c.ny, c.nx, bpp, unsigned,
        c.z0, c.y0, c.x0, dimY, dimX, fg)
      def planeZ(z: Int): Array[Long] =
        Array.tabulate(c.ny * c.nx)(i => reps(z * c.ny * c.nx + i))
      def planeY(y: Int): Array[Long] =
        Array.tabulate(c.nz * c.nx)(i => reps(((i / c.nx) * c.ny + y) * c.nx + i % c.nx))
      def planeX(x: Int): Array[Long] =
        Array.tabulate(c.nz * c.ny)(i => reps(i * c.nx + x))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int, Int, Array[Long])]
      // axis codes: 0=z, 1=y, 2=x; side: 0 = lower chunk of the face
      if (c.cz > 0) out += ((c.cz - 1, c.cy, c.cx, 0, 1, planeZ(0)))
      if (c.cz < ncz - 1) out += ((c.cz, c.cy, c.cx, 0, 0, planeZ(c.nz - 1)))
      if (c.cy > 0) out += ((c.cz, c.cy - 1, c.cx, 1, 1, planeY(0)))
      if (c.cy < ncy - 1) out += ((c.cz, c.cy, c.cx, 1, 0, planeY(c.ny - 1)))
      if (c.cx > 0) out += ((c.cz, c.cy, c.cx - 1, 2, 1, planeX(0)))
      if (c.cx < ncx - 1) out += ((c.cz, c.cy, c.cx, 2, 0, planeX(c.nx - 1)))
      out.iterator
    }

    val crossPairs = faceMsgs
      .groupByKey { case (fz, fy, fx, axis, _, _) => (fz, fy, fx, axis) }
      .flatMapGroups { (_, it) =>
        val two = it.toArray
        // boundary faces have one side only at the volume edge guard
        // above, so every group here is exactly the two sides
        val lo = two.find(_._5 == 0).get._6
        val hi = two.find(_._5 == 1).get._6
        Iterator.range(0, lo.length).filter(i => lo(i) >= 0L && hi(i) >= 0L)
          .map(i => (math.min(lo(i), hi(i)), math.max(lo(i), hi(i))))
      }
      .toDF("src", "dst")

    // the rep graph is face-bounded — orders of magnitude below the
    // body; min-propagation is idempotent over the duplicate pairs a
    // shared face emits
    val repMap = Dedup.connectedComponents(crossPairs, "src", "dst")
      .select(col("id").as("rep"), col("cluster_rep"))

    voxelRows.join(F.broadcast(repMap), Seq("rep"), "left")
      .select(col("z"), col("y"), col("x"),
        coalesce(col("cluster_rep"), col("rep")).as("component"))
  }

  /** Small-island removal (despeckling): keep only voxels whose component
    * has ≥ `minVoxels` members. One map-side-combined size agg + one
    * shuffle join on the component key — deliberately NOT a broadcast:
    * at percolation-like densities the surviving-component table is
    * itself proportional to the volume.
    */
  def despeckle(cc: DataFrame, minVoxels: Long): DataFrame = {
    val big = cc.groupBy("component")
      .agg(count(lit(1L)).as("n_voxels"))
      .filter(col("n_voxels") >= minVoxels)
      .select("component")
    cc.join(big, Seq("component"))
      .select(col("z"), col("y"), col("x"), col("component"))
  }
}
