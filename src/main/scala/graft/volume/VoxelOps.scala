package graft.volume

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long-form (relational) volume operators over a VoxelTable
  * `DataFrame(z: LONG, y: LONG, x: LONG, label: LONG)`.
  *
  * These are the pure-Catalyst expressions of the reference's array kernels
  * (see SURVEY.md §2.7); the chunk-form equivalents (packed binary blocks +
  * local kernels, the scale path for dense volumes) live in
  * [[ChunkVolume]]. Long form is what you want when the volume is sparse or
  * when the result feeds a relational pipeline (joins against the region
  * ontology etc.) — every op below is whole-stage-codegen'd and, except for
  * `outline`, shuffle-free.
  */
object VoxelOps {

  /** Nearest-neighbor integer upscale (reference upscale.py:15–20,
    * `da.repeat` ×3). Each voxel expands to s³ voxels with the same label —
    * expressed as three chained `explode(sequence(...))` generators, a
    * narrow map-side transform with no shuffle at any scale.
    */
  def upscale(vox: DataFrame, s: Int): DataFrame = {
    require(s >= 1, s"scale must be >= 1, got $s")
    vox
      .withColumn("dz", explode(sequence(lit(0L), lit(s - 1L))))
      .withColumn("dy", explode(sequence(lit(0L), lit(s - 1L))))
      .withColumn("dx", explode(sequence(lit(0L), lit(s - 1L))))
      .select(
        (col("z") * s + col("dz")).as("z"),
        (col("y") * s + col("dy")).as("y"),
        (col("x") * s + col("dx")).as("x"),
        col("label"),
      )
  }

  /** Stride-2 decimation — one pyramid level (reference
    * upscale_streaming_enhance.py:125–139: `prev[::2,::2,::2]`, explicitly
    * decimation not averaging). Pure filter+project; the parquet scan only
    * materializes matching rows.
    */
  def decimate(vox: DataFrame): DataFrame =
    vox
      .filter(col("z") % 2 === 0 && col("y") % 2 === 0 && col("x") % 2 === 0)
      .select(
        expr("z div 2").as("z"),
        expr("y div 2").as("y"),
        expr("x div 2").as("x"),
        col("label"),
      )

  /** 2×2×2 MEAN-pooled pyramid level, voxel-table form (see
    * [[ChunkVolume.meanPoolVoxels]] for the chunk form and the
    * decimate-vs-mean contract): one hash-partitioned aggregation over
    * the pooled lattice — partial sums combine map-side, so the shuffle
    * carries ~1/8 of the voxel rows. Floor of the block mean; blocks
    * truncated by the volume edge average their in-range voxels.
    */
  def meanPool(vox: DataFrame): DataFrame =
    vox
      .groupBy(
        expr("z div 2").as("z"),
        expr("y div 2").as("y"),
        expr("x div 2").as("x"))
      .agg(expr("sum(label) div count(1)").as("label"))

  /** 2×2×2 MAX-pooled pyramid level, voxel-table form — the third member
    * of the pooling family (decimate = label volumes, mean = intensity
    * volumes, max = masks / distance maps, where any-hit per block must
    * survive the downscale). Same single hash-partitioned aggregation
    * shape as [[meanPool]]: max partials combine map-side, the shuffle
    * carries ~1/8 of the voxel rows.
    */
  def maxPool(vox: DataFrame): DataFrame =
    vox
      .groupBy(
        expr("z div 2").as("z"),
        expr("y div 2").as("y"),
        expr("x div 2").as("x"))
      .agg(max(col("label")).as("label"))

  /** 3×3×3 box-filter SUM, voxel-table form — scatter/gather: every voxel
    * contributes its label to the 27 cells around it (three generator
    * explodes), out-of-volume targets are dropped (ZERO padding at the
    * volume edge — a blur must not wrap), and one hash aggregation sums
    * per target cell. The 27× row amplification collapses map-side
    * (partial aggregation), so the shuffle carries ~1 row per voxel.
    * The chunk form ([[ChunkVolume.boxSumVoxels]]) is the scale path —
    * it moves only shell slabs plus the body once.
    */
  def boxSum3(vox: DataFrame, dimZ: Long, dimY: Long, dimX: Long): DataFrame =
    vox
      .select(col("z"), col("y"), col("x"), col("label"),
        explode(sequence(lit(-1), lit(1))).as("dz"))
      .select(col("z"), col("y"), col("x"), col("label"), col("dz"),
        explode(sequence(lit(-1), lit(1))).as("dy"))
      .select((col("z") + col("dz")).as("z"), (col("y") + col("dy")).as("y"),
        col("x"), col("label"),
        explode(sequence(lit(-1), lit(1))).as("dx"))
      .select(col("z"), col("y"), (col("x") + col("dx")).as("x"), col("label"))
      .filter(col("z") >= 0 && col("z") < dimZ
        && col("y") >= 0 && col("y") < dimY
        && col("x") >= 0 && col("x") < dimX)
      .groupBy(col("z"), col("y"), col("x"))
      .agg(sum(col("label")).as("boxsum"))

  /** Scatter every voxel to itself + its 6 face neighbors (the cross
    * structuring element), dropping out-of-volume targets — the shared
    * generator behind [[erode6]]/[[dilate6]]. The 7× amplification
    * collapses map-side exactly like [[boxSum3]]'s.
    */
  private def scatter6(vox: DataFrame, dimZ: Long, dimY: Long, dimX: Long): DataFrame =
    vox
      .select(col("z"), col("y"), col("x"), col("label"),
        explode(expr(
          "array(array(0,0,0), array(1,0,0), array(-1,0,0), array(0,1,0), array(0,-1,0), array(0,0,1), array(0,0,-1))"))
          .as("d"))
      .select(
        (col("z") + col("d").getItem(0)).as("z"),
        (col("y") + col("d").getItem(1)).as("y"),
        (col("x") + col("d").getItem(2)).as("x"),
        col("label"))
      .filter(col("z") >= 0 && col("z") < dimZ
        && col("y") >= 0 && col("y") < dimY
        && col("x") >= 0 && col("x") < dimX)

  /** 6-neighbor grayscale EROSION (min over self + face neighbors),
    * voxel-table form. Out-of-volume reads as background 0: a target that
    * received fewer than 7 contributions sits on the volume border, so its
    * min includes the implicit 0 — `when(cnt < 7, 0)` realizes the zero
    * pad without materializing it. Requires nonnegative labels (store
    * dtypes are unsigned). One map-side-combined (min, count) aggregation;
    * the chunk form ([[ChunkVolume.erodeVoxels]]) moves face planes only.
    */
  def erode6(vox: DataFrame, dimZ: Long, dimY: Long, dimX: Long): DataFrame =
    scatter6(vox, dimZ, dimY, dimX)
      .groupBy(col("z"), col("y"), col("x"))
      .agg(min(col("label")).as("mn"), count(lit(1)).as("cnt"))
      .select(col("z"), col("y"), col("x"),
        when(col("cnt") < 7, lit(0L)).otherwise(col("mn")).as("label"))

  /** 6-neighbor grayscale DILATION (max over self + face neighbors),
    * voxel-table form. The implicit zero pad never wins a max on a
    * nonnegative volume, so no border correction is needed.
    */
  def dilate6(vox: DataFrame, dimZ: Long, dimY: Long, dimX: Long): DataFrame =
    scatter6(vox, dimZ, dimY, dimX)
      .groupBy(col("z"), col("y"), col("x"))
      .agg(max(col("label")).as("label"))

  /** Morphological OPENING (erode then dilate) with the 6-neighbor cross —
    * the classic despeckle: isolated foreground thinner than the
    * structuring element vanishes, bulk shapes survive with their border
    * shell restored. Two stencil aggregations back to back.
    */
  def open6(vox: DataFrame, dimZ: Long, dimY: Long, dimX: Long): DataFrame =
    dilate6(erode6(vox, dimZ, dimY, dimX), dimZ, dimY, dimX)

  /** Morphological CLOSING (dilate then erode) with the 6-neighbor cross —
    * fills holes and gaps thinner than the structuring element while the
    * background bulk survives; the dual of [[open6]].
    */
  def close6(vox: DataFrame, dimZ: Long, dimY: Long, dimX: Long): DataFrame =
    erode6(dilate6(vox, dimZ, dimY, dimX), dimZ, dimY, dimX)

  /** Distance transform by erosion peeling, capped at `cap`: depth =
    * min(manhattan distance to the nearest background voxel or volume
    * border, cap) for foreground, 0 for background. Voxel-table form:
    * cap−1 CHAINED erosion aggregations (one shuffle each) whose 0/1
    * masks sum per voxel — the chunk form
    * ([[ChunkVolume.erosionDepthVoxels]]) folds all rounds into ONE
    * thickness-(cap−1) halo exchange and is the scale path.
    */
  def erosionDepth(vox: DataFrame, dimZ: Long, dimY: Long, dimX: Long, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val mask0 = vox.select(col("z"), col("y"), col("x"),
      when(col("label") =!= 0, lit(1L)).otherwise(lit(0L)).as("label"))
    val masks = Iterator.iterate(mask0)(m => erode6(m, dimZ, dimY, dimX))
      .take(cap).toSeq
    masks.reduce(_ unionAll _)
      .groupBy(col("z"), col("y"), col("x"))
      .agg(sum(col("label")).as("depth"))
  }

  /** Full pyramid: level 0 is the input, level i is decimate(level i-1).
    * Returns one DataFrame with a `level` column.
    */
  def pyramid(vox: DataFrame, levels: Int): DataFrame = {
    require(levels >= 1, s"levels must be >= 1, got $levels")
    (1 until levels)
      .scanLeft(vox)((prev, _) => decimate(prev))
      .zipWithIndex
      .map { case (df, i) => df.withColumn("level", lit(i)) }
      .reduce(_ unionAll _)
  }

  /** Outline / edge-voxel extraction (reference
    * upscale_streaming_enhance.py:107–119): keep a voxel's label iff it
    * differs from at least one of its 6 face neighbors, else 0. The
    * reference uses `da.roll`, which WRAPS AROUND volume edges — parity
    * requires modular neighbor coordinates, hence the self-joins on
    * `(z±1) mod dimZ` rather than null-padded lag/lead windows.
    *
    * Cost: 6 equi-joins of the voxel table against itself. At 100 TB you'd
    * use the chunk-form halo exchange ([[ChunkVolume.outline]]) which only
    * shuffles face planes; this form is for sparse/relational inputs.
    */
  def outline(vox: DataFrame, dimZ: Long, dimY: Long, dimX: Long): DataFrame = {
    // Precompute each voxel's 6 modular neighbor coordinates, then join the
    // voxel table back on each to fetch the neighbor label.
    val withNbrCoords = vox
      .withColumn("c_zp", (col("z") + 1) % dimZ)
      .withColumn("c_zm", (col("z") + (dimZ - 1)) % dimZ)
      .withColumn("c_yp", (col("y") + 1) % dimY)
      .withColumn("c_ym", (col("y") + (dimY - 1)) % dimY)
      .withColumn("c_xp", (col("x") + 1) % dimX)
      .withColumn("c_xm", (col("x") + (dimX - 1)) % dimX)
    val joined = Seq(
      ("zp", "c_zp", "y", "x"),
      ("zm", "c_zm", "y", "x"),
      ("yp", "z", "c_yp", "x"),
      ("ym", "z", "c_ym", "x"),
      ("xp", "z", "y", "c_xp"),
      ("xm", "z", "y", "c_xm"),
    ).foldLeft(withNbrCoords) { case (acc, (name, zc, yc, xc)) =>
      val nbr = vox.select(
        col("z").as(s"z_$name"),
        col("y").as(s"y_$name"),
        col("x").as(s"x_$name"),
        col("label").as(s"l_$name"),
      )
      // left_outer: a voxel whose neighbor coordinate is absent from a
      // sparse input must still appear; a missing neighbor counts as a
      // boundary (label differs) below.
      acc
        .join(nbr, col(zc) === col(s"z_$name") && col(yc) === col(s"y_$name") && col(xc) === col(s"x_$name"), "left_outer")
        .drop(s"z_$name", s"y_$name", s"x_$name")
    }
    val differs = Seq("zp", "zm", "yp", "ym", "xp", "xm")
      .map(n => coalesce(col(s"l_$n") =!= col("label"), lit(true)))
      .reduce(_ || _)
    joined.select(
      col("z"),
      col("y"),
      col("x"),
      when(differs, col("label")).otherwise(lit(0L)).as("out_label"),
    )
  }

  /** Per-axis nearest-neighbor resize to an ARBITRARY target shape
    * (reference anno_upsampling.py:40–67: target dims probed from another
    * image, PIL NEAREST per slice — T6/S7). Builds the target grid and
    * gathers each target voxel's source label through an equi-join on the
    * floor-mapped source coordinate: `src = floor(tgt · srcDim / tgtDim)`.
    * Both sides shuffle once on (z,y,x); no driver materialization.
    */
  def resizeNearest(
      vox: DataFrame,
      srcZyx: (Long, Long, Long),
      tgtZyx: (Long, Long, Long),
  ): DataFrame = {
    val (sz, sy, sx) = srcZyx
    val (tz, ty, tx) = tgtZyx
    val spark = vox.sparkSession
    val tgt = spark.range(tz * ty * tx).select(
      expr(s"id div ${ty * tx}").as("tz"),
      expr(s"(id div $tx) % $ty").as("ty"),
      expr(s"id % $tx").as("tx"),
    ).select(
      col("tz"), col("ty"), col("tx"),
      expr(s"(tz * $sz) div $tz").as("sz"),
      expr(s"(ty * $sy) div $ty").as("sy"),
      expr(s"(tx * $sx) div $tx").as("sx"),
    )
    tgt.join(vox, col("sz") === col("z") && col("sy") === col("y") && col("sx") === col("x"))
      .select(col("tz").as("z"), col("ty").as("y"), col("tx").as("x"), col("label"))
  }

  /** Virtual +90° rotation in the (z,y) plane (reference np.rot90 on
    * axes (0,1), anno_upsampling.py:84,100): (z,y,x) → (dimY-1-y, z, x).
    * A pure coordinate projection — free in the relational representation,
    * which is exactly why the reference's 2-pass PIL trick is unnecessary
    * here (SURVEY §2.7 T7).
    */
  def rotate90(vox: DataFrame, dimY: Long): DataFrame =
    vox.select(
      (lit(dimY - 1) - col("y")).as("z"),
      col("z").as("y"),
      col("x"),
      col("label"),
    )

  /** Label histogram (the README's before/after frequency figures —
    * SURVEY.md §2.5 A-row): classic partial+final hash aggregate.
    */
  def histogram(vox: DataFrame): DataFrame =
    vox.groupBy(col("label")).agg(count(lit(1)).as("n")).orderBy(col("label"))

  /** Voxel label → region-ontology lookup join (reference lookup_test2.py
    * :21–29, view_with_labels.py:22–28): left-outer broadcast hash join with
    * "Unknown region ID: <id>" on miss. `regions` is the 2,692-row ontology
    * — always broadcast, never shuffles the voxel side.
    */
  def regionLookup(vox: DataFrame, regions: DataFrame, keyCol: String, nameCol: String): DataFrame =
    vox
      .join(broadcast(regions), vox("label") === regions(keyCol), "left_outer")
      .withColumn(
        "region_name",
        coalesce(col(nameCol), concat(lit("Unknown region ID: "), col("label").cast("string"))),
      )

  /** One row per face between an adjacent voxel PAIR, scanning only the 3
    * positive directions so each unordered pair appears exactly once —
    * the shared adjacency stream behind [[regionSurface]] and
    * [[regionAdjacency]]. 3 shuffle equi-joins on shifted coordinates
    * (the same shape the CC voxel form uses to build its edge list).
    */
  private def facePairs(vox: DataFrame): DataFrame =
    Seq((1, 0, 0), (0, 1, 0), (0, 0, 1)).map { case (dz, dy, dx) =>
      val b = vox.select(
        col("z").as("bz"), col("y").as("by"), col("x").as("bx"),
        col("label").as("lb"))
      vox.join(b,
        col("z") + lit(dz) === col("bz")
          && col("y") + lit(dy) === col("by")
          && col("x") + lit(dx) === col("bx"))
        .select(col("label").as("la"), col("lb"))
    }.reduce(_ unionAll _)

  /** Per-label region properties (scikit-image `regionprops` analog for
    * label volumes): voxel count, axis-aligned bounding box, and centroid
    * in 1e-4 fixed point (floor(sum·10⁴ / n) — exact integers on both
    * engines). ONE map-side-combined aggregation over the label key.
    */
  def regionProps(vox: DataFrame): DataFrame =
    vox.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_voxels"),
        min(col("z")).as("z_min"), max(col("z")).as("z_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        sum(col("z")).as("sz"), sum(col("y")).as("sy"), sum(col("x")).as("sx"))
      .select(
        col("label"), col("n_voxels"),
        col("z_min"), col("z_max"), col("y_min"), col("y_max"),
        col("x_min"), col("x_max"),
        expr("(sz * 10000) div n_voxels").as("cz_e4"),
        expr("(sy * 10000) div n_voxels").as("cy_e4"),
        expr("(sx * 10000) div n_voxels").as("cx_e4"))

  /** Exposed surface area per label, in faces: each voxel has 6 faces;
    * a face is INTERNAL iff the face neighbor exists and shares the label,
    * so surface = 6·n_voxels − 2·(same-label adjacent pairs). Volume-border
    * and background-adjacent faces count as exposed (outside = background).
    * The pair stream scans only positive directions — no double counting,
    * no per-voxel 6-way join.
    */
  def regionSurface(vox: DataFrame): DataFrame = {
    val n = vox.groupBy(col("label")).agg(count(lit(1)).as("n_voxels"))
    val same = facePairs(vox)
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("internal_pairs"))
    n.join(same, Seq("label"), "left_outer")
      .select(
        col("label"), col("n_voxels"),
        (col("n_voxels") * 6 - coalesce(col("internal_pairs"), lit(0L)) * 2)
          .as("surface_faces"))
  }

  /** Region adjacency graph: one row per unordered label pair that shares
    * at least one face, with the shared-face count — which atlas regions
    * border which, and by how much contact area. Same pair stream as
    * [[regionSurface]], filtered to label-crossing faces.
    */
  def regionAdjacency(vox: DataFrame): DataFrame =
    facePairs(vox)
      .filter(col("la") =!= col("lb"))
      .select(least(col("la"), col("lb")).as("label_a"),
        greatest(col("la"), col("lb")).as("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(count(lit(1)).as("n_faces"))

  /** Maximum-intensity projection along z (the standard 2-D review image
    * for a 3-D stack): one map-side-combined MAX aggregation onto the
    * (y,x) lattice — the shuffle carries one row per output pixel.
    */
  def mipZ(vox: DataFrame): DataFrame =
    vox.groupBy(col("y"), col("x")).agg(max(col("label")).as("label"))

  /** Per-label intensity statistics of a SECOND voxel table (columns
    * z,y,x,intensity) under this label volume — the voxel-table face of
    * [[ChunkVolume.regionStatsAgainst]]: one coordinate equi-join + one
    * map-side-combined aggregation on the label key.
    */
  def regionIntensityStats(labels: DataFrame, intensity: DataFrame): DataFrame =
    labels
      .join(intensity, Seq("z", "y", "x"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_voxels"),
        sum(col("intensity")).as("sum_i"),
        min(col("intensity")).as("min_i"),
        max(col("intensity")).as("max_i"))
}
