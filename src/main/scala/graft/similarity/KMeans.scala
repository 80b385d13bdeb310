package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) with a CROSS-ENGINE-EXACT
  * arithmetic contract, so a DuckDB oracle can replay the entire training
  * and land on bit-identical assignments:
  *
  *   - vectors are quantized up front to 1e-4 fixed point with FLOOR
  *     (floor of a double is unambiguous on every engine; round() has
  *     half-way knife edges),
  *   - distances are exact BIGINT squared-L2 sums (max 64·(2·10⁴)² ≈
  *     2.6e10 — no overflow, no float accumulation),
  *   - argmin ties break to the smallest cluster index,
  *   - centroid updates are integer mean `sum div n` (both engines
  *     truncate toward zero), and an EMPTY cluster carries its previous
  *     centroid forward,
  *   - init = the k vectors with the smallest ids, in id order.
  *
  * Scale shape: each Lloyd iteration is one narrow assignment projection
  * (centroids ride as plan constants — k·dim literals, the
  * NearestCentroid discipline from [[Ann]]) plus one map-side-combined
  * (cluster, dim) aggregation whose output is k·dim rows — the only
  * driver materialization. At 100 TB the per-iteration cost is a scan +
  * one k·dim-row shuffle; k·dim stays driver-bounded (guarded below).
  * This is the curation-pipeline clustering stage (topic balancing /
  * cluster-based mixing); for pure ANN-index training, [[Ann]]'s
  * sampled double-precision Lloyd is the cheaper fit.
  */
object KMeans {

  /** 1e-4 fixed-point quantization of the embedding column → `q`
    * (ARRAY<BIGINT>). FLOOR, not ROUND: floor(double) is exact and
    * identical on every engine, while round's half-way behavior is a
    * cross-engine knife edge.
    */
  def quantize(embeddings: DataFrame, scale: Int = 10000): DataFrame =
    embeddings.select(
      col("vec_id"),
      expr(s"transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * $scale) AS BIGINT))")
        .as("q"))

  private def d2Expr(c: Array[Long]): Column =
    expr(s"""aggregate(
        zip_with(q, array(${c.mkString("L, ")}L), (a, b) -> (a - b) * (a - b)),
        0L, (acc, x) -> acc + x)""")

  /** Assignment projection against plan-constant centroids: d2 per
    * centroid, cluster = FIRST index achieving the min (array_position
    * finds the first match — the smallest-index tie-break the oracle
    * mirrors with ORDER BY d2, cl).
    */
  private def withAssignment(q: DataFrame, centroids: Array[Array[Long]]): DataFrame = {
    val ds = centroids.map(d2Expr)
    q.withColumn("d2s", array(ds.toIndexedSeq: _*))
      .withColumn("d2", array_min(col("d2s")))
      .withColumn("cluster", (array_position(col("d2s"), col("d2")) - 1).cast("bigint"))
      .drop("d2s")
  }

  /** One centroid update: per-(cluster, dim) integer sums + counts —
    * k·dim result rows, the only collect — then `sum div n` with
    * empty-cluster carry-forward.
    */
  private def update(assigned: DataFrame, old: Array[Array[Long]]): Array[Array[Long]] = {
    val dim = old.head.length
    val rows = assigned
      .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect()
    require(rows.length <= old.length * dim,
      s"centroid update returned ${rows.length} rows for k=${old.length} dim=$dim")
    val next = old.map(_.clone())
    rows.foreach { r =>
      val (cl, pos) = (r.getLong(0).toInt, r.getInt(1))
      next(cl)(pos) = r.getLong(2) / r.getLong(3) // JVM / truncates toward zero == div
    }
    next
  }

  /** Train `iters` Lloyd rounds from the smallest-id init and return the
    * final assignment (vec_id, cluster, d2) — exact integers throughout.
    */
  def fitAssign(embeddings: DataFrame, k: Int, iters: Int, scale: Int = 10000): DataFrame = {
    require(k >= 1 && k <= 4096, s"k must stay plan-constant-sized, got $k")
    val q = quantize(embeddings, scale)
    // init: the k smallest vec_ids, in id order — k rows to the driver
    var centroids: Array[Array[Long]] = q.orderBy(col("vec_id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(centroids.length == k, s"corpus smaller than k=$k")
    var i = 0
    while (i < iters) {
      centroids = update(withAssignment(q, centroids), centroids)
      i += 1
    }
    withAssignment(q, centroids).select(col("vec_id"), col("cluster"), col("d2"))
  }
}
