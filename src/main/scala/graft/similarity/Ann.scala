package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    Query set must be small (it broadcasts); the corpus side streams.
  *  - [[lshBuckets]] / [[lshTopK]]: random-hyperplane LSH. Hyperplane
  *    components are ±1 derived from xxhash64 so the "random" planes are
  *    deterministic, shippable in the plan, and identical on every executor
  *    — no driver-side randomness, no broadcast of plane matrices.
  *
  * At 100 TB the bucketed join shuffles only (bucket, id, vec) rows and
  * each bucket's candidate set is ~corpus/2^nPlanes, giving tunable
  * recall/cost. Multi-probe = union of per-table buckets (nTables seeds).
  *
  * Tuning: per-plane sign agreement for neighbors at angle θ is 1-θ/π, so
  * a table's hit probability is (1-θ/π)^nPlanes and recall ≈
  * 1-(1-p)^nTables. Tight clusters (small θ) tolerate many planes; for
  * weakly-separated corpora drop nPlanes / raise nTables — candidates per
  * query scale as nTables·corpus/2^nPlanes, so recall is bought with
  * candidate volume (measured floor on the near-isotropic harness
  * embeddings: planes=4, tables=8 → recall@5 ≈ 0.64; see AnnSpec).
  */
object Ann {

  private def asDouble(vecCol: String): Column = col(vecCol).cast("array<double>")

  private def norm(e: Column): Column = sqrt(aggregate(e, lit(0.0), (acc, x) => acc + x * x))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), ranked by (rounded) cosine desc with id
    * tie-break. The ranking window partitions by query id, so the sort is
    * per-query, never global.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), asDouble(vecCol).as("qe"))
      .withColumn("qn", norm(col("qe")))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(vecCol).as("ce"))
      .withColumn("cn", norm(col("ce")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    broadcast(q)
      .crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }

  /** Random-hyperplane LSH bucket id (nPlanes sign bits). Plane p's j-th
    * component is ±1 from a splitmix64 stream keyed by (seed, p·dim+j) —
    * the native codegen'd [[graft.functions.LshBucket]] kernel (the
    * interpreted nested-aggregate HOF formulation cost O(planes·dim)
    * lambda evaluations per row).
    */
  def bucketExpr(emb: DataFrame, vecCol: String, nPlanes: Int, seed: Int): Column = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    graft.functions.GraftFunctions.lshBucket(col(vecCol).cast("array<double>"), nPlanes, seed)
  }

  /** Assign each vector its LSH bucket per hash table. */
  def lshBuckets(
      emb: DataFrame,
      dim: Int,
      nPlanes: Int = 12,
      nTables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame =
    emb.select(
      col(idCol) +: (0 until nTables).map(t => bucketExpr(emb, vecCol, nPlanes, t).as(s"bucket_$t")): _*
    )

  /** Recall audit of the LSH path against the exact path: for each query,
    * recall@k = |lshTopK ∩ bruteForceTopK| / k, reported as a boolean
    * against `recallFloor`. Both sides are deterministic (planes derive
    * from xxhash64, ranking tie-breaks on ids), so the result is a pure
    * function of the data — which makes LSH *quality* oracle-checkable:
    * the oracle simply asserts every sampled query meets the floor.
    *
    * Scale shape: this is the sampled quality audit a production corpus
    * runs continuously — exact top-k over a small query sample (broadcast
    * side) vs the bucketed path; never an all-pairs computation.
    */
  def lshRecallVsExact(
      emb: DataFrame,
      dim: Int,
      k: Int,
      queryFilter: Column,
      nPlanes: Int,
      nTables: Int,
      recallFloor: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val exact = bruteForceTopK(emb.filter(queryFilter), emb, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val approx = lshTopK(emb, dim, k, queryFilter, nPlanes, nTables, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    exact
      .join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((sum(coalesce(col("hit"), lit(0L))) / k.toDouble).as("recall"))
      .select(col("query_id"), (col("recall") >= recallFloor).as("recall_floor_met"))
      .orderBy(col("query_id"))
  }

  /** ANN top-k via LSH: candidates = corpus vectors sharing any table's
    * bucket with the query; exact cosine rank within candidates.
    */
  def lshTopK(
      emb: DataFrame,
      dim: Int,
      k: Int,
      queryFilter: Column,
      nPlanes: Int = 12,
      nTables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = lshBuckets(emb, dim, nPlanes, nTables, idCol, vecCol)
      .join(emb.select(col(idCol), asDouble(vecCol).as("e")), Seq(idCol))
      .withColumn("nrm", norm(col("e")))
    val long = bucketed.select(
      col(idCol),
      col("e"),
      col("nrm"),
      explode(array((0 until nTables).map(t => struct(lit(t).as("tbl"), col(s"bucket_$t").as("bucket"))): _*))
        .as("tb"),
    ).select(col(idCol), col("e"), col("nrm"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val q = long.filter(queryFilter)
      .select(col("tbl"), col("bucket"), col(idCol).as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val c = long.select(col("tbl"), col("bucket"), col(idCol).as("neighbor_id"), col("e").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos_sim", round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }
}
