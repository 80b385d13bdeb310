package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the embeddings schema: semantic dedup of an
  * ARRIVING vector feed against a PERSISTED IVF index
  * ([[graft.similarity.Ann.buildIvfIndex]]) — the production intake
  * shape. A 100 TB corpus does not re-cluster itself when a new shard
  * lands; the shard streams through centroid routing and an exact-cosine
  * check against the existing index, and duplicates are flagged with
  * ZERO streaming state:
  *
  *  - routing is the plan-constant [[graft.functions.NearestCentroid]] /
  *    ProbeLists expression (no lookup table, no state),
  *  - the index join is STREAM-STATIC (stateless by construction — no
  *    watermark, no state store; the static side re-plans per
  *    micro-batch, so an index refresh is picked up on the next batch),
  *  - the cosine filter and projection are per-row kernels.
  *
  * The same plan runs on a batch frame (the registered oracle face);
  * EmbeddingStreamsSpec proves stream==batch on a MemoryStream feed and
  * pins `stateOperators == 0` — this pipeline can run forever at any
  * feed rate without accumulating anything.
  */
object EmbeddingStreams {

  /** Flag arrivals whose cosine against an indexed vector clears
    * `threshold`: (vec_id, dup_id, list_id) per matched index entry,
    * dup_id = the indexed neighbor. `nProbe` routes each arrival to its
    * nearest lists (identical vectors share list 1 deterministically, so
    * exact-dup recall is exact at any nProbe; raise it for near-dup
    * recall, the IVF operating dial).
    */
  def dedupAgainstIndex(
      arrivals: DataFrame,
      spark: SparkSession,
      indexPath: String,
      threshold: Double,
      nProbe: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val centroids = graft.similarity.Ann.loadIvfCentroids(spark, indexPath)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftFunctions.dot(a, b)
    val probes = arrivals
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
      .withColumn("list_id", explode(GraftFunctions.probeLists(col("qe"), centroids, nProbe)))
    val lists = spark.read.parquet(s"$indexPath/lists")
      .select(col("list_id"), col("id").as("dup_id"), col("e").as("ce"), col("nrm").as("cn"))
    probes.join(lists, Seq("list_id"))
      .withColumn("cos_sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_id"), col("dup_id"), col("list_id"))
  }
}
