package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Top-level for MemoryStream's encoder (no outer scope). */
case class ArrivingVec(vec_id: Long, embedding: Array[Float])

/** Streaming semantic dedup against the persisted IVF index: the
  * arriving-shard intake shape. Stream output must equal the batch face
  * on the same arrivals, non-duplicates must pass silently, and the
  * whole pipeline must hold ZERO streaming state (stateless
  * stream-static join — it can run forever at any feed rate).
  */
class EmbeddingStreamsSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  private lazy val idx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_estream_idx").toString
    graft.similarity.Ann.buildIvfIndex(emb, dim = 64, nLists = 16, path = dir)
    dir
  }

  test("stream == batch on a two-batch MemoryStream feed; zero streaming state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // arrivals: 6 exact duplicates of indexed vectors (ids shifted) and
    // 2 novel vectors far from everything (an orthogonal-ish basis spike
    // — the synthetic corpus max pairwise cosine is ~0.51)
    val dups = emb.filter(col("vec_id") < 6)
      .collect().map(r => ArrivingVec(r.getLong(0) + 10000, r.getSeq[Float](1).toArray))
    val novel = Seq(
      ArrivingVec(20001, Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)),
      ArrivingVec(20002, Array.tabulate(64)(i => if (i == 1) -1.0f else 0.0f)))
    val input = MemoryStream[ArrivingVec]
    val query = EmbeddingStreams.dedupAgainstIndex(
        input.toDF(), spark, idx, threshold = 0.999)
      .writeStream.format("memory").queryName("estream_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(dups.take(3).toSeq ++ novel.take(1))
      query.processAllAvailable()
      input.addData(dups.drop(3).toSeq ++ novel.drop(1))
      query.processAllAvailable()
      // ZERO state: stateless stream-static join, no watermark, no store
      assert(query.lastProgress.stateOperators.isEmpty,
        s"expected stateless pipeline, got ${query.lastProgress.stateOperators.length} state operators")
      val got = spark.table("estream_out")
        .select(col("vec_id"), col("dup_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // every duplicate flags exactly its original; novels flag nothing
      assert(got === (0L until 6L).map(i => (i + 10000, i)).toSet)
      // batch face on the SAME arrivals produces the identical output
      val arrivals = (dups ++ novel).toSeq.toDF()
      val batch = EmbeddingStreams.dedupAgainstIndex(arrivals, spark, idx, threshold = 0.999)
        .select(col("vec_id"), col("dup_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === got)
    } finally query.stop()
  }

  test("nProbe widens near-dup recall without changing exact-dup output") {
    import spark.implicits._
    val arrivals = emb.filter(col("vec_id") < 6)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    def pairs(nProbe: Int) = EmbeddingStreams
      .dedupAgainstIndex(arrivals, spark, idx, threshold = 0.999, nProbe = nProbe)
      .select(col("vec_id"), col("dup_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dups live in the arrival's own nearest list: probing more
    // lists may only ADD sub-threshold candidates (none here) — the
    // exact-dup output is nProbe-invariant
    assert(pairs(1) === pairs(4))
  }
}
