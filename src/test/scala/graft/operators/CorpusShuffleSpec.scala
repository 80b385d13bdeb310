package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-shuffle semantics: pure-function placement (seed-sensitive,
  * engine-portable), exact partition of the corpus, contiguous per-shard
  * positions, and the manifest's decorrelation accounting.
  */
class CorpusShuffleSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    // source-contiguous ids — the adversarial raw-crawl ordering
    (0L until 60L).map(i => (i, s"s${i / 20}", s"tok$i word${i % 7}"))
      .toDF("doc_id", "source", "text")
  }

  test("assign partitions the corpus exactly; pos is 1..n_s within each shard") {
    val a = CorpusShuffle.assign(docs, nShards = 4, seed = "sd").cache()
    try {
      assert(a.count() === 60)
      assert(a.select("doc_id").distinct().count() === 60)
      val shards = a.groupBy("shard").agg(count(lit(1)).as("n"), max("pos").as("mx"),
        min("pos").as("mn")).collect()
      assert(shards.map(_.getLong(1)).sum === 60)
      shards.foreach { r =>
        assert(r.getLong(3) === 1L, "pos starts at 1")
        assert(r.getLong(2) === r.getLong(1), "pos is contiguous to n_s")
      }
      // shard ids inside [0, nShards)
      val mm = a.agg(min("shard"), max("shard")).collect().head
      assert(mm.getLong(0) >= 0 && mm.getLong(1) < 4)
    } finally { a.unpersist(); () }
  }

  test("placement is a pure function of (seed, id): re-run identical, seed changes it") {
    val a1 = CorpusShuffle.assign(docs, 4, "sd").select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val a2 = CorpusShuffle.assign(docs, 4, "sd").select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(a1 === a2)
    val b = CorpusShuffle.assign(docs, 4, "other").select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(a1 !== b)
    // and placement does not depend on the input's partitioning
    val c = CorpusShuffle.assign(docs.repartition(7), 4, "sd")
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(a1 === c)
  }

  test("manifest: totals conserve the corpus; shuffle beats the raw order on adjacency") {
    val m = CorpusShuffle.manifest(docs, 4, "sd",
      size(split(col("text"), " ")).cast("bigint")).collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum === 60L)
    assert(m.map(_.getAs[Long]("n_tokens")).sum === 120L) // 2 toks per doc
    // raw crawl order (3 sources × 20 contiguous docs, one shard) would
    // score 57 adjacent same-source pairs; the seeded shuffle must land
    // far below that expectation (p(same) = ~1/3 per adjacent pair)
    val adj = m.map(_.getAs[Long]("same_src_adj")).sum
    assert(adj < 40, s"shuffle left $adj same-source adjacencies of 56 possible")
    // keys bound the shard's order and are hex md5
    m.foreach { r =>
      assert(r.getAs[String]("first_key") <= r.getAs[String]("last_key"))
      assert(r.getAs[String]("first_key").matches("[0-9a-f]{32}"))
    }
  }

  test("single exchange: hash-partition by shard, no global sort in the plan") {
    val a = CorpusShuffle.assign(docs, 4, "sd")
    val plan = a.queryExecution.executedPlan.toString
    // the window's requiredChildDistribution plants exactly one shuffle
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
    assert(!plan.contains("rangepartitioning"), "no global sort / range exchange")
  }
}
