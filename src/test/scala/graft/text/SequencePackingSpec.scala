package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contiguous sequence packing: hand-computed fixture + conservation
  * properties (every token lands in exactly one pack; packs are dense
  * prefixes per shard).
  */
class SequencePackingSpec extends AnyFunSuite with SparkSpec {

  test("packSummary matches the hand-computed packing") {
    import spark.implicits._
    // (source, doc_id, toks): shard a concatenates to 300|300|100, so with
    // seqLen=512 doc 2 starts at token 300 (pack 0) and doc 3 at 600 (pack 1)
    val docs = Seq(
      ("a", 1L, 300), ("a", 2L, 300), ("a", 3L, 100),
      ("b", 4L, 600),
    ).toDF("source", "doc_id", "toks")
    val got = SequencePacking.packSummary(docs, col("toks"), seqLen = 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      ("a", 0L, 2L, 600L, 1L, 2L),
      ("a", 1L, 1L, 100L, 3L, 3L),
      ("b", 0L, 1L, 600L, 4L, 4L),
    ))
  }

  test("token conservation and dense pack ids per shard on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = size(split(col("text"), " "))
    val packs = SequencePacking.packSummary(docs, toks, seqLen = 512).cache()
    try {
      // every token is in exactly one pack
      val packed = packs.agg(sum("n_tokens")).head.getLong(0)
      val total = docs.agg(sum(toks.cast("bigint"))).head.getLong(0)
      assert(packed === total)
      // pack ids are a dense 0..max prefix within each shard
      val gaps = packs.groupBy("source")
        .agg(countDistinct("pack_id").as("n"), (max("pack_id") + 1).as("expected"))
        .filter(col("n") =!= col("expected")).count()
      assert(gaps === 0L)
    } finally packs.unpersist() // a leaked cache entry rewrites OTHER
    // suites' identical plans into InMemoryTableScans (PlanAuditSpec)
  }
}
