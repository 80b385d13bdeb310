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

  /** Reference FFD, written independently of the kernel: same
    * deterministic order (toks DESC, md5 rank, id), first bin with room.
    */
  private def referenceFfd(items: Seq[(Long, Long)], cap: Long): Map[Long, Long] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val ordered = items.sortBy { case (id, t) => (-t, md5hex(id.toString), id) }
    val rem = scala.collection.mutable.ArrayBuffer[Long]()
    val out = scala.collection.mutable.Map[Long, Long]()
    for ((id, t) <- ordered) {
      val i = rem.indexWhere(_ >= t)
      if (i < 0) { rem += (cap - t); out(id) = rem.length - 1L }
      else { rem(i) -= t; out(id) = i.toLong }
    }
    out.toMap
  }

  test("packFirstFitDecreasing matches an independent reference FFD; no doc splits") {
    import spark.implicits._
    val docs = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 250L), ("a", 4L, 200L),
      ("a", 5L, 100L), ("a", 6L, 60L), ("a", 7L, 700L), // oversized
      ("b", 8L, 10L), ("b", 9L, 512L), ("b", 10L, 0L), // exact fit + empty doc
    ).toDF("source", "doc_id", "toks")
    val got = SequencePacking.packFirstFitDecreasing(docs, col("toks"), seqLen = 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc appears exactly once (whole — never split)
    assert(got.map(_._2).sorted.toSeq === (1L to 10L).toSeq)
    val byShard = got.groupBy(_._1)
    for ((shard, rows) <- byShard) {
      val expect = referenceFfd(rows.map(r => (r._2, r._3)).toSeq, 512L)
      assert(rows.map(r => r._2 -> r._4).toMap === expect, s"shard $shard diverged")
    }
    // an oversized doc sits alone in its bin
    val aRows = byShard("a")
    val oversizedBin = aRows.find(_._2 == 7L).get._4
    assert(aRows.count(_._4 == oversizedBin) === 1)
    // no bin (except an oversized one) exceeds capacity
    for ((_, rows) <- byShard; (bin, binRows) <- rows.groupBy(_._4)) {
      val tot = binRows.map(_._3).sum
      assert(tot <= 512L || binRows.length == 1, s"bin $bin overflows: $tot")
    }
  }

  test("FFD padding waste undercuts in-order next-fit on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = size(split(col("text"), " "))
    val cap = 512L
    val summary = SequencePacking.ffdPackSummary(docs, toks, seqLen = 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(6)))
    val ffdWaste = summary.map(_._4).sum
    // reference in-order next-fit (doc_id order, no splits): the naive
    // alternative a pipeline would otherwise ship
    val perDoc = docs.select(col("source"), col("doc_id"), toks.cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    var nfWaste = 0L
    for ((_, rows) <- perDoc.groupBy(_._1)) {
      var rem = 0L
      var opened = false
      for ((_, _, t) <- rows.sortBy(_._2)) {
        if (!opened || rem < t) {
          if (opened) nfWaste += math.max(rem, 0L)
          rem = cap - t
          opened = true
        } else rem -= t
      }
      if (opened) nfWaste += math.max(rem, 0L)
    }
    assert(ffdWaste < nfWaste,
      s"FFD waste $ffdWaste should undercut next-fit waste $nfWaste")
    // conservation: every token lands in exactly one bin
    val packed = summary.map(_._3).sum
    val total = docs.agg(sum(toks.cast("bigint"))).head.getLong(0)
    assert(packed === total)
  }
}
