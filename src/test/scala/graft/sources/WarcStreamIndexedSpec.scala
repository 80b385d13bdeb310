package graft.sources

import graft.SparkSpec
import graft.io.{Fio, FioConf}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Contract for [[WarcSource.readStreamIndexed]]: a huge landed
  * `.warc.gz` micro-batches over STAGED range-manifest arrivals
  * (`<file>.warc.gz.ranges/<seq>.idx`), each manifest triggering one
  * incremental batch, and the union over all arrivals equals the batch
  * indexed read of the same member spans — stream == batch, including
  * the member offsets.
  */
class WarcStreamIndexedSpec extends AnyFunSuite with SparkSpec {

  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft_warcstream")
    d.toFile.deleteOnExit()
    val p = d.resolve("land.warc.gz").toString
    val cmd = Seq("python3", "tools/gen_warc_fixture.py", p,
      "/root/testdata/sf0.001", "--limit", "40")
    assert(scala.sys.process.Process(cmd).! === 0)
    d.toString
  }

  test("staged manifest arrivals micro-batch incrementally and match readIndexed") {
    implicit val fc: FioConf = FioConf.of(spark)
    val warc = Fio.child(streamDir, "land.warc.gz")
    val offsets = WarcSource.buildIndex(warc)
    val spans = offsets.zip(offsets.drop(1) :+ Fio.size(warc))
    assert(spans.length >= 4) // meaningful two-wave split
    val (wave1, wave2) = spans.splitAt(spans.length / 2)

    // manifests dir must exist before the text file-stream's first list
    Fio.mkdirs(warc + ".ranges")
    val query = WarcSource.readStreamIndexed(spark, streamDir)
      .writeStream.format("memory").queryName("warc_stream_idx")
      .outputMode("append").start()
    try {
      // ARRIVAL 1: half the members; exactly those rows appear
      WarcSource.writeRangeManifest(warc, 0L, wave1)
      query.processAllAvailable()
      assert(spark.table("warc_stream_idx").count() === wave1.length.toLong)

      // ARRIVAL 2: the remainder lands as a second immutable manifest
      WarcSource.writeRangeManifest(warc, 1L, wave2)
      query.processAllAvailable()

      val streamed = spark.table("warc_stream_idx")
        .select("warc_type", "url", "http_status", "content_type", "body", "member_offset")
        .orderBy("member_offset").collect().toSeq
      val batch = WarcSource.readIndexed(spark, warc, offsets)
        .select("warc_type", "url", "http_status", "content_type", "body", "member_offset")
        .orderBy("member_offset").collect().toSeq
      assert(streamed === batch)
      assert(streamed.length === spans.length)
    } finally query.stop()
  }

  test("malformed manifest line fails loud, not silent row drop") {
    implicit val fc: FioConf = FioConf.of(spark)
    val d = Files.createTempDirectory("graft_warcstream_bad")
    d.toFile.deleteOnExit()
    val warc = Fio.child(d.toString, "land.warc.gz")
    // a real member so openRandom succeeds if parsing got that far
    Files.copy(java.nio.file.Paths.get(Fio.child(streamDir, "land.warc.gz")),
      java.nio.file.Paths.get(warc))
    Fio.mkdirs(warc + ".ranges")
    Fio.writeString(Fio.child(warc + ".ranges", "000000.idx"), "12 notanumber\n")
    val query = WarcSource.readStreamIndexed(spark, d.toString)
      .writeStream.format("memory").queryName("warc_stream_bad")
      .outputMode("append").start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      assert(e.getMessage != null)
    } finally query.stop()
  }
}
