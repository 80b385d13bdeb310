package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** WarcSource contract: the indexed-split and sequential scan paths read
  * the foreign python-written fixture identically, buildIndex reproduces
  * the writer's sidecar exactly, record typing/HTTP-body stripping work,
  * and truncated input fails loud.
  */
class WarcSpec extends AnyFunSuite with SparkSpec {

  private lazy val warcPath: String = {
    val d = Files.createTempDirectory("graft_warcspec")
    d.toFile.deleteOnExit()
    val p = d.resolve("fix.warc.gz").toString
    val cmd = Seq("python3", "tools/gen_warc_fixture.py", p,
      "/root/testdata/sf0.001", "--limit", "50")
    assert(scala.sys.process.Process(cmd).! === 0)
    p
  }

  test("indexed and sequential paths agree record-for-record") {
    val idx = WarcSource.read(spark, warcPath)
      .select("warc_type", "url", "http_status", "body").orderBy("url", "warc_type")
      .collect().toSeq
    val seqr = WarcSource.readSequential(spark, Seq(warcPath))
      .select("warc_type", "url", "http_status", "body").orderBy("url", "warc_type")
      .collect().toSeq
    assert(idx === seqr)
    assert(idx.nonEmpty)
  }

  test("buildIndex reproduces the foreign writer's sidecar offsets") {
    val sidecar = Files.readAllLines(Paths.get(warcPath + ".idx"))
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map(_.toLong)
    assert(WarcSource.buildIndex(warcPath) === sidecar)
  }

  test("record typing: warcinfo + request ride along, responses carry stripped HTTP bodies") {
    val df = WarcSource.read(spark, warcPath).cache()
    val byType = df.groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("warcinfo") === 1L && byType("request") === 1L)
    // 50 docs + mirrors for doc_id % 10 == 0 (0,10,20,30,40)
    assert(byType("response") === 55L)
    val resp = df.filter(col("warc_type") === "response").select("http_status", "body")
      .collect()
    assert(resp.forall(_.getInt(0) == 200))
    // HTTP headers stripped: the body starts at the HTML, not the status line
    assert(resp.forall(_.getString(1).startsWith("<html>")))
    df.unpersist()
  }

  test("mirror pages duplicate their originals byte-for-byte") {
    val df = WarcSource.read(spark, warcPath)
    val pairs = df.filter(col("warc_type") === "response")
      .select(col("url"), md5(col("body")).as("h"))
      .withColumn("mirror", col("url").startsWith("https://mirror."))
      .withColumn("key", regexp_replace(col("url"), "^https://mirror\\.", "https://"))
    val joined = pairs.filter(col("mirror")).as("m")
      .join(pairs.filter(!col("mirror")).as("o"), col("m.key") === col("o.url"))
      .select(col("m.h") === col("o.h"))
      .collect()
    assert(joined.length === 5 && joined.forall(_.getBoolean(0)))
  }

  test("writeWet → readDir inverts: per-partition files + sidecars, records intact") {
    import spark.implicits._
    val pages = (0 until 37)
      .map(i => (s"https://s${i % 3}.example.org/doc/$i", s"Doc $i\nbody text $i"))
      .toDF("url", "text").repartition(3)
    val dir = Files.createTempDirectory("graft_wetout_spec")
    dir.toFile.deleteOnExit()
    WarcSource.writeWet(pages, dir.toString)
    val parts = Files.list(dir).toArray.map(_.toString).filter(_.endsWith(".wet.gz"))
    assert(parts.length === 3) // one file per partition
    parts.foreach(p => assert(Files.exists(Paths.get(p + ".idx"))))
    // sidecars are honest: buildIndex reproduces them
    parts.foreach { p =>
      val sidecar = Files.readAllLines(Paths.get(p + ".idx"))
        .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map(_.toLong)
      assert(WarcSource.buildIndex(p) === sidecar)
    }
    val back = WarcSource.readDir(spark, dir.toString)
      .filter(col("warc_type") === "conversion")
      .select("url", "body").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back.size === 37)
    (0 until 37).foreach(i =>
      assert(back(s"https://s${i % 3}.example.org/doc/$i") === s"Doc $i\nbody text $i"))
  }

  test("fuzz: bit flips and truncations parse or fail loud — never misparse silently") {
    val bytes = Files.readAllBytes(Paths.get(warcPath))
    val d = Files.createTempDirectory("graft_warcfuzz")
    d.toFile.deleteOnExit()
    val clean = WarcSource.readSequential(spark, Seq(warcPath))
      .select("warc_type", "url").collect().length
    val cases =
      (1 until 8).map(k => java.util.Arrays.copyOf(bytes, bytes.length * k / 8)) ++
        (0 until bytes.length by (bytes.length / 13)).map { i =>
          val a = bytes.clone(); a(i) = (a(i) ^ 0x41).toByte; a
        }
    cases.zipWithIndex.foreach { case (c, i) =>
      val p = d.resolve(s"f$i.warc.gz")
      Files.write(p, c)
      // any outcome is acceptable EXCEPT silently returning a full,
      // plausible record set from corrupt bytes with no error: either
      // it throws (truncation/framing/gzip), or whatever decodes is a
      // WARC-framing-valid prefix (gzip CRCs + Content-Length framing
      // make a silent full-count misparse practically impossible)
      scala.util.Try(
        WarcSource.readSequential(spark, Seq(p.toString)).collect().length
      ) match {
        case scala.util.Success(n) => assert(n <= clean)
        case scala.util.Failure(_) => () // fail-loud is the expected mode
      }
    }
  }

  test("truncated file fails loud on both paths") {
    val bytes = Files.readAllBytes(Paths.get(warcPath))
    val cut = Files.createTempDirectory("graft_warctrunc").resolve("cut.warc.gz")
    Files.write(cut, java.util.Arrays.copyOf(bytes, bytes.length - 37))
    intercept[Exception](WarcSource.buildIndex(cut.toString))
    intercept[Exception](
      WarcSource.readSequential(spark, Seq(cut.toString)).count())
  }
}
