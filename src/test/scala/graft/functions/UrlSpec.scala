package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization + registrable-domain contract: case/port/
  * fragment/tracking-param normalization, pass-through of unparseable
  * input, the full PSL algorithm (longest rule, wildcard, exception,
  * default rule), IP hosts, and codegen parity through the registered
  * SQL functions.
  */
class UrlSpec extends AnyFunSuite with SparkSpec {

  private def canon(s: String): String =
    UrlOps.canonicalize(UTF8String.fromString(s)).toString

  private def dom(s: String): String = {
    val r = UrlOps.registrableDomain(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }

  test("canonicalize: case, default ports, fragments, tracking params, empty path") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b?x=1#frag") ===
      "https://www.example.com/A/b?x=1")
    assert(canon("http://example.com:80") === "http://example.com/")
    assert(canon("http://example.com:8080/p") === "http://example.com:8080/p")
    assert(canon("https://e.com/p?utm_source=a&id=2&utm_campaign=b&fbclid=z") ===
      "https://e.com/p?id=2")
    assert(canon("https://e.com/p?utm_source=a") === "https://e.com/p")
    // query order preserved, path case preserved
    assert(canon("https://e.com/CaseSensitive?b=2&a=1") ===
      "https://e.com/CaseSensitive?b=2&a=1")
    // trailing host dot, userinfo preserved, ftp default port
    assert(canon("https://u:p@Example.COM./x") === "https://u:p@example.com/x")
    assert(canon("FTP://Host.Org:21/f") === "ftp://host.org/f")
    // IPv6 literal host with non-default port
    assert(canon("https://[2001:DB8::1]:8443/x") === "https://[2001:db8::1]:8443/x")
  }

  test("canonicalize: unparseable input passes through trimmed, never destroyed") {
    assert(canon("  not a url  ") === "not a url")
    assert(canon("mailto:a@b.com") === "mailto:a@b.com")
    assert(canon("://missing-scheme") === "://missing-scheme")
  }

  test("registrable domain: plain, multi-label, and private-registry suffixes") {
    assert(dom("https://www.news.example.com/x") === "example.com")
    assert(dom("https://a.b.example.co.uk/") === "example.co.uk")
    assert(dom("https://foo.github.io/repo") === "foo.github.io")
    assert(dom("https://deep.sub.foo.github.io/") === "foo.github.io")
    assert(dom("https://my-bucket.s3.amazonaws.com/") === "my-bucket.s3.amazonaws.com")
    // bare host input (no scheme) also keys
    assert(dom("www.example.org") === "example.org")
    // unknown TLD -> default '*' rule: last label is the suffix
    assert(dom("https://x.example.zz/") === "example.zz")
  }

  test("registrable domain: PSL wildcard and exception rules") {
    // *.ck: every label under ck is a suffix -> need TWO labels above ck
    assert(dom("https://a.b.anything.ck/") === "a.b.anything.ck".split('.').takeRight(3).mkString("."))
    assert(dom("https://b.anything.ck/") === "b.anything.ck")
    // !www.ck exception: www.ck is registrable (suffix shifts to 'ck')
    assert(dom("https://www.ck/") === "www.ck")
    assert(dom("https://sub.www.ck/") === "www.ck")
  }

  test("registrable domain: IP hosts return themselves; suffix-only hosts return null") {
    assert(dom("http://192.168.0.1:8080/x") === "192.168.0.1")
    assert(dom("https://[2001:db8::1]/x") === "[2001:db8::1]")
    assert(dom("https://co.uk/") === null)
    assert(dom("https://com/") === null)
    assert(dom("not a url") === null)
  }

  test("canonicalize: bare `ref` is a legitimate query param, not tracking") {
    assert(canon("https://e.com/p?ref=homepage&id=2") ===
      "https://e.com/p?ref=homepage&id=2")
    // ref_src and utm_* are still unambiguous tracking params
    assert(canon("https://e.com/p?ref_src=twsrc&utm_medium=x&id=2") ===
      "https://e.com/p?id=2")
  }

  test("registrable domain: bare host with a port strips the port before the PSL walk") {
    assert(dom("www.example.com:8080") === "example.com")
    assert(dom("example.co.uk:443") === "example.co.uk")
    // a trailing :segment that is NOT numeric is not a port — pass-through semantics
    assert(dom("example.com:notaport") === "example.com:notaport")
  }

  test("registrable domain: IDN hosts fold UTF-8 and punycode spellings to one key") {
    // 中国 is published on the PSL as xn--fiqs8s: both spellings must key identically
    assert(dom("https://news.example.中国/x") === "example.xn--fiqs8s")
    assert(dom("https://news.example.xn--fiqs8s/x") === "example.xn--fiqs8s")
    assert(dom("https://NEWS.Example.中国/x") === "example.xn--fiqs8s")
    // an IDN label ABOVE the suffix also folds (bücher -> xn--bcher-kva)
    assert(dom("https://www.bücher.de/kat") === "xn--bcher-kva.de")
    assert(dom("https://www.xn--bcher-kva.de/kat") === "xn--bcher-kva.de")
  }

  test("codegen parity: the registered SQL functions agree with the direct kernels") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/A?utm_source=x&id=1#f",
      "https://deep.sub.foo.github.io/",
      "https://a.b.anything.ck/",
      "not a url")
    val out = urls.toDF("u")
      .select(GraftFunctions.urlCanon(col("u")).as("c"),
        GraftFunctions.regDomain(col("u")).as("d"))
      .collect()
    urls.zip(out).foreach { case (u, r) =>
      assert(r.getString(0) === canon(u), s"canon($u)")
      assert(Option(r.getString(1)).orNull === dom(u), s"dom($u)")
    }
  }
}
