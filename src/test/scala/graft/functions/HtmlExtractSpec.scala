package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class HtmlExtractSpec extends AnyFunSuite with SparkSpec {

  private def x(html: String): String =
    HtmlText.extract(UTF8String.fromString(html)).toString

  test("boilerplate subtrees are removed whole; main content survives") {
    val html =
      "<html><head><title>T</title><style>p{x:1}</style>" +
        "<script>if(1<2&&3>2){track(\"u\")}</script></head>" +
        "<body><header><h1>Chrome</h1></header>" +
        "<nav><ul><li><a href=\"/\">Home</a></li></ul></nav>" +
        "<div><h1>Title</h1><p>Hello world</p></div>" +
        "<footer><p>legal</p></footer></body></html>"
    assert(x(html) === "Title\nHello world")
  }

  test("inline tags separate words, block closes become line breaks") {
    assert(x("<p>A <b>bold</b> move</p><p>next</p>") === "A bold move\nnext")
    assert(x("line one<br>line two<br/>line three") === "line one\nline two\nline three")
  }

  test("entities decode once, &amp; last; unknown entities pass through") {
    assert(x("Tom &amp; Jerry &lt;3 &quot;hi&quot; &#39;q&#39; &#x41; &nbsp;end") ===
      "Tom & Jerry <3 \"hi\" 'q' A end")
    // double-escaped text single-decodes: &amp;lt; -> &lt; (NOT '<')
    assert(x("a &amp;lt; b") === "a &lt; b")
    assert(x("5 &undefined; 7 & 8") === "5 &undefined; 7 & 8")
  }

  test("comments do not leak, even when they contain tags") {
    assert(x("<p>keep</p><!-- <div>ghost</div> --><p>also</p>") === "keep\nalso")
  }

  test("whitespace collapses; blank lines drop; null and empty are safe") {
    assert(x("  <p>  a   b  </p>  \n\n  <p></p> <p>c</p>") === "a b\nc")
    assert(x("") === "")
    assert(x("plain text, no markup") === "plain text, no markup")
  }

  test("registered function is codegen'd and matches the kernel on a DataFrame") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      "<div><p>doc one</p></div>",
      "<head><title>drop</title></head><p>doc &amp; two</p>",
    ).toDF("html")
    val got = rows.select(GraftFunctions.htmlExtract(col("html")).as("t"))
      .as[String].collect().toSeq
    assert(got === Seq("doc one", "doc & two"))
    val viaSql = rows.createOrReplaceTempView("h")
    assert(spark.sql("SELECT graft_html_extract(html) FROM h").as[String].collect().toSeq
      === got)
  }
}
