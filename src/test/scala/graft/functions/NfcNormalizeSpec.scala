package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unicode NFC normalization expression: composition of combining marks,
  * the already-normalized fast path, and the full normalize pipeline the
  * doc_normalize gate query runs. Fixtures use \u escapes so the source
  * encoding can't silently change which form is under test.
  */
class NfcNormalizeSpec extends AnyFunSuite with SparkSpec {

  private val Decomposed = "cafe\u0301" // e + COMBINING ACUTE ACCENT
  private val Composed = "caf\u00e9" // single code point U+00E9

  private def nfcOf(s: String): String = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(s).toDF("t").select(GraftFunctions.nfc(col("t"))).head.getString(0)
  }

  test("decomposed combining marks compose to canonical form") {
    assert(nfcOf(Decomposed) === Composed)
    // Hangul: conjoining jamo (U+1100 U+1161) compose to syllable U+AC00
    assert(nfcOf("\u1100\u1161") === "\uac00")
  }

  test("already-NFC text (incl. all ASCII) is returned unchanged") {
    assert(nfcOf("plain ascii text 123") === "plain ascii text 123")
    assert(nfcOf(Composed) === Composed)
    assert(nfcOf("") === "")
  }

  test("nulls propagate; fingerprints of composed/decomposed forms agree after nfc") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      Some("Cafe\u0301  Menu"), // decomposed + double space + case
      Some("caf\u00e9 menu"), // canonical target
      None,
    ).toDF("t")
    val norm = trim(regexp_replace(lower(GraftFunctions.nfc(col("t"))), "[ \t\n\r\f]+", " "))
    val out = df.select(md5(norm.cast("binary")).as("fp")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) === out(1), "normalized forms must fingerprint identically")
    assert(out(2) === null)
  }
}
