package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  test("lastAtOrBefore picks the latest right row at or before each left ts, per key") {
    import spark.implicits._
    val quotes = Seq( // key, ts, price
      (1L, 10L, 100.0), (1L, 20L, 110.0), (1L, 30L, 120.0),
      (2L, 15L, 500.0),
    ).toDF("k", "qts", "price")
    val trades = Seq( // key, ts
      (1L, 5L), (1L, 10L), (1L, 25L), (1L, 35L),
      (2L, 14L), (2L, 16L),
      (3L, 50L),
    ).toDF("k", "tts")

    val got = AsOfJoin.lastAtOrBefore(trades, quotes, Seq("k"), "tts", "qts", Seq("price"))
      .select($"k", $"tts", $"matched_ts", $"matched_price")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap

    assert(got((1L, 5L)) === ((None, None))) // before any quote
    assert(got((1L, 10L)) === ((Some(10L), Some(100.0)))) // equal ts matches (>=)
    assert(got((1L, 25L)) === ((Some(20L), Some(110.0))))
    assert(got((1L, 35L)) === ((Some(30L), Some(120.0))))
    assert(got((2L, 14L)) === ((None, None)))
    assert(got((2L, 16L)) === ((Some(15L), Some(500.0))))
    assert(got((3L, 50L)) === ((None, None))) // key with no right rows
  }

  test("firstAtOrAfter picks the earliest right row at or after each left ts, per key") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 10L, 100.0), (1L, 20L, 110.0), (1L, 30L, 120.0),
      (2L, 15L, 500.0),
    ).toDF("k", "qts", "price")
    val trades = Seq(
      (1L, 5L), (1L, 10L), (1L, 25L), (1L, 35L),
      (2L, 14L), (2L, 16L),
      (3L, 50L),
    ).toDF("k", "tts")

    val got = AsOfJoin.firstAtOrAfter(trades, quotes, Seq("k"), "tts", "qts", Seq("price"))
      .select($"k", $"tts", $"matched_ts", $"matched_price")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap

    assert(got((1L, 5L)) === ((Some(10L), Some(100.0))))
    assert(got((1L, 10L)) === ((Some(10L), Some(100.0)))) // equal ts matches (<=)
    assert(got((1L, 25L)) === ((Some(30L), Some(120.0))))
    assert(got((1L, 35L)) === ((None, None))) // after the last quote
    assert(got((2L, 14L)) === ((Some(15L), Some(500.0))))
    assert(got((2L, 16L)) === ((None, None)))
    assert(got((3L, 50L)) === ((None, None))) // key with no right rows
  }

  test("duplicate right timestamps: one consistent row is matched (struct payload)") {
    import spark.implicits._
    val right = Seq((1L, 10L, "a", 1.0), (1L, 10L, "b", 2.0)).toDF("k", "qts", "tag", "v")
    val left = Seq((1L, 11L)).toDF("k", "tts")
    val r = AsOfJoin.lastAtOrBefore(left, right, Seq("k"), "tts", "qts", Seq("tag", "v"))
      .select("matched_tag", "matched_v").collect().head
    // whichever duplicate won, tag and v must come from the SAME row
    val consistent = (r.getString(0) == "a" && r.getDouble(1) == 1.0) ||
      (r.getString(0) == "b" && r.getDouble(1) == 2.0)
    assert(consistent, s"mixed payload: $r")
  }
}
