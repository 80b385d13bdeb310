package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkSpec {

  test("saltedInnerJoin is result-identical to a plain join under heavy skew") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = spark.range(10000)
      .select(when($"id" % 10 =!= 0, lit(1L)).otherwise($"id" % 50).as("k"), $"id".as("v"))
    val dim = spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("name"))

    val plain = fact.join(dim, "k").select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "k", saltFactor = 8)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(plain.size === 10000)
  }

  test("keySkewReport surfaces the hot key with its share") {
    import spark.implicits._
    val fact = spark.range(1000)
      .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id").as("k"))
    val top = SkewJoin.keySkewReport(fact, "k", topK = 1).collect().head
    assert(top.getLong(0) === 7L)
    assert(top.getLong(1) === 900L)
    assert(top.getDouble(2) === 0.9)
  }
}
