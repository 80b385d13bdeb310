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

  test("AQE splits a skewed join partition at runtime (the first-line defense salting backs up)") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the test corpus qualifies as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    )
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key carrying ~all the rows on the big side
      val big = spark.range(200000).select(lit(0L).as("k"), $"id".as("v"))
        .unionAll(spark.range(50).select(($"id" % 10 + 1).as("k"), $"id".as("v")))
      val dim = spark.range(11).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = big.join(dim, "k")
      // execute THIS plan instance: AQE finalizes per QueryExecution, and
      // count() would build (and adapt) a different one
      assert(joined.collect().length === 200050)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should have marked the hot-key join skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
