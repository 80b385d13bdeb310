package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Co-located joins via bucketing: both fact tables bucketed on the join
  * key at write time ⇒ the join plans WITHOUT a shuffle exchange — the
  * storage-layout lever for repeated fact-fact joins at 100 TB (vs paying
  * the orderkey shuffle on every query, as q2 does on plain parquet).
  */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_quantity")).as("qty"))

      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side: the only exchange
      // in the plan is the one for the groupBy on o_custkey
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
      assert(exchanges.size === 1, s"expected only the aggregation exchange, got:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))

      // and it computes the same result as the plain-parquet join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val got = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("bucketedMirror: external mirrors join with zero exchanges and survive re-use") {
    val d = "/root/testdata/sf0.001"
    val li = Bucketing.bucketedMirror(
      spark, d, "lineitem", "l_orderkey",
      Seq("l_orderkey", "l_extendedprice", "l_discount"), buckets = 8)
    val ord = Bucketing.bucketedMirror(
      spark, d, "orders", "o_orderkey",
      Seq("o_orderkey", "o_orderpriority"), buckets = 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed mirror join must not shuffle either side:\n$plan")

      // layout is invisible: same rows as the plain parquet join
      val plain = spark.read.parquet(s"$d/lineitem.parquet")
        .join(spark.read.parquet(s"$d/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() === plain)

      // second call is a catalog hit, not a rewrite: same table object
      val again = Bucketing.bucketedMirror(
        spark, d, "lineitem", "l_orderkey",
        Seq("l_orderkey", "l_extendedprice", "l_discount"), buckets = 8)
      assert(again.count() === li.count())

      // mismatched bucket counts degrade to a correct (re-shuffled) join,
      // never a wrong answer
      Bucketing.writeBucketed(
        spark.read.parquet(s"$d/orders.parquet").select(col("o_orderkey"), col("o_orderpriority")),
        "o_bkt_mismatch", Bucketing.mirrorPath("o_bkt_mismatch"), "o_orderkey", buckets = 4)
      try {
        val mixed = li.join(spark.table("o_bkt_mismatch"), col("l_orderkey") === col("o_orderkey"))
        assert(mixed.count() === plain)
        assert(mixed.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
          "a 8-vs-4-bucket join must re-shuffle at least one side")
      } finally spark.sql("DROP TABLE IF EXISTS o_bkt_mismatch")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("bucketedMirror cache key covers key, bucket count, and projection") {
    val d = "/root/testdata/sf0.001"
    val cols = Seq("o_orderkey", "o_orderpriority")
    // different buckets / key / cols each resolve to their OWN mirror —
    // a cache hit must never hand back a differently-shaped table
    val base = Bucketing.mirrorName("m", d, "o_orderkey", 8, cols)
    assert(Bucketing.mirrorName("m", d, "o_orderkey", 4, cols) !== base)
    assert(Bucketing.mirrorName("m", d, "o_custkey", 8, cols) !== base)
    assert(Bucketing.mirrorName("m", d, "o_orderkey", 8, cols :+ "o_custkey") !== base)
    // and end-to-end: asking for a different projection returns a mirror
    // with that projection, not the first call's
    val narrow = Bucketing.bucketedMirror(spark, d, "orders", "o_orderkey",
      Seq("o_orderkey"), buckets = 8)
    val wide = Bucketing.bucketedMirror(spark, d, "orders", "o_orderkey",
      cols, buckets = 8)
    assert(narrow.columns.toSeq === Seq("o_orderkey"))
    assert(wide.columns.toSeq === cols)
  }
}
