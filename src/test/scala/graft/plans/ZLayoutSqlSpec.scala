package graft.plans

import graft.SparkSpec
import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface for the lakehouse verbs: `zlayout.`path`` SELECT /
  * VERSION AS OF / DELETE FROM / MERGE INTO, injected by
  * GraftSessionExtensions (the test session registers it).
  */
class ZLayoutSqlSpec extends AnyFunSuite with SparkSpec {

  private def freshLayout(): String = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zsql").toString
    val src = spark.range(1000).select(
      col("id"), (col("id") % 10).as("x"), ((col("id") * 7919) % 331).as("y"))
    ZOrder.clusterQuantile(src, Seq("x", "y"), nFiles = 4, out)
    out
  }

  private def batch(lo: Long, hi: Long) = {
    spark.range(lo, hi).select(
      col("id"), (col("id") % 10).as("x"), ((col("id") * 7919) % 331).as("y"))
  }

  test("SELECT FROM zlayout: the committed live view — crashed publishes invisible, deletes applied") {
    import spark.implicits._
    val out = freshLayout()
    ZOrder.appendQuantileOnce(batch(1000, 1200), Seq("x", "y"), out, batchId = 0)
    // crashed publish: files landed, marker didn't
    ZOrder.appendQuantileOnce(batch(1200, 1400), Seq("x", "y"), out, batchId = 1)
    graft.io.Fio.delete(s"$out/_zbatches/1")(graft.io.FioConf.of(spark))
    assert(spark.sql(s"SELECT * FROM zlayout.`$out`").count() === 1200L)
    val del = spark.sql(s"DELETE FROM zlayout.`$out` WHERE id % 10 = 3")
      .as[Long].head()
    assert(del === 120L)
    assert(spark.sql(s"SELECT * FROM zlayout.`$out`").count() === 1080L)
    // the Scala API sees the identical state (twin contract)
    assert(ZOrder.readCommitted(spark, out, applyDeletes = true).count() === 1080L)
    // aliases and projections work — it's a normal relation to the planner
    assert(spark.sql(
      s"SELECT t.x, count(*) AS n FROM zlayout.`$out` t GROUP BY t.x ORDER BY t.x")
      .count() === 9L)
  }

  test("VERSION AS OF: SQL time travel matches readAsOfBatch, delete-aware") {
    import spark.implicits._
    val out = freshLayout()
    ZOrder.appendQuantileOnce(batch(1000, 1200), Seq("x", "y"), out, batchId = 0)
    spark.sql(s"DELETE FROM zlayout.`$out` WHERE id % 10 = 3") // stamped version 0
    ZOrder.appendQuantileOnce(batch(1200, 1400), Seq("x", "y"), out, batchId = 1)
    val v0 = spark.sql(s"SELECT id FROM zlayout.`$out` VERSION AS OF 0")
      .as[Long].collect().sorted
    val want = (0L until 1200L).filterNot(_ % 10 == 3).toArray
    assert(v0.sameElements(want))
    val api = ZOrder.readAsOfBatch(spark, out, 0L, applyDeletes = true)
      .select("id").as[Long].collect().sorted
    assert(v0.sameElements(api))
  }

  test("MERGE INTO: the upsert shape lowers to mergeInto with _zmeta parameters and the next batch id") {
    import spark.implicits._
    val out = freshLayout()
    batch(0, 50).withColumn("y", col("y") + 10000)
      .unionByName(batch(5000, 5010).withColumn("y", col("y") + 10000))
      .createOrReplaceTempView("zsql_upserts")
    val res = spark.sql(
      s"""MERGE INTO zlayout.`$out` AS t USING zsql_upserts AS s
          ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""").head()
    assert(res.getLong(0) === 50L, "50 old versions tombstoned")
    assert(res.getLong(1) >= 1L, "update batch published")
    val after = spark.sql(s"SELECT id, y FROM zlayout.`$out`")
      .as[(Long, Long)].collect()
    assert(after.length === 1010)
    assert(after.filter(_._1 < 50).forall(_._2 >= 10000), "matched rows updated")
    assert(after.count(_._1 >= 5000) === 10, "unmatched rows inserted")
    // a second merge derives the NEXT batch id from the commit history
    batch(50, 60).withColumn("y", col("y") + 20000)
      .createOrReplaceTempView("zsql_upserts2")
    spark.sql(
      s"""MERGE INTO zlayout.`$out` t USING zsql_upserts2 s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    assert(ZOrder.committedBatches(out) === Set("0", "1"))
    assert(spark.sql(s"SELECT count(*) FROM zlayout.`$out`").as[Long].head() === 1010L)
  }

  test("MERGE INTO: shapes the layout cannot express are refused by name, not misexecuted") {
    val out = freshLayout()
    batch(0, 10).createOrReplaceTempView("zsql_bad_src")
    // conditional matched clause
    val e1 = intercept[Exception](spark.sql(
      s"""MERGE INTO zlayout.`$out` t USING zsql_bad_src s ON t.id = s.id
          WHEN MATCHED AND s.y > 5 THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *"""))
    assert(e1.getMessage.contains("merge-on-read upsert"))
    // non-equi ON condition
    val e2 = intercept[Exception](spark.sql(
      s"""MERGE INTO zlayout.`$out` t USING zsql_bad_src s ON t.id > s.id
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"""))
    assert(e2.getMessage.contains("t.key = s.key"))
  }

  test("INSERT INTO: an exactly-once batch append at the next id; OVERWRITE refused") {
    import spark.implicits._
    val out = freshLayout()
    batch(1000, 1200).createOrReplaceTempView("zsql_ins_src")
    val r = spark.sql(s"INSERT INTO zlayout.`$out` SELECT * FROM zsql_ins_src").head()
    assert(r.getLong(0) === 0L && r.getLong(1) >= 1L)
    assert(spark.sql(s"SELECT count(*) FROM zlayout.`$out`").as[Long].head() === 1200L)
    // a second INSERT commits the NEXT id; both snapshots time-travel
    batch(1200, 1300).createOrReplaceTempView("zsql_ins_src2")
    assert(spark.sql(s"INSERT INTO zlayout.`$out` SELECT * FROM zsql_ins_src2")
      .head().getLong(0) === 1L)
    assert(spark.sql(s"SELECT count(*) FROM zlayout.`$out` VERSION AS OF 0")
      .as[Long].head() === 1200L)
    assert(spark.sql(s"SELECT count(*) FROM zlayout.`$out`").as[Long].head() === 1300L)
    val e = intercept[Exception](spark.sql(
      s"INSERT OVERWRITE zlayout.`$out` SELECT * FROM zsql_ins_src"))
    assert(e.getMessage.contains("INSERT OVERWRITE"))
    // the LINEAR layout routes to appendOnce (frozen manifest bounds)
    import spark.implicits._
    val lin = java.nio.file.Files.createTempDirectory("graft-zsql-lin").toString
    ZOrder.cluster(batch(0, 1000), Seq("x", "y"), nFiles = 4, lin)
    spark.sql(s"INSERT INTO zlayout.`$lin` SELECT * FROM zsql_ins_src")
    assert(spark.sql(s"SELECT count(*) FROM zlayout.`$lin`").as[Long].head() === 1200L)
  }

  test("the zlayout namespace never shadows ordinary SQL") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zsqlplain").toString
    spark.range(100).write.mode("overwrite").parquet(out)
    assert(spark.sql(s"SELECT count(*) FROM parquet.`$out`").as[Long].head() === 100L)
    spark.range(7).toDF("v").createOrReplaceTempView("zsql_plain_view")
    assert(spark.sql("SELECT sum(v) FROM zsql_plain_view").as[Long].head() === 21L)
  }
}
