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

  test("UPDATE: SET lowers to the version-atomic tombstone+append update") {
    import spark.implicits._
    val out = freshLayout()
    // version-stamp baseline: one committed batch so the update lands at id 1
    ZOrder.appendQuantileOnce(batch(1000, 1100), Seq("x", "y"), out, batchId = 0)
    val r = spark.sql(
      s"UPDATE zlayout.`$out` SET y = y + 100000 WHERE id % 10 = 3").head()
    assert(r.getLong(0) === 110L, "110 live rows updated")
    assert(r.getLong(1) === 1L, "update committed at the next batch id")
    val after = spark.sql(s"SELECT id, y FROM zlayout.`$out`").as[(Long, Long)].collect()
    assert(after.length === 1100, "row count unchanged by UPDATE")
    assert(after.filter(_._1 % 10 == 3).forall(_._2 >= 100000), "matched rows updated")
    assert(after.filter(_._1 % 10 != 3).forall(_._2 < 100000), "unmatched rows untouched")
    // VERSION-ATOMIC: as-of one version earlier, every old value is back
    val v0 = spark.sql(s"SELECT id, y FROM zlayout.`$out` VERSION AS OF 0")
      .as[(Long, Long)].collect()
    assert(v0.length === 1100 && v0.forall(_._2 < 100000))
    // simultaneous SET semantics: every RHS evaluates against the OLD row
    val swapOut = freshLayout()
    spark.sql(s"UPDATE zlayout.`$swapOut` SET x = y, y = x WHERE id < 10")
    val swapped = spark.sql(s"SELECT id, x, y FROM zlayout.`$swapOut` WHERE id < 10")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    swapped.foreach { case (id, x, y) =>
      assert(x === (id * 7919) % 331 && y === id % 10, s"swap must read old values at id=$id")
    }
    // the derived key column cannot be assigned; unknown columns refused
    val e1 = intercept[Exception](
      spark.sql(s"UPDATE zlayout.`$out` SET zkey = 0 WHERE id = 1"))
    assert(e1.getMessage.contains("derived"))
    val e2 = intercept[Exception](
      spark.sql(s"UPDATE zlayout.`$out` SET nope = 0 WHERE id = 1"))
    assert(e2.getMessage.contains("does not exist"))
  }

  test("MERGE INTO: ON terms must reference target on one side and source on the other") {
    val out = freshLayout()
    batch(0, 10).createOrReplaceTempView("zsql_qual_src")
    // same-side term (qualifier typo): refused, not silently lowered
    val e1 = intercept[Exception](spark.sql(
      s"""MERGE INTO zlayout.`$out` t USING zsql_qual_src s ON t.id = t.id
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"""))
    assert(e1.getMessage.contains("TARGET on one side"))
    // unqualified terms: ambiguous, refused
    val e2 = intercept[Exception](spark.sql(
      s"""MERGE INTO zlayout.`$out` t USING zsql_qual_src s ON id = id
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"""))
    assert(e2.getMessage.contains("TARGET on one side"))
    // reversed but valid (s.id = t.id) still works
    val r = spark.sql(
      s"""MERGE INTO zlayout.`$out` t USING zsql_qual_src s ON s.id = t.id
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""").head()
    assert(r.getLong(0) === 10L)
  }

  test("named tables: CREATE TABLE AS / SELECT / DML / DROP by name under the warehouse") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-zwh").toString
    spark.conf.set("spark.graft.zlayout.warehouse", wh)
    spark.range(1000).select(
      col("id"), (col("id") % 10).as("x"), ((col("id") * 7919) % 331).as("y"))
      .createOrReplaceTempView("zsql_cat_src")
    // CREATE TABLE ... AS SELECT bootstraps a quantile layout by name
    spark.sql(
      """CREATE TABLE zlayout.events_clean
         TBLPROPERTIES('cols'='x,y', 'nfiles'='4')
         AS SELECT * FROM zsql_cat_src""")
    assert(new java.io.File(s"$wh/events_clean/_zmeta").exists(),
      "table materialized under the warehouse with its _zmeta parameters")
    assert(spark.sql("SELECT count(*) FROM zlayout.events_clean").as[Long].head() === 1000L)
    // re-create: loud without IF NOT EXISTS, silent with
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE zlayout.events_clean TBLPROPERTIES('cols'='x,y') AS SELECT * FROM zsql_cat_src"))
    assert(e.getMessage.contains("already exists"))
    spark.sql(
      "CREATE TABLE IF NOT EXISTS zlayout.events_clean TBLPROPERTIES('cols'='x,y') AS SELECT * FROM zsql_cat_src")
    // the FULL verb surface works by name: INSERT, DELETE, UPDATE, MERGE, time travel
    spark.sql("INSERT INTO zlayout.events_clean SELECT id + 1000 AS id, x, y FROM zsql_cat_src LIMIT 100")
    assert(spark.sql("SELECT count(*) FROM zlayout.events_clean").as[Long].head() === 1100L)
    spark.sql("DELETE FROM zlayout.events_clean WHERE id >= 1050")
    assert(spark.sql("SELECT count(*) FROM zlayout.events_clean").as[Long].head() === 1050L)
    spark.sql("UPDATE zlayout.events_clean SET y = y + 100000 WHERE id < 5")
    assert(spark.sql("SELECT count(*) FROM zlayout.events_clean WHERE y >= 100000")
      .as[Long].head() === 5L)
    // name-addressed time travel: version 0 carries the insert and the
    // version-0-stamped delete, but predates the UPDATE (batch 1)
    assert(spark.sql("SELECT count(*) FROM zlayout.events_clean VERSION AS OF 0")
      .as[Long].head() === 1050L)
    assert(spark.sql(
      "SELECT count(*) FROM zlayout.events_clean VERSION AS OF 0 WHERE y >= 100000")
      .as[Long].head() === 0L, "the update is invisible one version earlier")
    // cols property is required; empty CREATE TABLE refused by name
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE zlayout.bad AS SELECT * FROM zsql_cat_src"))
    assert(e2.getMessage.contains("cols"))
    val e3 = intercept[Exception](spark.sql("CREATE TABLE zlayout.bad2 (x INT)"))
    assert(e3.getMessage.contains("AS SELECT"))
    // SHOW TABLES lists _zmeta-carrying dirs under the warehouse
    spark.sql(
      "CREATE TABLE zlayout.second TBLPROPERTIES('cols'='x,y') AS SELECT * FROM zsql_cat_src")
    val shown = spark.sql("SHOW TABLES IN zlayout")
      .select("tableName").as[String].collect().sorted
    assert(shown.sameElements(Array("events_clean", "second")), shown.mkString(","))
    assert(spark.sql("SHOW TABLES IN zlayout 'ev*'").count() === 1L)
    spark.sql("DROP TABLE zlayout.second")
    // DROP TABLE removes the directory; IF EXISTS tolerates absence
    spark.sql("DROP TABLE zlayout.events_clean")
    assert(!new java.io.File(s"$wh/events_clean").exists())
    intercept[Exception](spark.sql("DROP TABLE zlayout.events_clean"))
    spark.sql("DROP TABLE IF EXISTS zlayout.events_clean")
  }

  test("the zlayout namespace never shadows ordinary SQL") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zsqlplain").toString
    spark.range(100).write.mode("overwrite").parquet(out)
    assert(spark.sql(s"SELECT count(*) FROM parquet.`$out`").as[Long].head() === 100L)
    spark.range(7).toDF("v").createOrReplaceTempView("zsql_plain_view")
    assert(spark.sql("SELECT sum(v) FROM zsql_plain_view").as[Long].head() === 21L)
  }

  test("ANALYZE TABLE: lowers to analyzeLayout, feeds the planner bridge, refusals by name") {
    import spark.implicits._
    implicit val fc: graft.io.FioConf = graft.io.FioConf.of(spark)
    val out = freshLayout()
    spark.sql(s"DELETE FROM zlayout.`$out` WHERE id % 10 <> 3")
    // the bare form analyzes the _zmeta clustering lanes
    val rows = spark.sql(s"ANALYZE TABLE zlayout.`$out` COMPUTE STATISTICS")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.keySet === Set("x", "y"))
    assert(rows("x") === 100L) // live rows, tombstones subtracted
    // the planner-bridge snapshot landed and is FRESH — SQL ANALYZE is
    // what re-arms the broadcast flip after a delete wave
    assert(graft.io.Fio.exists(s"$out/_zstats/_SNAPSHOT"))
    assert(ZOrder.liveStatsIfFresh(out).exists(_.rows == 100L))
    // column scoping: FOR COLUMNS list, FOR ALL COLUMNS = data columns
    val forCols = spark.sql(
      s"ANALYZE TABLE zlayout.`$out` COMPUTE STATISTICS FOR COLUMNS id")
      .collect().map(_.getString(0)).toSet
    assert(forCols === Set("id"))
    val allCols = spark.sql(
      s"ANALYZE TABLE zlayout.`$out` COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect().map(_.getString(0)).toSet
    assert(allCols === Set("id", "x", "y"))
    // SQL rows == the Scala face's rows (twin contract)
    val scala0 = ZOrder.analyzeLayout(spark, out, Seq("id", "x", "y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val sql0 = spark.sql(
      s"ANALYZE TABLE zlayout.`$out` COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(sql0 === scala0)
    // refusals by name: NOSCAN and PARTITION have no layout meaning
    val e1 = intercept[Exception] {
      spark.sql(s"ANALYZE TABLE zlayout.`$out` COMPUTE STATISTICS NOSCAN")
    }
    assert(e1.getMessage.contains("NOSCAN"))
  }
}
