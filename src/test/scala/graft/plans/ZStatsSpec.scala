package graft.plans

import graft.SparkSpec
import graft.io.{Fio, FioConf}
import graft.operators.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE→planner bridge: fresh `_zstats` live stats flip a
  * deleted-heavy layout's join side to broadcast; any mutation since
  * ANALYZE disables the bridge (advisory-or-nothing); results are
  * identical either way.
  */
class ZStatsSpec extends AnyFunSuite with SparkSpec {

  test("live stats flip the join to broadcast; stale stats go dormant; output identical") {
    val out = java.nio.file.Files.createTempDirectory("graft-zstats").toString + "/t"
    implicit val fc: FioConf = FioConf.of(spark)
    val df = spark.range(20000).select(
      col("id").as("k"),
      (col("id") % 997).as("xv"),
      (col("id") % 991).as("yv"),
      lpad(lit("p"), 200, "x").as("payload"))
    ZOrder.clusterQuantile(df, Seq("xv", "yv"), nFiles = 4, out = out)
    ZOrder.deleteWhere(spark, out, col("k") % 20 =!= 0) // 5% survives
    ZOrder.analyzeLayout(spark, out, Seq("xv", "yv"))
    val st = ZOrder.liveStatsIfFresh(out).getOrElse(fail("no fresh stats after ANALYZE"))
    assert(st.rows === 1000L)
    val rawBytes = st.fileNames.toSeq.map(n => Fio.size(Fio.child(out, n))).sum
    // live-byte estimate = file bytes scaled to the 5% live fraction
    assert(st.bytes * 3 < rawBytes, s"live=${st.bytes} raw=$rawBytes")
    // threshold between live and raw bytes: the flip window. raw/3 keeps
    // a 3x margin on both sides of the planner's width rescaling.
    val thr = rawBytes / 3
    assert(st.bytes * 3 < thr)
    val big = spark.range(3L * 1000 * 1000).toDF("k2") // 24 MB plan-stat side
    // keep every layout column in the output so column pruning cannot
    // shrink the blind estimate below the threshold on its own
    def q: DataFrame = ZOrder.readCommitted(spark, out, applyDeletes = true)
      .join(big, col("k") === col("k2"))
      .agg(sum("xv").as("sx"), sum("yv").as("sy"),
        count(col("payload")).as("np"), max("k").as("mk"))
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr.toString)
    spark.conf.set("spark.graft.zstats.cacheMs", "0")
    try {
      val on = q
      assert(PlanAudit.innerJoinStrategies(on) === Seq("broadcast"),
        "fresh stats must broadcast the live-small layout side")
      spark.conf.set("spark.graft.zstats.inject", "false")
      val off = q
      assert(PlanAudit.innerJoinStrategies(off) === Seq("sortmerge"),
        "without the bridge the raw file bytes must exceed the threshold")
      // output identity: the bridge changes plan choice, never results
      assert(on.collect().toSeq === off.collect().toSeq)
      spark.conf.set("spark.graft.zstats.inject", "true")
      // STALENESS: one more delete moves the tombstone fingerprint —
      // stats must stop applying without a re-ANALYZE
      ZOrder.deleteWhere(spark, out, col("k") === 0)
      ZStatsRule.invalidateCache()
      assert(ZOrder.liveStatsIfFresh(out).isEmpty, "mutation must invalidate stats")
      assert(PlanAudit.innerJoinStrategies(q) === Seq("sortmerge"),
        "stale stats must never reach the planner")
      // re-ANALYZE restores the bridge at the new snapshot
      ZOrder.analyzeLayout(spark, out, Seq("xv", "yv"))
      assert(PlanAudit.innerJoinStrategies(q) === Seq("broadcast"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
      spark.conf.set("spark.graft.zstats.inject", "true")
      spark.conf.unset("spark.graft.zstats.cacheMs")
    }
  }

  test("pruned subset scans and foreign parquet dirs are never stamped") {
    val root = java.nio.file.Files.createTempDirectory("graft-zstats2").toString
    implicit val fc: FioConf = FioConf.of(spark)
    val out = s"$root/t"
    val df = spark.range(4000).select(
      col("id").as("k"), (col("id") % 64).as("xv"), expr("id div 64").as("yv"))
    ZOrder.clusterQuantile(df, Seq("xv", "yv"), nFiles = 4, out = out)
    ZOrder.deleteWhere(spark, out, col("k") % 2 === 0)
    ZOrder.analyzeLayout(spark, out, Seq("xv", "yv"))
    ZStatsRule.invalidateCache()
    spark.conf.set("spark.graft.zstats.cacheMs", "0")
    try {
      // subset scan (one data file): root paths != analyzed set -> no stamp
      val one = ZOrder.liveStatsIfFresh(out).get.fileNames.toSeq.sorted.head
      val sub = spark.read.parquet(Fio.child(out, one))
      val subLr = sub.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(subLr.nonEmpty && subLr.forall(_.catalogTable.isEmpty))
      // whole-dir scan of the SAME analyzed file set -> stamped, with
      // the live row count riding as catalog stats
      val whole = spark.read.parquet(out)
      val wholeLr = whole.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(wholeLr.exists(_.catalogTable.exists(
        _.stats.exists(_.rowCount.contains(BigInt(2000))))))
      // a never-analyzed parquet dir -> untouched
      val plainDir = s"$root/plain"
      df.write.parquet(plainDir)
      val plain = spark.read.parquet(plainDir)
      val plainLr = plain.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(plainLr.nonEmpty && plainLr.forall(_.catalogTable.isEmpty))
    } finally spark.conf.unset("spark.graft.zstats.cacheMs")
  }

  test("column NDV/null counts reach plan statistics under planStats") {
    val out = java.nio.file.Files.createTempDirectory("graft-zstats3").toString + "/t"
    implicit val fc: FioConf = FioConf.of(spark)
    val df = spark.range(8000).select(
      col("id").as("k"), (col("id") % 64).as("xv"), expr("id div 64").as("yv"))
    ZOrder.clusterQuantile(df, Seq("xv", "yv"), nFiles = 4, out = out)
    ZOrder.deleteWhere(spark, out, col("k") % 4 =!= 0)
    ZOrder.analyzeLayout(spark, out, Seq("xv", "yv"))
    ZStatsRule.invalidateCache()
    // the snapshot carries the per-column stats the ANALYZE measured
    val st = ZOrder.liveStatsIfFresh(out).get
    assert(st.colStats.keySet === Set("xv", "yv"))
    assert(st.colStats("xv")._2 === 0L) // no nulls
    spark.conf.set("spark.graft.zstats.cacheMs", "0")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    try {
      val scan = spark.read.parquet(out)
      val lr = scan.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      }.head
      val stats = lr.stats
      assert(stats.rowCount.contains(BigInt(2000)))
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.contains("xv") && byName("xv").distinctCount.isDefined)
      // the NDV is the LIVE view's: only k % 4 == 0 survives the
      // delete, so xv = k % 64 has exactly 16 distinct values — the
      // stat the blind estimate could never know (HLL++ at rsd 0.02
      // is exact at this cardinality; allow 1 either way)
      val ndv = byName("xv").distinctCount.get.toLong
      assert(math.abs(ndv - 16L) <= 1, s"ndv=$ndv")
    } finally {
      spark.conf.unset("spark.sql.cbo.planStats.enabled")
      spark.conf.unset("spark.graft.zstats.cacheMs")
    }
  }
}
