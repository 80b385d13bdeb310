package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.io.{Fio, FioConf}
import graft.operators.ZOrder

/** ANALYZE→planner bridge (the `_zstats` consumer on the READ side):
  * stamps the table-level live stats recorded by
  * [[ZOrder.analyzeLayout]] onto a layout's parquet scan relations, so
  * the join planner's broadcast-vs-shuffle decision sees LIVE bytes
  * (post-tombstone) instead of raw file bytes.
  *
  * Why it matters: a layout that deleted 90% of its rows still carries
  * 100% of its file bytes until compaction, and Spark's blind estimate
  * for a file scan IS those file bytes — so a dimension table that
  * shrank well under `autoBroadcastJoinThreshold` keeps sort-merge
  * joining (two full shuffles of the fact side at 100 TB) until someone
  * compacts. With fresh ANALYZE stats the scan reports live bytes, the
  * LeftAnti tombstone merge passes its left-side stats through
  * unchanged, and the join flips to broadcast — the flip is pinned by a
  * bench probe with output identity gated (q51 + ZStatsSpec).
  *
  * Safety contract — advisory-or-nothing:
  *  - stats apply ONLY while the ANALYZE-time snapshot fingerprint
  *    (live file-name set + tombstone sidecar identity) still matches
  *    the layout ([[ZOrder.liveStatsIfFresh]]); any append / delete /
  *    merge / compaction / vacuum since silently disables the bridge,
  *    so a stale row count can never feed the planner;
  *  - a scan is stamped ONLY when its root paths cover exactly the
  *    analyzed file set (the committed read and the whole-dir read) —
  *    pruned subset scans keep Spark's own per-file estimate, which is
  *    already correct for them;
  *  - the stamp is a [[CatalogTable]] with [[CatalogStatistics]] on the
  *    otherwise-unchanged [[LogicalRelation]] (the Delta/Iceberg
  *    pattern): plan CHOICE changes, results cannot.
  *
  * Kill switch: `spark.graft.zstats.inject=false`. Freshness probes are
  * metadata-only (two dir listings) and memoized for
  * `spark.graft.zstats.cacheMs` (default 10 s, 0 = probe every compile)
  * so repeated compilations of non-layout parquet scans cost one cached
  * negative lookup per root directory.
  */
case class ZStatsRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.sessionState.conf
        .getConfString("spark.graft.zstats.inject", "true").toBoolean) return plan
    plan.transformUp {
      case lr: LogicalRelation if lr.catalogTable.isEmpty && !lr.isStreaming =>
        statsFor(lr).fold(lr: LogicalPlan)(ct => lr.copy(catalogTable = Some(ct)))
    }
  }

  private def statsFor(lr: LogicalRelation): Option[CatalogTable] = lr.relation match {
    case fs: HadoopFsRelation =>
      implicit val fc: FioConf = FioConf.of(spark)
      val roots = fs.location.rootPaths
      if (roots.isEmpty) return None
      // the layout dir: a whole-dir read roots AT the dir; a committed
      // read roots at its data FILES (dir = common parent). Mixed or
      // disagreeing parents → not a layout read. A dir-rooted scan's
      // effective file set is the dir's data files — resolved
      // explicitly so a post-compaction raw dir read (which covers the
      // folded files AND their replacement, a strict superset of the
      // analyzed committed set) is never stamped with live stats.
      val (dir, scanNames) =
        if (roots.length == 1 && !roots.head.getName.endsWith(".parquet")) {
          val d = roots.head.toString
          val names =
            try {
              if (!Fio.exists(d)) return None
              Fio.listNames(d)
                .filter(n => n.endsWith(".parquet") && !n.startsWith("_")).toSet
            } catch { case _: java.io.IOException => return None }
          (d, names)
        } else {
          val parents = roots.map(_.getParent).distinct
          if (parents.length != 1 || parents.head == null) return None
          if (!roots.forall(_.getName.endsWith(".parquet"))) return None
          (parents.head.toString, roots.map(_.getName).toSet)
        }
      ZStatsRule.freshStats(dir, cacheMs) match {
        case Some(st) if scanNames == st.fileNames =>
          // per-column NDV/null counts ride along for CBO consumers
          // (join reorder, filter selectivity under
          // spark.sql.cbo.planStats.enabled) — names are matched
          // against the scan's own schema, anything else dropped
          val names = fs.schema.fieldNames.toSet
          val colStats = st.colStats.collect {
            case (name, (ndv, nulls)) if names.contains(name) =>
              name -> org.apache.spark.sql.catalyst.catalog.CatalogColumnStat(
                distinctCount = Some(BigInt(math.max(0L, ndv))),
                nullCount = Some(BigInt(math.max(0L, nulls))))
          }
          Some(CatalogTable(
            identifier = TableIdentifier(new org.apache.hadoop.fs.Path(dir).getName,
              Some("zlayout")),
            tableType = CatalogTableType.EXTERNAL,
            storage = CatalogStorageFormat.empty,
            schema = fs.schema,
            provider = Some("parquet"),
            stats = Some(CatalogStatistics(
              sizeInBytes = BigInt(math.max(1L, st.bytes)),
              rowCount = Some(BigInt(math.max(0L, st.rows))),
              colStats = colStats))))
        case _ => None
      }
    case _ => None
  }

  private def cacheMs: Long =
    spark.sessionState.conf.getConfString("spark.graft.zstats.cacheMs", "10000").toLong
}

object ZStatsRule {
  private case class Entry(at: Long, stats: Option[ZOrder.ZLiveStats])
  private val cache = new ConcurrentHashMap[String, Entry]()

  /** Fresh-or-None live stats for `dir`, memoized for `ttlMs`. The
    * probe itself is [[ZOrder.liveStatsIfFresh]] behind an existence
    * check on the `_SNAPSHOT` file, so never-analyzed directories
    * (every ordinary parquet read in the session) cost one exists()
    * per TTL window.
    */
  private def freshStats(dir: String, ttlMs: Long)(
      implicit fc: FioConf): Option[ZOrder.ZLiveStats] = {
    val now = System.currentTimeMillis()
    val hit = cache.get(dir)
    if (hit != null && ttlMs > 0 && now - hit.at < ttlMs) return hit.stats
    val st =
      try {
        if (!Fio.exists(Fio.child(dir, "_zstats/_SNAPSHOT"))) None
        else ZOrder.liveStatsIfFresh(dir)
      } catch { case _: java.io.IOException => None }
    cache.put(dir, Entry(now, st))
    // bound the negative-entry population (one entry per distinct parquet
    // parent dir ever scanned — tiny, but a long-lived session shouldn't
    // grow it without limit)
    if (cache.size > 4096) cache.clear()
    st
  }

  /** Test hook: drop memoized probes so a just-mutated layout is
    * re-probed immediately regardless of TTL.
    */
  def invalidateCache(): Unit = cache.clear()
}
