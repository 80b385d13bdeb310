package graft.plans

import graft.io.FioConf
import graft.operators.ZOrder
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.plans.logical.{CreateTable, CreateTableAsSelect, DeleteFromTable, DropTable, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UnresolvedTableSpec, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** SQL surface for the lakehouse verbs — the layout family's operations
  * (q35–q43) reachable from PLAIN SQL, not just the Scala API, via one
  * injected resolution rule (registered by
  * [[graft.functions.GraftSessionExtensions]]):
  *
  *  - `SELECT … FROM zlayout.`/path``                 → the CURRENT
  *    committed live view ([[ZOrder.readCommitted]] with tombstones
  *    subtracted — crashed publishes invisible, merges applied);
  *  - `SELECT … FROM zlayout.`/path` VERSION AS OF n` → time travel
  *    ([[ZOrder.readAsOfBatch]], delete-aware: the row deletions in
  *    that version's lineage are applied);
  *  - `DELETE FROM zlayout.`/path` WHERE p`           → positional
  *    tombstones ([[ZOrder.deleteWhere]]); returns `deleted_rows`;
  *  - `UPDATE zlayout.`/path` SET c = e, … [WHERE p]`  → version-atomic
  *    tombstone+append update ([[ZOrder.updateWhere]]): new versions
  *    re-key through the frozen boundaries as one exactly-once batch,
  *    old versions tombstone with the batch's own id; returns
  *    (`updated_rows`, `batch_id`);
  *  - `INSERT INTO zlayout.`/path` <query>`           → exactly-once
  *    batch append through the frozen boundaries
  *    ([[ZOrder.appendQuantileOnce]] at the next batch id); returns
  *    (`batch_id`, `inserted_files`);
  *  - `MERGE INTO zlayout.`/path` t USING src s ON t.k = s.k [AND …]
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *    → merge-on-read upsert ([[ZOrder.mergeInto]]) with the layout's
  *    own `_zmeta` parameters and the next batch id; returns
  *    (`updated_rows`, `inserted_files`);
  *  - `ANALYZE TABLE zlayout.<t> COMPUTE STATISTICS [FOR COLUMNS c, …
  *    | FOR ALL COLUMNS]` → [[ZOrder.analyzeLayout]] (per-column
  *    rows/nulls/NDV into `_zstats` + the `_SNAPSHOT` the
  *    [[ZStatsRule]] planner bridge serves); the bare form analyzes
  *    the `_zmeta` clustering lanes.
  *
  * NAMED TABLES (r20): a bare identifier (`zlayout.events_clean`, no
  * `/`) resolves under the warehouse (`spark.graft.zlayout.warehouse`)
  * in every verb above, plus the catalog verbs: `CREATE TABLE
  * zlayout.t TBLPROPERTIES('cols'='x,y'[, 'nfiles', 'bits', 'curve',
  * 'layout'='quantile|linear']) AS SELECT …`, `DROP TABLE [IF EXISTS]`,
  * and `SHOW TABLES IN zlayout ['pat*']`.
  *
  * Design notes, Spark-first: the `zlayout` head is a RESERVED
  * two-part-identifier namespace the built-in resolver cannot claim (no
  * catalog or database of that name resolves), so the rule only ever
  * touches plans the session would otherwise reject — zero effect on
  * every other query. DML parses through Spark's OWN grammar into
  * `DeleteFromTable`/`MergeIntoTable`, which this rule lowers to V1
  * commands over the layout primitives (the Delta pattern: SQL verbs →
  * table-format operations), executed eagerly like any command. MERGE
  * accepts exactly the upsert shape the layout implements — `UPDATE SET
  * * / INSERT *` on an equi-key conjunction — and fails loud, by name,
  * on anything it would silently misexecute (conditional clauses,
  * expression keys, `NOT MATCHED BY SOURCE`).
  */
case class ZLayoutSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Warehouse root for NAMED layout tables (`zlayout.name`, no `/` in
    * the identifier): `spark.graft.zlayout.warehouse`, defaulting under
    * the session's SQL warehouse dir — so SQL-only users address tables
    * by name and never need physical paths (the r19 verdict's gap #2,
    * closed without a full V2 catalog: the same resolution rule serves
    * both spellings, so every verb — SELECT / VERSION AS OF / DELETE /
    * UPDATE / MERGE / INSERT / CREATE TABLE AS / DROP TABLE — works on
    * names and paths alike).
    */
  private def warehouse: String = spark.conf.get(
    "spark.graft.zlayout.warehouse",
    graft.io.Fio.child(spark.conf.get(
      "spark.sql.warehouse.dir", "spark-warehouse"), "zlayout"))

  /** A bare table NAME resolves under the warehouse; anything with a
    * path separator is a physical path (the original spelling).
    */
  private def resolveIdent(ident: String): String =
    if (ident.contains("/")) ident else graft.io.Fio.child(warehouse, ident)

  /** The layout path named by a (possibly aliased) `zlayout.`path``
    * or `zlayout.name` two-part identifier, if this subtree is one.
    */
  private def layoutPath(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => layoutPath(child)
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("zlayout") =>
      Some(resolveIdent(u.multipartIdentifier(1)))
    case _ => None
  }

  /** The layout path of a DDL identifier, if in the zlayout namespace —
    * matched both unresolved and after the built-in catalog resolution
    * has already turned it into a `ResolvedIdentifier` under the session
    * catalog with namespace ["zlayout"] (rule order inside the
    * resolution batch means we usually see the latter).
    */
  private def ddlPath(plan: LogicalPlan): Option[String] = plan match {
    case UnresolvedIdentifier(Seq(ns, ident), _) if ns.equalsIgnoreCase("zlayout") =>
      Some(resolveIdent(ident))
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView
        if t.multipartIdentifier.length == 2 &&
          t.multipartIdentifier.head.equalsIgnoreCase("zlayout") =>
      Some(resolveIdent(t.multipartIdentifier(1)))
    case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
        if r.identifier.namespace.length == 1 &&
          r.identifier.namespace.head.equalsIgnoreCase("zlayout") =>
      Some(resolveIdent(r.identifier.name))
    case _ => None
  }

  /** Is this SHOW TABLES namespace the zlayout warehouse? Matched
    * unresolved and post-resolution (same race as [[ddlPath]]).
    */
  private def zNamespace(plan: LogicalPlan): Boolean = plan match {
    case org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace(Seq(ns), _) =>
      ns.equalsIgnoreCase("zlayout")
    case r: org.apache.spark.sql.catalyst.analysis.ResolvedNamespace =>
      r.namespace.length == 1 && r.namespace.head.equalsIgnoreCase("zlayout")
    case _ => false
  }

  /** Relation/alias names a column qualifier may resolve to on one side
    * of the MERGE — the SubqueryAlias names plus the relation's own last
    * identifier part.
    */
  private def aliasNames(plan: LogicalPlan): Set[String] = plan match {
    case SubqueryAlias(id, child) => aliasNames(child) + id.name.toLowerCase
    case u: UnresolvedRelation => Set(u.multipartIdentifier.last.toLowerCase)
    case _ => Set.empty
  }

  /** The equi-key column names of a MERGE condition: a conjunction of
    * `t.k = s.k` terms, same column name on both sides, ONE side
    * qualified to the target and the other to the source. Anything else
    * is refused — mapping an arbitrary ON expression onto the layout's
    * key-match upsert would silently change semantics, and an
    * unqualified or same-side pair (`ON t.id = t.id`, a qualifier typo)
    * would silently lower to a plain key semi-join on that column (the
    * r19 advice: validate qualifiers, don't guess).
    */
  private def equiKeys(
      cond: Expression, target: Set[String], source: Set[String]): Seq[String] = cond match {
    case And(l, r) => equiKeys(l, target, source) ++ equiKeys(r, target, source)
    case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
        if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) => {
      def qual(x: UnresolvedAttribute): Option[String] =
        x.nameParts.init.lastOption.map(_.toLowerCase)
      val (qa, qb) = (qual(a), qual(b))
      def oneEach(x: String, y: String): Boolean =
        target(x) && source(y) && !(source(x) && target(y))
      val ok = (qa, qb) match {
        case (Some(x), Some(y)) => oneEach(x, y) || oneEach(y, x)
        case _ => false
      }
      if (!ok)
        throw new IllegalArgumentException(
          s"MERGE INTO zlayout: ON term ${EqualTo(a, b).sql} must reference the " +
            s"TARGET on one side and the SOURCE on the other, both qualified " +
            s"(target aliases: ${target.mkString(", ")}; source aliases: " +
            s"${source.mkString(", ")}) — unqualified or same-side terms are " +
            "refused rather than silently lowered to a key match")
      Seq(a.nameParts.last)
    }
    case other =>
      throw new IllegalArgumentException(
        s"MERGE INTO zlayout supports only conjunctions of t.key = s.key " +
          s"(same column name both sides); got: ${other.sql}")
  }

  /** The restricted MERGE shape: unconditional UPDATE SET * / INSERT *. */
  private def requireUpsertShape(m: MergeIntoTable): Unit = {
    val ok = m.matchedActions.forall {
      case UpdateStarAction(None) => true
      case _ => false
    } && m.matchedActions.nonEmpty &&
      m.notMatchedActions.forall {
        case InsertStarAction(None) => true
        case _ => false
      } && m.notMatchedActions.nonEmpty &&
      m.notMatchedBySourceActions.isEmpty
    require(ok,
      "MERGE INTO zlayout supports exactly `WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *` (the layout's merge-on-read upsert); " +
        "conditional clauses and NOT MATCHED BY SOURCE are not expressible " +
        "as tombstone+append and are refused rather than misexecuted")
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    // top-down: DML/time-travel parents must claim their zlayout child
    // before the bare-relation case would rewrite it into a scan
    plan.resolveOperatorsDown {
      case d: DeleteFromTable if layoutPath(d.table).isDefined =>
        GraftDeleteCommand(layoutPath(d.table).get, d.condition.sql)
      case m: MergeIntoTable if layoutPath(m.targetTable).isDefined =>
        requireUpsertShape(m)
        GraftMergeCommand(
          layoutPath(m.targetTable).get, m.sourceTable,
          equiKeys(m.mergeCondition,
            aliasNames(m.targetTable), aliasNames(m.sourceTable)))
      case u: UpdateTable if layoutPath(u.table).isDefined =>
        GraftUpdateCommand(
          layoutPath(u.table).get,
          u.assignments.map(a => (a.key match {
            case k: UnresolvedAttribute => k.nameParts.last
            case other => throw new IllegalArgumentException(
              s"UPDATE zlayout: SET target must be a plain column, got ${other.sql}")
          }, a.value.sql)),
          u.condition.map(_.sql))
      case i: InsertIntoStatement if layoutPath(i.table).isDefined =>
        require(!i.overwrite && i.partitionSpec.isEmpty,
          "INSERT into zlayout supports only plain `INSERT INTO zlayout.`path` " +
            "<query>` — the layout appends exactly-once batches (use MERGE for " +
            "upserts, DELETE + compaction for replacement; INSERT OVERWRITE and " +
            "partition specs have no layout meaning and are refused)")
        GraftAppendCommand(layoutPath(i.table).get, i.query)
      case s: org.apache.spark.sql.catalyst.plans.logical.ShowTables
          if zNamespace(s.namespace) =>
        GraftShowTablesCommand(warehouse, s.pattern)
      case c: CreateTableAsSelect if ddlPath(c.name).isDefined =>
        val props = c.tableSpec match {
          case ts: UnresolvedTableSpec => ts.properties
          case _ => Map.empty[String, String]
        }
        GraftCreateTableCommand(ddlPath(c.name).get, props, c.query, c.ignoreIfExists)
      // the session-catalog conversion (ResolveSessionCatalog) usually
      // wins the race within the resolution batch and lowers the V2 CTAS
      // to the V1 CreateTable precursor before this rule sees it — claim
      // it back by its identifier's database
      case c: org.apache.spark.sql.execution.datasources.CreateTable
          if c.tableDesc.identifier.database.exists(_.equalsIgnoreCase("zlayout")) =>
        c.query match {
          case Some(q) =>
            GraftCreateTableCommand(
              resolveIdent(c.tableDesc.identifier.table), c.tableDesc.properties, q,
              c.mode == org.apache.spark.sql.SaveMode.Ignore)
          case None =>
            throw new IllegalArgumentException(
              "CREATE TABLE zlayout.<name> requires AS SELECT — a layout is " +
                "created by clustering data; an empty layout has no boundary " +
                "statistics to freeze")
        }
      case c: CreateTable if ddlPath(c.name).isDefined =>
        throw new IllegalArgumentException(
          "CREATE TABLE zlayout.<name> requires AS SELECT — a layout is " +
            "created by clustering data (CREATE TABLE zlayout.t TBLPROPERTIES" +
            "('cols'='x,y'[, 'nfiles'='8', 'bits'='8', 'curve'='morton', " +
            "'layout'='quantile']) AS SELECT …); an empty layout has no " +
            "boundary statistics to freeze")
      case d: DropTable if ddlPath(d.child).isDefined =>
        GraftDropTableCommand(ddlPath(d.child).get, d.ifExists)
      // ANALYZE TABLE … COMPUTE STATISTICS [FOR COLUMNS c, … | FOR ALL
      // COLUMNS] → ZOrder.analyzeLayout (one live-view pass: per-column
      // rows/nulls/NDV into `_zstats` + the table-level _SNAPSHOT that
      // feeds the ZStatsRule planner bridge). The bare form analyzes
      // the layout's clustering lanes (_zmeta cols — the columns every
      // skipping/boundary decision derives from).
      case a: org.apache.spark.sql.catalyst.plans.logical.AnalyzeTable
          if ddlPath(a.child).isDefined =>
        require(a.partitionSpec.isEmpty,
          "ANALYZE zlayout: PARTITION specs have no layout meaning " +
            "(layouts partition by clustered files, not hive partitions)")
        require(!a.noScan,
          "ANALYZE zlayout … NOSCAN is refused: layout stats ARE one scan " +
            "of the live view (row counts, NDV, and the planner-bridge " +
            "snapshot all derive from it) — run without NOSCAN")
        GraftAnalyzeCommand(ddlPath(a.child).get, Nil, allColumns = false)
      case a: org.apache.spark.sql.catalyst.plans.logical.AnalyzeColumn
          if ddlPath(a.child).isDefined =>
        GraftAnalyzeCommand(ddlPath(a.child).get,
          a.columnNames.getOrElse(Nil), a.allColumns)
      case t: RelationTimeTravel if layoutPath(t.relation).isDefined =>
        val version = t.version.getOrElse(throw new IllegalArgumentException(
          "zlayout time travel is by VERSION AS OF <batch id> (commit ids are " +
            "the layout's version space; it records no wall-clock timestamps)"))
        ZOrder.readAsOfBatch(spark, layoutPath(t.relation).get, version.toLong,
          applyDeletes = true).queryExecution.analyzed
      case u: UnresolvedRelation if layoutPath(u).isDefined =>
        ZOrder.readCommitted(spark, layoutPath(u).get, applyDeletes = true)
          .queryExecution.analyzed
    }
}

/** `DELETE FROM zlayout.`path` WHERE p` lowered to positional
  * tombstones: one pushdown-friendly committed-view scan, no data file
  * rewritten ([[ZOrder.deleteWhere]]). The predicate travels as its SQL
  * text (it must re-resolve against the layout's own scan, not against
  * this command's empty output).
  */
case class GraftDeleteCommand(path: String, conditionSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted_rows", LongType)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(ZOrder.deleteWhere(session, path, expr(conditionSql))))
}

/** `INSERT INTO zlayout.`path` <query>` lowered to an exactly-once
  * batch append ([[ZOrder.appendQuantileOnce]]): rows key through the
  * layout's frozen `_zqbounds`, publish under the next batch id after
  * the max committed, and land atomically behind a commit marker —
  * an INSERT is one snapshot, visible to committed reads only after
  * its marker, time-travelable by its id. Parameters come from
  * `_zmeta`; the source query is analyzed at execution. Returns
  * (`batch_id`, `inserted_files`).
  */
case class GraftAppendCommand(path: String, source: LogicalPlan)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("batch_id", LongType)(),
    AttributeReference("inserted_files", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    implicit val fc: FioConf = FioConf.of(session)
    val src = org.apache.spark.sql.GraftSqlBridge.ofRows(session, source)
    val (cols, bits, keyCol, curve) = ZOrder.readMeta(path)
    // the id derives INSIDE the table lock and publishes requireFresh in
    // the same span (r19 advice: two racing INSERTs reading the same
    // maxCommitted made the later one silently no-op — inserted_files=0
    // reported as success); the publish itself re-enters the held lock
    ZOrder.withTableLock(path) {
      val batchId = ZOrder.nextBatchId(path)
      // route by layout family: a quantile layout carries its frozen
      // `_zqbounds` boundary table; a linear layout freezes (min, max)
      // lane bounds from its manifest — both exactly-once
      val files =
        if (graft.io.Fio.exists(graft.io.Fio.child(path, "_zqbounds")))
          ZOrder.appendQuantileOnce(src, cols, path, batchId, nFiles = 1,
            bits = bits, keyCol = keyCol, curve = curve, requireFresh = true)
        else
          ZOrder.appendOnce(src, cols, path, batchId, nFiles = 1,
            bits = bits, keyCol = keyCol, curve = curve, requireFresh = true)
      Seq(Row(batchId, files.toLong))
    }
  }
}

/** `MERGE INTO zlayout.`path` … UPDATE SET * / INSERT *` lowered to the
  * layout's replay-idempotent merge-on-read upsert: the source plan is
  * analyzed at execution (so views, subqueries, and other zlayout
  * tables all work), clustering parameters come from the layout's own
  * `_zmeta`, and the batch id is the next one after the max committed.
  */
case class GraftMergeCommand(path: String, source: LogicalPlan, keys: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("updated_rows", LongType)(),
    AttributeReference("inserted_files", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    implicit val fc: FioConf = FioConf.of(session)
    val src = org.apache.spark.sql.GraftSqlBridge.ofRows(session, source)
    val (cols, bits, keyCol, curve) = ZOrder.readMeta(path)
    // id derived inside the table lock; a marker appearing for it fails
    // loud instead of the old silent replay short-circuit, whose append
    // no-opped while deleteMatching still tombstoned the matched rows
    val (_, tombs, files) = ZOrder.mergeIntoNext(
      session, path, src, keys, cols,
      nFiles = 1, bits = bits, keyCol = keyCol, curve = curve)
    Seq(Row(tombs, files.toLong))
  }
}

/** `CREATE TABLE zlayout.<name> TBLPROPERTIES('cols'='x,y', …) AS
  * SELECT …` — bootstrap a NAMED quantile (default) or linear layout
  * under the zlayout warehouse by clustering the source query. The
  * clustering parameters travel as table properties: `cols` (required,
  * comma-separated lane columns), `nfiles` (8), `bits` (8), `curve`
  * (`morton`|`hilbert`), `layout` (`quantile`|`linear`). The created
  * table carries its parameters in `_zmeta`, so every later verb (DML,
  * INSERT, time travel, maintenance) recovers them by name. `IF NOT
  * EXISTS` short-circuits; re-creating an existing table otherwise
  * fails loud.
  */
case class GraftCreateTableCommand(
    path: String, props: Map[String, String], source: LogicalPlan,
    ignoreIfExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("created", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    implicit val fc: FioConf = FioConf.of(session)
    def prop(k: String): Option[String] =
      props.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v }
    if (graft.io.Fio.exists(graft.io.Fio.child(path, "_zmeta"))) {
      if (ignoreIfExists) return Seq(Row(0L))
      throw new IllegalArgumentException(
        s"zlayout table already exists at $path (use CREATE TABLE IF NOT " +
          "EXISTS to no-op, DROP TABLE to replace)")
    }
    val cols = prop("cols").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "CREATE TABLE zlayout requires TBLPROPERTIES('cols'='c1,c2,…') — " +
          "the lane columns the layout clusters on"))
    val nFiles = prop("nfiles").map(_.toInt).getOrElse(8)
    val bits = prop("bits").map(_.toInt).getOrElse(8)
    val curve = prop("curve").getOrElse("morton")
    val layout = prop("layout").getOrElse("quantile")
    val src = org.apache.spark.sql.GraftSqlBridge.ofRows(session, source)
    layout.toLowerCase match {
      case "quantile" => ZOrder.clusterQuantile(src, cols, nFiles, path, bits, curve = curve)
      case "linear" => ZOrder.cluster(src, cols, nFiles, path, bits, curve = curve)
      case other => throw new IllegalArgumentException(
        s"unknown zlayout 'layout' property: $other (quantile|linear)")
    }
    Seq(Row(1L))
  }
}

/** `DROP TABLE zlayout.<name>`: delete the layout directory — data,
  * sidecars, and commit history. `IF EXISTS` tolerates absence.
  */
case class GraftDropTableCommand(path: String, ifExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("dropped", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    implicit val fc: FioConf = FioConf.of(session)
    if (!graft.io.Fio.exists(path)) {
      if (ifExists) return Seq(Row(0L))
      throw new IllegalArgumentException(s"zlayout table not found at $path")
    }
    graft.io.Fio.delete(path)
    Seq(Row(1L))
  }
}

/** `SHOW TABLES IN zlayout ['pattern']`: list the named layout tables
  * under the warehouse — a directory is a table iff it carries the
  * `_zmeta` parameters sidecar. Output mirrors Spark's SHOW TABLES
  * (namespace, tableName, isTemporary).
  */
case class GraftShowTablesCommand(warehouse: String, pattern: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", org.apache.spark.sql.types.StringType)(),
    AttributeReference("tableName", org.apache.spark.sql.types.StringType)(),
    AttributeReference("isTemporary", org.apache.spark.sql.types.BooleanType)())
  override def run(session: SparkSession): Seq[Row] = {
    implicit val fc: FioConf = FioConf.of(session)
    if (!graft.io.Fio.exists(warehouse)) return Seq.empty
    val re = pattern.map(p =>
      java.util.regex.Pattern.compile(
        p.replace("*", ".*").replace("|", "|"), // SHOW TABLES glob: * = any
        java.util.regex.Pattern.CASE_INSENSITIVE))
    graft.io.Fio.listNames(warehouse).sorted
      .filter(n => graft.io.Fio.exists(graft.io.Fio.child(warehouse, s"$n/_zmeta")))
      .filter(n => re.forall(_.matcher(n).matches()))
      .map(n => Row("zlayout", n, false))
  }
}

/** `ANALYZE TABLE zlayout.<t> COMPUTE STATISTICS [FOR COLUMNS …]` →
  * [[ZOrder.analyzeLayout]]: one map-side-combined pass over the LIVE
  * view (tombstones subtracted) persists per-column rows/nulls/HLL-NDV
  * to `_zstats` and the table-level `_SNAPSHOT` the
  * [[ZStatsRule]] planner bridge serves — so `ANALYZE` from plain SQL
  * is what flips a deleted-heavy layout's joins back to broadcast.
  * Column scope: explicit FOR COLUMNS list; FOR ALL COLUMNS = every
  * data column; the bare form = the `_zmeta` clustering lanes. Returns
  * the stats rows (the q40 shape: col_name, n_rows, n_nulls, ndv).
  */
case class GraftAnalyzeCommand(path: String, cols: Seq[String], allColumns: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", org.apache.spark.sql.types.StringType)(),
    AttributeReference("n_rows", LongType)(),
    AttributeReference("n_nulls", LongType)(),
    AttributeReference("ndv", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    implicit val fc: FioConf = FioConf.of(session)
    val (lanes, _, keyCol, _) = ZOrder.readMeta(path)
    val target =
      if (allColumns)
        ZOrder.readCommitted(session, path).schema.fieldNames
          .filterNot(_ == keyCol).toSeq
      else if (cols.nonEmpty) cols
      else lanes
    ZOrder.analyzeLayout(session, path, target).collect().toSeq
  }
}

/** `UPDATE zlayout.`path` SET c = e, … [WHERE p]` lowered to the
  * layout's version-atomic tombstone+append update
  * ([[ZOrder.updateWhere]]): new versions of every matching live row
  * publish as one exactly-once batch, old versions tombstone with the
  * batch's own id. SET targets and the predicate travel as SQL text and
  * re-resolve against the layout's own scan (the GraftDeleteCommand
  * discipline). Returns (`updated_rows`, `batch_id`).
  */
case class GraftUpdateCommand(
    path: String, sets: Seq[(String, String)], conditionSql: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("updated_rows", LongType)(),
    AttributeReference("batch_id", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (batchId, updated, _) = ZOrder.updateWhere(
      session, path,
      conditionSql.map(expr).getOrElse(org.apache.spark.sql.functions.lit(true)),
      sets.map { case (c, v) => (c, expr(v)) })
    Seq(Row(updated, batchId))
  }
}
