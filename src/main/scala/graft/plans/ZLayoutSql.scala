package graft.plans

import graft.io.FioConf
import graft.operators.ZOrder
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction}
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
  *  - `INSERT INTO zlayout.`/path` <query>`           → exactly-once
  *    batch append through the frozen boundaries
  *    ([[ZOrder.appendQuantileOnce]] at the next batch id); returns
  *    (`batch_id`, `inserted_files`);
  *  - `MERGE INTO zlayout.`/path` t USING src s ON t.k = s.k [AND …]
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *    → merge-on-read upsert ([[ZOrder.mergeInto]]) with the layout's
  *    own `_zmeta` parameters and the next batch id; returns
  *    (`updated_rows`, `inserted_files`).
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

  /** The layout path named by a (possibly aliased) `zlayout.`path``
    * two-part identifier, if this subtree is one.
    */
  private def layoutPath(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => layoutPath(child)
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("zlayout") =>
      Some(u.multipartIdentifier(1))
    case _ => None
  }

  /** The equi-key column names of a MERGE condition: a conjunction of
    * `t.k = s.k` terms, same column name on both sides. Anything else
    * is refused — mapping an arbitrary ON expression onto the layout's
    * key-match upsert would silently change semantics.
    */
  private def equiKeys(cond: Expression): Seq[String] = cond match {
    case And(l, r) => equiKeys(l) ++ equiKeys(r)
    case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
        if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
      Seq(a.nameParts.last)
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
          layoutPath(m.targetTable).get, m.sourceTable, equiKeys(m.mergeCondition))
      case i: InsertIntoStatement if layoutPath(i.table).isDefined =>
        require(!i.overwrite && i.partitionSpec.isEmpty,
          "INSERT into zlayout supports only plain `INSERT INTO zlayout.`path` " +
            "<query>` — the layout appends exactly-once batches (use MERGE for " +
            "upserts, DELETE + compaction for replacement; INSERT OVERWRITE and " +
            "partition specs have no layout meaning and are refused)")
        GraftAppendCommand(layoutPath(i.table).get, i.query)
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
    val batchId = ZOrder.committedBatches(path).map(_.toLong)
      .foldLeft(-1L)(math.max) + 1L
    // route by layout family: a quantile layout carries its frozen
    // `_zqbounds` boundary table; a linear layout freezes (min, max)
    // lane bounds from its manifest — both exactly-once
    val files =
      if (graft.io.Fio.exists(graft.io.Fio.child(path, "_zqbounds")))
        ZOrder.appendQuantileOnce(src, cols, path, batchId, nFiles = 1,
          bits = bits, keyCol = keyCol, curve = curve)
      else
        ZOrder.appendOnce(src, cols, path, batchId, nFiles = 1,
          bits = bits, keyCol = keyCol, curve = curve)
    Seq(Row(batchId, files.toLong))
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
    val batchId = ZOrder.committedBatches(path).map(_.toLong)
      .foldLeft(-1L)(math.max) + 1L
    val (tombs, files) = ZOrder.mergeInto(
      session, path, src, keys, cols, batchId,
      nFiles = 1, bits = bits, keyCol = keyCol, curve = curve)
    Seq(Row(tombs, files.toLong))
  }
}
