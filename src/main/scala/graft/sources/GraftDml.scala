package graft.sources

import org.apache.spark.sql.{DataFrame, GraftShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType}

/** SQL DML on snapshot tables — the mutation surface reachable from
  * `spark.sql`, closing the gap where the READ path was first-class SQL
  * (the `graft_snapshot`/`graft_changes` TVFs) but every WRITE verb was
  * Scala-API only. The reference's entire mutation surface is SQL
  * strings (database.py:18-41, 66-71); a warehouse user's first
  * instinct is `UPDATE t SET ... WHERE ...`, and this module accepts
  * exactly that grammar — SPARK'S OWN parser produces the
  * `UpdateTable`/`DeleteFromTable`/`MergeIntoTable` logical plans and
  * this module lowers them onto the file-granular snapshot verbs
  * ([[SnapshotTable.updateWhere]]/[[SnapshotTable.deleteWhere]]/
  * [[SnapshotTable.mergeInto]]), inheriting their IO ∝ churn and
  * atomic-commit properties.
  *
  * Two routes to the same lowering:
  *
  *   - `graft_dml('<statement>')` — a runtime-registered procedure TVF
  *     (works on a PLAIN session after `GraftExtensions.register`):
  *     {{{
  *     SELECT * FROM graft_dml("UPDATE `/path/to/t` SET c = c + 1 WHERE k % 2 = 0")
  *     }}}
  *     The statement executes when `spark.sql` analyzes the call (the
  *     procedure convention the snapshot TVFs established) and the call
  *     returns one row: (verb, version, rows_affected, files_rewritten).
  *
  *   - native `UPDATE`/`DELETE`/`MERGE INTO` statements on a session
  *     built with `spark.sql.extensions=graft.GraftExtensions`: a
  *     resolution rule intercepts the parsed DML whose target is a
  *     snapshot-table PATH (backquoted identifier) and replaces it with
  *     a [[SnapshotDmlCommand]] that `spark.sql` executes eagerly like
  *     every other command, returning the same one-row result.
  *
  * Supported grammar (everything else raises a clear error):
  *   - `UPDATE <t> SET col = expr[, ...] [WHERE <cond>]` — unqualified
  *     column references (the target is a path, not an aliased view)
  *   - `DELETE FROM <t> [WHERE <cond>]`
  *   - `MERGE INTO <t> [AS a] USING <source> [AS b] ON a.k = b.k
  *      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *     — the key-equality upsert [[SnapshotTable.mergeInto]] implements;
  *     `<source>` may be any resolvable relation (temp view, subquery,
  *     `parquet.`-style path)
  */
object GraftDml {

  /** Is `parts` a snapshot-table path target: a single path-shaped
    * identifier whose `_manifests` dir exists?
    */
  private[graft] def snapshotPathOf(spark: SparkSession,
      parts: Seq[String]): Option[String] = parts match {
    case Seq(p) if p.contains('/') =>
      try {
        val dir = new org.apache.hadoop.fs.Path(p, "_manifests")
        val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (f.exists(dir)) Some(p) else None
      } catch { case _: Exception => None }
    case _ => None
  }

  private def unwrap(plan: LogicalPlan): LogicalPlan = plan match {
    case SubqueryAlias(_, child) => unwrap(child)
    case other => other
  }

  private[graft] def targetPath(spark: SparkSession,
      target: LogicalPlan): Option[String] = unwrap(target) match {
    case UnresolvedRelation(parts, _, _) => snapshotPathOf(spark, parts)
    case _ => None
  }

  private def colName(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => throw new IllegalArgumentException(
      s"expected a column reference, got $other")
  }

  /** Lower one parsed DML plan onto the snapshot verbs. Returns
    * (verb, new version, rows affected, files rewritten; -1 when the
    * verb does not report a rewrite count).
    */
  private[graft] def runParsed(spark: SparkSession, parsed: LogicalPlan)
      : (String, Long, Long, Long) = parsed match {

    case UpdateTable(target, assignments, condition) =>
      val path = targetPath(spark, target).getOrElse(throw new
        IllegalArgumentException(s"UPDATE target is not a snapshot table " +
          s"path: ${unwrap(target)}"))
      val assigns = assignments.map { case Assignment(k, v) =>
        colName(k) -> GraftShim.column(v)
      }.toMap
      val cond = condition.map(GraftShim.column)
        .getOrElse(org.apache.spark.sql.functions.lit(true))
      val (v, matched, files) =
        SnapshotTable.updateWhere(spark, path, cond, assigns)
      ("update", v, matched, files.toLong)

    case DeleteFromTable(target, condition) =>
      val path = targetPath(spark, target).getOrElse(throw new
        IllegalArgumentException(s"DELETE target is not a snapshot table " +
          s"path: ${unwrap(target)}"))
      val (v, deleted, files) =
        SnapshotTable.deleteWhere(spark, path, GraftShim.column(condition))
      ("delete", v, deleted, files.toLong)

    case m: MergeIntoTable =>
      val path = targetPath(spark, m.targetTable).getOrElse(throw new
        IllegalArgumentException(s"MERGE target is not a snapshot table " +
          s"path: ${unwrap(m.targetTable)}"))
      val key = m.mergeCondition match {
        case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
            if l.nameParts.last == r.nameParts.last => l.nameParts.last
        case other => throw new IllegalArgumentException(
          "MERGE ON must be a key equality `t.k = s.k` on the same " +
            s"column name, got $other")
      }
      m.matchedActions match {
        case Seq(UpdateStarAction(None)) => ()
        case other => throw new IllegalArgumentException(
          "only WHEN MATCHED THEN UPDATE SET * is supported, got " + other)
      }
      m.notMatchedActions match {
        case Seq(InsertStarAction(None)) => ()
        case other => throw new IllegalArgumentException(
          "only WHEN NOT MATCHED THEN INSERT * is supported, got " + other)
      }
      require(m.notMatchedBySourceActions.isEmpty,
        "WHEN NOT MATCHED BY SOURCE is not supported")
      val source = GraftShim.ofRows(spark, m.sourceTable)
      val (v, updated, inserted, files) =
        SnapshotTable.mergeInto(spark, path, source, key)
      ("merge", v, updated + inserted, files.toLong)

    case other => throw new IllegalArgumentException(
      "graft_dml supports UPDATE / DELETE / MERGE INTO statements, got: " +
        other.nodeName)
  }

  /** Parse and execute `stmt`, returning the one-row result frame —
    * the body of the `graft_dml` procedure TVF.
    */
  def execute(spark: SparkSession, stmt: String): DataFrame = {
    val (verb, v, rows, files) =
      runParsed(spark, GraftShim.parsePlan(spark, stmt))
    import org.apache.spark.sql.functions.lit
    spark.range(1).select(
      lit(verb).as("verb"), lit(v).as("version"),
      lit(rows).as("rows_affected"), lit(files).as("files_rewritten"))
  }
}

/** The eagerly-executed command form of [[GraftDml]] for the
  * extensions-injected native-DML path: `spark.sql("UPDATE `...` ...")`
  * on a session with `graft.GraftExtensions` runs this like any other
  * SQL command and returns (verb, version, rows_affected,
  * files_rewritten). The carried `parsed` plan is a constructor
  * argument, not a child, so the command itself is always resolved.
  */
final case class SnapshotDmlCommand(parsed: LogicalPlan)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("verb", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("rows_affected", LongType, nullable = false)(),
    AttributeReference("files_rewritten", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (verb, v, rows, files) = GraftDml.runParsed(spark, parsed)
    Seq(Row(verb, v, rows, files))
  }
}
