package graft

import graft.functions.{AbbrevPairs, FuzzyMatch, PartialRatioExpr, RowDensityAgg}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.udf

/** SQL surface for the custom operators: after registration, plain
  * `spark.sql` users can call
  *
  *   - `partial_ratio(a, b)`         -> int 0..100 (Catalyst expression)
  *   - `abbrev_pairs(text)`          -> array<struct<abbrev,expansion>>
  *     (explode for the UDTF shape)
  *   - `abbrev_pairs_gen(text)`      -> native Generator (LATERAL VIEW
  *     position; no intermediate array)
  *   - `graft_row_density(nonNull)`  -> double (typed Aggregator, width 4)
  *
  * Two registration paths, both public API:
  *   - `GraftExtensions.register(spark)` at runtime, or
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build
  *     (injects partial_ratio as a native function via
  *     `SparkSessionExtensions.injectFunction`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => GraftExtensions.SelfSimilarityFold)
    val builder: Seq[Expression] => Expression = { children =>
      require(children.size == 2,
        s"partial_ratio requires exactly 2 arguments, got ${children.size}")
      PartialRatioExpr(children(0), children(1))
    }
    e.injectFunction((
      FunctionIdentifier("partial_ratio"),
      new ExpressionInfo(classOf[PartialRatioExpr].getName, "partial_ratio"),
      builder))
    val genBuilder: Seq[Expression] => Expression = { children =>
      require(children.size == 1,
        s"abbrev_pairs_gen requires exactly 1 argument, got ${children.size}")
      graft.functions.AbbrevPairsGen(children.head)
    }
    e.injectFunction((
      FunctionIdentifier("abbrev_pairs_gen"),
      new ExpressionInfo(classOf[graft.functions.AbbrevPairsGen].getName,
        "abbrev_pairs_gen"),
      genBuilder))

    // Snapshot tables as SQL TABLE-VALUED FUNCTIONS — the seam that
    // makes the transactional layer first-class for plain-SQL users:
    //
    //   SELECT * FROM graft_snapshot('<table>')            -- current
    //   SELECT * FROM graft_snapshot('<table>', 2)         -- time travel
    //   SELECT * FROM graft_changes('<table>', 1, 3)       -- change feed
    //
    // The builders resolve literal arguments at ANALYSIS time (the
    // session is active) and splice in the corresponding DataFrame's
    // logical plan: for `graft_snapshot` on a DV-free snapshot that is
    // the manifest-backed `SnapshotFileIndex` relation — fully
    // Catalyst-planned, so predicates above the TVF still prune files —
    // and for DV-bearing snapshots the anti-join read (scan-planning
    // pruning does not apply there, correctness does). Joins,
    // filters, and CTEs over the TVFs compose like any other relation.
    e.injectTableFunction((
      FunctionIdentifier("graft_snapshot"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "graft_snapshot"),
      GraftExtensions.snapshotTvf))
    e.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "graft_changes"),
      GraftExtensions.changesTvf))
    e.injectTableFunction((
      FunctionIdentifier("graft_dml"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "graft_dml"),
      GraftExtensions.dmlTvf))
    e.injectTableFunction((
      FunctionIdentifier("graft_history"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "graft_history"),
      GraftExtensions.historyTvf))
    e.injectTableFunction((
      FunctionIdentifier("graft_detail"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "graft_detail"),
      GraftExtensions.detailTvf))
    e.injectTableFunction((
      FunctionIdentifier("graft_optimize"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "graft_optimize"),
      GraftExtensions.optimizeTvf))
    e.injectTableFunction((
      FunctionIdentifier("graft_maintain"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "graft_maintain"),
      GraftExtensions.maintainTvf))
    e.injectTableFunction((
      FunctionIdentifier("graft_restore"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "graft_restore"),
      GraftExtensions.restoreTvf))
    for ((n, f) <- Seq(
      "graft_files" -> GraftExtensions.filesTvf,
      "graft_partitions" -> GraftExtensions.partitionsTvf,
      "graft_branch" -> GraftExtensions.branchTvf,
      "graft_refs" -> GraftExtensions.refsTvf,
      "graft_create_branch" -> GraftExtensions.createBranchTvf,
      "graft_branch_dml" -> GraftExtensions.branchDmlTvf,
      "graft_publish_branch" -> GraftExtensions.publishBranchTvf,
      "graft_drop_branch" -> GraftExtensions.dropBranchTvf,
      "graft_create_tag" -> GraftExtensions.createTagTvf,
      "graft_drop_tag" -> GraftExtensions.dropTagTvf,
      "graft_create_mv" -> GraftExtensions.createMvTvf,
      "graft_refresh_mv" -> GraftExtensions.refreshMvTvf))
      e.injectTableFunction((FunctionIdentifier(n),
        new ExpressionInfo(GraftExtensions.getClass.getName, n), f))
    // NATIVE DML on snapshot-table paths: Spark's grammar already
    // parses `UPDATE `/path` SET...` / `DELETE FROM` / `MERGE INTO`
    // into their catalyst plans; this rule intercepts the ones whose
    // target path is a snapshot table (has `_manifests`) and lowers
    // them to the eagerly-executed SnapshotDmlCommand. Non-snapshot DML
    // targets pass through untouched for Spark's own v2 handling.
    e.injectResolutionRule(session =>
      new GraftExtensions.SnapshotDmlRule(session))
    // NATIVE DDL (CREATE TABLE ... AS / DROP TABLE on a path) must be
    // intercepted at PARSE time: the analyzer's own ResolveSessionCatalog
    // converts CTAS to a v1 catalog command in the same resolution batch
    // BEFORE any injected rule runs, and the session catalog rejects
    // path-shaped names. The target test (a single backquoted identifier
    // containing '/') is purely syntactic, so no session state is
    // needed at parse time; everything else delegates verbatim.
    e.injectParser((session, delegate) =>
      new GraftExtensions.SnapshotDdlParser(session, delegate))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{
    If, IsNull, Literal, RLike}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.catalyst.rules.Rule
  import org.apache.spark.sql.types.IntegerType

  /** Optimizer rule: fold `partial_ratio(x, x)` — the diagonal of a
    * fuzzy self-join — into its closed form, replacing the O(|x|²)
    * sliding-window scan with one trim:
    *
    *   null input          -> null  (the expression is null-intolerant)
    *   control/space-only x -> 0    (norm(x) is empty; partialRatio
    *                                 defines empty -> 0)
    *   anything else       -> 100   (equal normalized strings score 100)
    *
    * norm(x) is empty iff Java String.trim empties x, i.e. every char
    * is <= U+0020 — NOT what Spark's `trim` tests (it strips only
    * 0x20), and wider than `\s`, so the emptiness test is the explicit
    * char-class regex with \A..\z anchors ($ would tolerate a trailing
    * newline). Guarded on deterministic children (a rand()-bearing
    * argument is not "the same x" twice). Exactness is asserted in
    * ExtensionsSuite against the unfolded expression, including tab and
    * control-char inputs.
    */
  object SelfSimilarityFold extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case graft.functions.PartialRatioExpr(l, r)
            if l.deterministic && l.semanticEquals(r) =>
          If(IsNull(l), Literal.create(null, IntegerType),
            If(RLike(l, Literal("\\A[\\x00-\\x20]*\\z")),
              Literal(0), Literal(100)))
      }
  }

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def litString(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
        if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a non-null literal, got $other")
  }
  private def litLong(e: Expression, what: String): Long = {
    val s = litString(e, what).trim
    require(scala.util.Try(s.toLong).isSuccess,
      s"$what must be an integer, got '$s'")
    s.toLong
  }

  /** Epoch millis of a timestamp-like LITERAL (typed timestamp / NTZ /
    * date, a string rendering, or a cast of one) — ONE decoder shared
    * by the TVF argument resolution and the native `TIMESTAMP AS OF`
    * lowering, so both surfaces resolve the same literal to the same
    * version. Typed timestamp literals carry epoch MICROS (already an
    * instant — Spark anchored the text in the session zone at parse
    * time); NTZ micros are a LOCAL datetime and date literals epoch
    * DAYS, and string renderings are zone-free text — all three are
    * anchored in the SAME session zone, so `TIMESTAMP '…'` and '…'
    * for one wall-clock time always resolve to one version.
    */
  private def tsMillisOfLiteral(spark: SparkSession,
      e: Expression): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long,
        org.apache.spark.sql.types.TimestampType) =>
      Math.floorDiv(v, 1000L)
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long,
        org.apache.spark.sql.types.TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(v, 1000000L),
        (Math.floorMod(v, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
        .atZone(graft.sources.SnapshotTable.sessionZone(spark))
        .toInstant.toEpochMilli
    case org.apache.spark.sql.catalyst.expressions.Literal(d: Integer,
        org.apache.spark.sql.types.DateType) =>
      java.time.LocalDate.ofEpochDay(d.longValue)
        .atStartOfDay(graft.sources.SnapshotTable.sessionZone(spark))
        .toInstant.toEpochMilli
    case org.apache.spark.sql.catalyst.expressions.Literal(s,
        org.apache.spark.sql.types.StringType) if s != null =>
      graft.sources.SnapshotTable.parseTsMillis(spark, s.toString)
    case c: org.apache.spark.sql.catalyst.expressions.Cast =>
      tsMillisOfLiteral(spark, c.child)
    case other => throw new IllegalArgumentException(
      "time travel timestamps must be literal timestamp/date/string " +
        s"values (or casts of them), got $other")
  }

  /** `graft_snapshot('<table>'[, version | TIMESTAMP '…'])` — the
    * snapshot (current or time-traveled) as a SQL relation. A second
    * argument of timestamp/date type (or a non-numeric string) is
    * `TIMESTAMP AS OF`: the latest version committed at or before it
    * ([[graft.sources.SnapshotTable.versionAtTimestamp]]); a numeric
    * one is `VERSION AS OF`.
    */
  val snapshotTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 1 || args.size == 2,
      s"graft_snapshot(table[, version]) takes 1-2 arguments, got ${args.size}")
    val spark = SparkSession.active
    val table = litString(args.head, "graft_snapshot table path")
    // resolve the version ONCE and pin it for both the DV check and the
    // read — resolving twice would race a concurrent commit (the DV
    // decision could be made on a different snapshot than the scan)
    val version =
      if (args.size == 2) versionArg(spark, table, args(1),
        "graft_snapshot")
      else graft.sources.SnapshotTable.currentVersion(spark, table)
    pinnedSnapshotPlan(spark, table, version)
  }

  /** A version-OR-timestamp TVF argument: integral (or numeric-string)
    * literals are versions; timestamp/date/non-numeric-string literals
    * resolve through the commit-time high-water lookup
    * ([[graft.sources.SnapshotTable.versionAtTimestamp]]). Anything
    * else errors loudly — a silently misread type (e.g. NTZ micros as
    * a version number) is the failure mode this match exists to close.
    */
  private def versionArg(spark: SparkSession, table: String,
      e: Expression, what: String): Long = e.dataType match {
    case org.apache.spark.sql.types.TimestampType |
        org.apache.spark.sql.types.TimestampNTZType |
        org.apache.spark.sql.types.DateType =>
      graft.sources.SnapshotTable.versionAtTimestamp(spark, table,
        tsMillisOfLiteral(spark, e))
    case org.apache.spark.sql.types.StringType
        if scala.util.Try(
          litString(e, s"$what version").trim.toLong).isFailure =>
      graft.sources.SnapshotTable.versionAtTimestamp(spark, table,
        tsMillisOfLiteral(spark, e))
    case org.apache.spark.sql.types.ByteType |
        org.apache.spark.sql.types.ShortType |
        org.apache.spark.sql.types.IntegerType |
        org.apache.spark.sql.types.LongType |
        org.apache.spark.sql.types.StringType =>
      val v = litLong(e, s"$what version")
      // the READER option timestampAsOf reads the identical all-digit
      // string as epoch millis; silently reading it here as a version
      // would make the two time-travel surfaces disagree on one input.
      // No real table reaches 1e11 versions, and 1e11 millis is 1973 —
      // the ranges cannot collide, so reject the ambiguous zone loudly.
      require(v < 100000000000L,
        s"$what: '$v' looks like epoch millis, not a version number — " +
          "pass a TIMESTAMP '…' literal (or the timestampAsOf reader " +
          "option) for timestamp time travel")
      v
    case other => throw new IllegalArgumentException(
      s"$what takes a version number or a timestamp/date/string " +
        s"literal, got type $other")
  }

  /** The pinned time-traveled read as a logical plan: the
    * manifest-FileIndex scan when DV-free (Catalyst file pruning
    * stays live above it), the DV-applying read otherwise — shared by
    * the TVF and the native `VERSION/TIMESTAMP AS OF` lowering.
    */
  private def pinnedSnapshotPlan(spark: SparkSession, table: String,
      version: Long): LogicalPlan = {
    val snap = graft.sources.SnapshotTable.readManifest(spark, table,
      version)
    val df =
      if (graft.sources.SnapshotTable.fileIndexExact(snap))
        graft.sources.SnapshotScan.scan(spark, table, Some(version))._1
      else graft.sources.SnapshotTable.read(spark, table, Some(version))
    df.queryExecution.logical
  }

  /** `graft_dml('<UPDATE|DELETE|MERGE statement>')` — SQL DML on
    * snapshot tables as a procedure TVF (see [[graft.sources.GraftDml]]).
    * The call resolves to an EXPLAIN-safe leaf command
    * ([[graft.sources.GraftProcedureCommand]]): the statement runs when
    * the query EXECUTES, not while the plan is built, so EXPLAIN over
    * the call mutates nothing. Returns one row
    * (verb, version, rows_affected, files_rewritten).
    */
  val dmlTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 1,
      s"graft_dml(statement) takes 1 argument, got ${args.size}")
    val stmt = litString(args.head, "graft_dml statement")
    graft.sources.GraftProcedureCommand(s"graft_dml",
      Seq("verb" -> org.apache.spark.sql.types.StringType,
        "version" -> org.apache.spark.sql.types.LongType,
        "rows_affected" -> org.apache.spark.sql.types.LongType,
        "files_rewritten" -> org.apache.spark.sql.types.LongType),
      spark => graft.sources.GraftDml.execute(spark, stmt)
        .collect().toIndexedSeq)
  }

  /** `graft_branch_dml('<table>', '<branch>', '<statement>')` — SQL
    * DML executed ON A BRANCH: the statement (whose target must be the
    * same table path) runs inside [[graft.sources.SnapshotTable
    * .withBranch]], so UPDATE/DELETE/MERGE/INSERT commit to the next
    * staged-branch manifest and main stays untouched until publish —
    * the WAP audit-fix-publish arm, SQL-reachable end to end
    * (create branch → fix on it → `graft_publish_branch`). Deferred
    * like every side-effecting procedure (EXPLAIN-safe).
    */
  val branchDmlTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 3,
      s"graft_branch_dml(table, branch, statement) takes 3 " +
        s"arguments, got ${args.size}")
    val table = litString(args.head, "graft_branch_dml table path")
    val name = litString(args(1), "graft_branch_dml branch name")
    val stmt = litString(args(2), "graft_branch_dml statement")
    graft.sources.GraftProcedureCommand("graft_branch_dml",
      Seq("verb" -> org.apache.spark.sql.types.StringType,
        "version" -> org.apache.spark.sql.types.LongType,
        "rows_affected" -> org.apache.spark.sql.types.LongType,
        "files_rewritten" -> org.apache.spark.sql.types.LongType),
      spark => {
        // the branch redirect keys on the table path, so the statement
        // MUST target the scoped table (same path modulo spelling — a
        // trailing slash or file: scheme normalizes away): a statement
        // naming another table, or an unresolvable one, would commit
        // to MAIN while this procedure reports success
        val parsed = org.apache.spark.sql.GraftShim.parsePlan(spark, stmt)
        val tgt = graft.sources.GraftDml
          .statementTargetPath(spark, parsed).getOrElse(
            throw new IllegalArgumentException(
              "graft_branch_dml runs INSERT/UPDATE/DELETE/MERGE " +
                "statements whose target is the scoped snapshot " +
                s"table; cannot resolve a snapshot target in: $stmt"))
        require(graft.sources.SnapshotTable.branchKey(tgt) ==
          graft.sources.SnapshotTable.branchKey(table),
          s"graft_branch_dml statement targets $tgt, not the scoped " +
            s"table $table — the branch redirect would not apply and " +
            "the statement would commit to that table's main")
        graft.sources.SnapshotTable.withBranch(spark, table, name) {
          graft.sources.GraftDml.execute(spark, stmt)
            .collect().toIndexedSeq
        }
      })
  }

  /** The native-DML/DDL lowering rule for extensions-built sessions: a
    * parsed CREATE TABLE AS / DROP TABLE / INSERT / UPDATE / DELETE /
    * MERGE whose target is a snapshot-table path becomes a
    * [[graft.sources.SnapshotDmlCommand]]; anything else is left for
    * Spark's own resolution. DML nodes are always plan roots, so only
    * the root is inspected.
    */
  final class SnapshotDmlRule(spark: SparkSession)
      extends Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.plans.logical.{
      DeleteFromTable, InsertIntoStatement, MergeIntoTable, UpdateTable}
    override def apply(plan: LogicalPlan): LogicalPlan = {
      // `spark` is the session this rule was INJECTED into — in a
      // multi-session application SparkSession.active could name a
      // sibling whose catalog registrations differ
      plan match {
        case i: InsertIntoStatement
            if graft.sources.GraftDml.targetPath(spark, i.table).isDefined =>
          graft.sources.SnapshotDmlCommand(i)
        case u: UpdateTable
            if graft.sources.GraftDml.targetPath(spark, u.table).isDefined =>
          graft.sources.SnapshotDmlCommand(u)
        case d: DeleteFromTable
            if graft.sources.GraftDml.targetPath(spark, d.table).isDefined =>
          graft.sources.SnapshotDmlCommand(d)
        case m: MergeIntoTable
            if graft.sources.GraftDml
              .targetPath(spark, m.targetTable).isDefined =>
          graft.sources.SnapshotDmlCommand(m)
        case other => other
      }
    }
  }

  /** Parse-time DDL interception (see the injectParser comment): a
    * CREATE TABLE ... AS / DROP TABLE whose target is a single
    * backquoted path identifier becomes a SnapshotDmlCommand before
    * the analyzer can hand it to the session catalog (which rejects
    * path-shaped names). Every other method delegates verbatim.
    */
  final class SnapshotDdlParser(spark: SparkSession,
      delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
      extends org.apache.spark.sql.catalyst.parser.ParserInterface {
    import org.apache.spark.sql.catalyst.analysis.{
      UnresolvedRelation, UnresolvedTable}
    import org.apache.spark.sql.catalyst.plans.logical.{
      AddCheckConstraint, CreateTableAsSelect, DropConstraint, DropTable}

    private def pathShaped(parts: Seq[String]): Boolean = parts match {
      case Seq(p) => p.contains('/')
      case _ => false
    }

    /** Does this DML target a CATALOG-NAMED graft table? Parse-time
      * interception is REQUIRED for named targets (unlike path targets,
      * which stay unresolvable): the analyzer's own ResolveRelations +
      * ResolveReferences resolve a catalog name in the first fixpoint
      * iteration — before any injected resolution rule fires — and a
      * partially-resolved UPDATE/MERGE (expanded star actions,
      * exprId-bound attributes from a different relation instance) can
      * no longer be lowered onto the snapshot verbs by name.
      */
    private def namedGraftTarget(target: LogicalPlan): Boolean =
      target.collectFirst {
        case UnresolvedRelation(parts, _, _) => parts
      }.exists(parts => !pathShaped(parts) &&
        graft.sources.GraftDml
          .namedGraftTable(spark, parts).isDefined)

    private def lower(plan: LogicalPlan): LogicalPlan = plan match {
      case ct: CreateTableAsSelect
          if graft.sources.GraftDml.pathIdent(ct.name).isDefined =>
        graft.sources.SnapshotDmlCommand(ct)
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable
          if namedGraftTarget(u.table) =>
        graft.sources.SnapshotDmlCommand(u)
      case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable
          if namedGraftTarget(d.table) =>
        graft.sources.SnapshotDmlCommand(d)
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
          if namedGraftTarget(m.targetTable) =>
        graft.sources.SnapshotDmlCommand(m)
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
          if namedGraftTarget(i.table) =>
        graft.sources.SnapshotDmlCommand(i)
      // the column-evolution DDL (RENAME/DROP/ADD COLUMN, ALTER COLUMN
      // TYPE) on a snapshot path or graft catalog name lowers onto the
      // metadata-only verbs; non-graft ALTERs pass through untouched
      case a: org.apache.spark.sql.catalyst.plans.logical.RenameColumn
          if graft.sources.GraftDml
            .alterTargetPath(spark, a.table).isDefined =>
        graft.sources.SnapshotDmlCommand(a)
      case a: org.apache.spark.sql.catalyst.plans.logical.DropColumns
          if graft.sources.GraftDml
            .alterTargetPath(spark, a.table).isDefined =>
        graft.sources.SnapshotDmlCommand(a)
      case a: org.apache.spark.sql.catalyst.plans.logical.AddColumns
          if graft.sources.GraftDml
            .alterTargetPath(spark, a.table).isDefined =>
        graft.sources.SnapshotDmlCommand(a)
      // TYPE / nullability / default changes are ours (nullability and
      // defaults must land in the MANIFEST to be enforced — the
      // catalog-metadata path would record them without teeth);
      // COMMENT/position ALTERs on a graft catalog table stay on
      // Spark's own catalog path (they worked there before and touch
      // no data)
      case a: org.apache.spark.sql.catalyst.plans.logical.AlterColumns
          if a.specs.forall(s => s.newDataType.isDefined ||
            s.newNullability.isDefined ||
            s.newDefaultExpression.isDefined || s.dropDefault) &&
            graft.sources.GraftDml
              .alterTargetPath(spark, a.table).isDefined =>
        graft.sources.SnapshotDmlCommand(a)
      case dt: DropTable
          if graft.sources.GraftDml.pathIdent(dt.child).isDefined =>
        graft.sources.SnapshotDmlCommand(dt)
      case a: AddCheckConstraint
          if a.child.collectFirst {
            case UnresolvedRelation(parts, _, _) => parts
          }.exists(pathShaped) =>
        graft.sources.SnapshotDmlCommand(a)
      case dc: DropConstraint
          if dc.table.collectFirst {
            case u: UnresolvedTable => u.multipartIdentifier
          }.exists(pathShaped) =>
        graft.sources.SnapshotDmlCommand(dc)
      case other => other
    }

    /** Native `SELECT … FROM t VERSION AS OF v` / `TIMESTAMP AS OF ts`
      * on a snapshot path or graft catalog name: Spark parses the
      * clause into [[org.apache.spark.sql.catalyst.analysis
      * .RelationTimeTravel]], but its analyzer supports it only for
      * DSv2 tables — a v1 provider gets "time travel is not supported"
      * in the FIRST resolution fixpoint, before any injected resolution
      * rule can fire. So graft targets are lowered at parse time
      * (the same discipline as the DDL above) onto the pinned snapshot
      * scan; time travel over non-graft tables passes through
      * untouched. The timestamp must be a literal (timestamp, date,
      * string, or a cast of one) — the clause is resolved before the
      * analyzer runs, so arbitrary expressions cannot be evaluated yet.
      */
    private def timeTravel(plan: LogicalPlan): LogicalPlan =
      plan.transformDown {
        case tt @ org.apache.spark.sql.catalyst.analysis
            .RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
          val target = graft.sources.GraftDml
            .snapshotPathOf(spark, u.multipartIdentifier)
            .orElse(graft.sources.GraftDml
              .namedGraftTable(spark, u.multipartIdentifier).map(_._1))
          target match {
            case None => tt
            case Some(path) =>
              val version = ver match {
                case Some(v) =>
                  require(scala.util.Try(v.trim.toLong).isSuccess,
                    s"VERSION AS OF on a graft table takes a version " +
                      s"number, got '$v'")
                  v.trim.toLong
                case None =>
                  graft.sources.SnapshotTable.versionAtTimestamp(spark,
                    path, tsMillisOfLiteral(spark, ts.getOrElse(
                      throw new IllegalArgumentException(
                        "time travel needs VERSION AS OF or " +
                          "TIMESTAMP AS OF"))))
              }
              pinnedSnapshotPlan(spark, path, version)
          }
      }

    // Native `OPTIMIZE t [ZORDER BY (c, ...)]` and `VACUUM t [RETAIN n
    // HOURS]` (the Delta statement shapes): neither is Spark grammar,
    // so the intercept runs BEFORE the delegate (which would throw a
    // ParseException) — the same pre-parse discipline Delta's own SQL
    // parser uses. Targets may be a snapshot path (quoted, backticked,
    // or bare) or a graft catalog name; they lower onto compact /
    // expireSnapshots+vacuumOrphans and, like the procedure TVFs,
    // execute at parse time and return their report as the plan.
    private val OptimizeRe =
      """(?is)\s*OPTIMIZE\s+(`[^`]+`|'[^']+'|[\w$./-]+)\s*(?:ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""".r
    // partition-scoped: OPTIMIZE t WHERE col = 'v' | col IN ('a','b')
    // | col >= DATE'…' — raw-column predicates resolve through the
    // declared partition transforms (days/months/bucket/truncate…)
    private val OptimizeWhereRe =
      ("""(?is)\s*OPTIMIZE\s+(`[^`]+`|'[^']+'|[\w$./-]+)\s+WHERE\s+""" +
        """(\w+)\s*(?:(>=|<=|=|>|<)\s*((?:DATE|TIMESTAMP)?\s*'[^']*'""" +
        """|[\w.:-]+)|IN\s*\(([^)]+)\))\s*;?\s*""").r
    private val VacuumRe =
      """(?is)\s*VACUUM\s+(`[^`]+`|'[^']+'|[\w$./-]+)\s*(?:RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""".r
    private val RestoreRe =
      """(?is)\s*RESTORE\s+(?:TABLE\s+)?(`[^`]+`|'[^']+'|[\w$./-]+)\s+TO\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+('[^']+'|[\w.:-]+)\s*;?\s*""".r
    // Native MATERIALIZED VIEW statements (the warehouse-SQL shape over
    // sources/MaterializedView): targets may be a snapshot path or a
    // catalog name (the MV lands at the catalog's default location and
    // registers as a graft table); the definition's FROM names the
    // source table directly — the stored definition keeps the
    // operator's text, bound to the RESOLVED path. An `EXPLAIN` prefix
    // returns a descriptive no-op plan without executing.
    private val CreateMvRe =
      """(?is)\s*(EXPLAIN\s+)?CREATE\s+MATERIALIZED\s+VIEW\s+(`[^`]+`|'[^']+'|[\w$./-]+)\s+AS\s+(.+?)\s*;?\s*""".r
    private val RefreshMvRe =
      """(?is)\s*(EXPLAIN\s+)?REFRESH\s+MATERIALIZED\s+VIEW\s+(`[^`]+`|'[^']+'|[\w$./-]+)\s*;?\s*""".r

    private def unquote(s: String): String =
      if ((s.startsWith("`") && s.endsWith("`")) ||
          (s.startsWith("'") && s.endsWith("'")))
        s.substring(1, s.length - 1)
      else s

    /** Tokenize `OPTIMIZE … WHERE col IN (…)`'s value list with quote
      * awareness — a naive split(',') would shred a partition value
      * containing a comma into fragments that match no partition label
      * and silently compact nothing. Quoted values may contain commas;
      * bare values may not contain quotes; anything else fails loudly.
      */
    private def parseInValues(raw: String): Set[String] = {
      val out = scala.collection.mutable.LinkedHashSet[String]()
      var i = 0
      def skipWs(): Unit =
        while (i < raw.length && raw(i).isWhitespace) i += 1
      skipWs()
      while (i < raw.length) {
        if (raw(i) == '\'') {
          val close = raw.indexOf('\'', i + 1)
          require(close >= 0, s"OPTIMIZE ... WHERE col IN: " +
            s"unterminated quoted value in ($raw)")
          out += raw.substring(i + 1, close)
          i = close + 1
        } else {
          val comma = raw.indexOf(',', i)
          val end = if (comma < 0) raw.length else comma
          val v = raw.substring(i, end).trim
          require(v.nonEmpty && !v.contains('\''),
            s"OPTIMIZE ... WHERE col IN: cannot parse value list " +
              s"($raw) — quote values containing commas or quotes")
          out += v
          i = end
        }
        skipWs()
        if (i < raw.length) {
          require(raw(i) == ',', s"OPTIMIZE ... WHERE col IN: " +
            s"expected ',' between values in ($raw)")
          i += 1
          skipWs()
          require(i < raw.length, s"OPTIMIZE ... WHERE col IN: " +
            s"trailing ',' in ($raw)")
        }
      }
      require(out.nonEmpty,
        "OPTIMIZE ... WHERE col IN: empty value list")
      out.toSet
    }

    private def maintTargetPath(raw: String, what: String): String = {
      val t = unquote(raw)
      if (t.contains('/')) {
        require(graft.sources.GraftDml
          .snapshotPathOf(spark, Seq(t)).isDefined,
          s"$what: no snapshot table at $t")
        t
      } else graft.sources.GraftDml
        .namedGraftTable(spark, t.split('.').toSeq)
        .map(_._1)
        .getOrElse(throw new IllegalArgumentException(
          s"$what targets graft snapshot tables; $t is not one"))
    }

    /** Identifier for a catalog-named MV target; None for a path. */
    private def mvIdent(t: String)
        : Option[org.apache.spark.sql.catalyst.TableIdentifier] =
      if (t.contains('/')) None
      else t.split('.').toSeq match {
        case Seq(n) =>
          Some(org.apache.spark.sql.catalyst.TableIdentifier(n))
        case Seq(db, n) =>
          Some(org.apache.spark.sql.catalyst.TableIdentifier(n, Some(db)))
        case _ => throw new IllegalArgumentException(
          s"MATERIALIZED VIEW names take at most db.name, got $t")
      }

    private def createMv(rawT: String, defn: String): LogicalPlan = {
      import spark.implicits._
      val t = unquote(rawT)
      // exactly one source relation; it must be a graft snapshot table
      val rels = delegate.parsePlan(defn).collect {
        case r: org.apache.spark.sql.catalyst.analysis
            .UnresolvedRelation => r.multipartIdentifier
      }.distinct
      require(rels.size == 1,
        s"CREATE MATERIALIZED VIEW takes exactly one source relation " +
          s"in its definition, got ${rels.size}")
      val srcPath = graft.sources.GraftDml
        .snapshotPathOf(spark, rels.head)
        .orElse(graft.sources.GraftDml
          .namedGraftTable(spark, rels.head).map(_._1))
        .getOrElse(throw new IllegalArgumentException(
          s"CREATE MATERIALIZED VIEW source " +
            s"${rels.head.mkString(".")} is not a graft snapshot table"))
      val ident = mvIdent(t)
      val mvPath = ident match {
        case None => t
        case Some(id) =>
          val cat = org.apache.spark.sql.GraftShim.v1Catalog(spark)
          require(!cat.tableExists(id),
            s"table $t already exists")
          new org.apache.hadoop.fs.Path(
            cat.defaultTablePath(id)).toString
      }
      val v = graft.sources.MaterializedView.create(spark, mvPath,
        srcPath, defn, rels.head.mkString("."))
      // catalog-named MVs register like any named graft table, so
      // SELECT/DETAIL/REFRESH by name all resolve
      ident.foreach { id =>
        spark.sql(s"CREATE TABLE ${id.quotedString} USING graft " +
          s"LOCATION '$mvPath'")
        ()
      }
      Seq((mvPath, srcPath, v))
        .toDF("mv", "source", "version").queryExecution.logical
    }

    private def explainNoop(op: String, target: String): LogicalPlan = {
      import spark.implicits._
      Seq((op, unquote(target)))
        .toDF("statement", "target").queryExecution.logical
    }

    private def maintenance(sqlText: String): Option[LogicalPlan] = {
      import spark.implicits._
      sqlText match {
        case CreateMvRe(explain, rawT, defn) =>
          Some(
            if (explain != null)
              explainNoop("CREATE MATERIALIZED VIEW", rawT)
            else createMv(rawT, defn))
        case RefreshMvRe(explain, rawT) =>
          Some {
            if (explain != null)
              explainNoop("REFRESH MATERIALIZED VIEW", rawT)
            else {
              val path = maintTargetPath(rawT,
                "REFRESH MATERIALIZED VIEW")
              val (mode, from, to, v) =
                graft.sources.MaterializedView.refresh(spark, path)
              // a NAMED target's cached relation still serves the old
              // snapshot — same invalidation discipline as named DML
              if (!unquote(rawT).contains('/'))
                graft.sources.GraftDml.namedGraftTable(spark,
                  unquote(rawT).split('.').toSeq).foreach {
                  case (_, id) => org.apache.spark.sql.GraftShim
                    .v1Catalog(spark).refreshTable(id)
                }
              Seq((mode, from, to, v))
                .toDF("mode", "from_version", "to_version", "mv_version")
                .queryExecution.logical
            }
          }
        case OptimizeWhereRe(rawT, colName, cmpOp, cmpV, inVs) =>
          val path = maintTargetPath(rawT, "OPTIMIZE")
          // the predicate names the RAW column; the label set resolves
          // through the declared transforms (scan-pruning semantics:
          // days(ts) ranges, one bucket for an equality, supersets
          // where no verdict exists) — the operator never hand-renders
          // partition labels
          val (opStr, vals) =
            if (cmpOp != null)
              (cmpOp, Seq(unquote(cmpV.trim
                .replaceAll("(?is)^(DATE|TIMESTAMP)\\s*", ""))))
            else ("in", parseInValues(inVs).toSeq)
          val labels = graft.sources.SnapshotTable
            .partitionLabelsWhere(spark, path, colName, opStr, vals)
          val (v, before, after) =
            if (labels.isEmpty)
              (graft.sources.SnapshotTable.currentVersion(spark, path),
                0, 0)
            else graft.sources.SnapshotTable
              .compactPartitions(spark, path, labels)
          Some(Seq((v, before, after))
            .toDF("version", "files_before", "files_after")
            .queryExecution.logical)
        case OptimizeRe(rawT, zcols) =>
          val path = maintTargetPath(rawT, "OPTIMIZE")
          val cluster = Option(zcols).toSeq
            .flatMap(_.split(',').map(c =>
              unquote(c.trim)).filter(_.nonEmpty))
          val (v, before, after) = graft.sources.SnapshotTable
            .compact(spark, path, clusterBy = cluster)
          Some(Seq((v, before, after))
            .toDF("version", "files_before", "files_after")
            .queryExecution.logical)
        case VacuumRe(rawT, hours) =>
          val path = maintTargetPath(rawT, "VACUUM")
          // RETAIN n HOURS is an AGE cutoff (the Delta/Iceberg clock):
          // versions whose commit time is older than n hours expire
          // (RETAIN 0 collapses history to the current snapshot), and
          // the same horizon bounds the orphan grace. Without RETAIN,
          // the default count-based retention (keep the last two
          // versions) and the 1 h orphan grace hold.
          val (expired, removed) = Option(hours) match {
            case Some(h) => graft.sources.SnapshotTable
              .expireSnapshotsOlderThan(spark, path,
                System.currentTimeMillis() - h.toLong * 3600000L)
            case None => graft.sources.SnapshotTable
              .expireSnapshots(spark, path)
          }
          // the ORPHAN grace floors at 1 h regardless of RETAIN:
          // RETAIN governs how much committed HISTORY to keep, but a
          // sub-hour orphan grace could delete a concurrent writer's
          // staged-but-not-yet-committed batch directory between its
          // stage write and manifest CAS, corrupting that commit
          // (Delta likewise refuses retention below a safe floor)
          val orphans = graft.sources.SnapshotTable
            .vacuumOrphans(spark, path, graceMs = math.max(
              Option(hours).map(_.toLong * 3600000L)
                .getOrElse(3600000L), 3600000L))
          Some(Seq((expired, removed, orphans))
            .toDF("manifests_expired", "data_files_removed",
              "orphans_removed")
            .queryExecution.logical)
        // `RESTORE [TABLE] t TO VERSION|TIMESTAMP AS OF x` — the Delta
        // statement shape over the metadata-only rollback verb
        case RestoreRe(rawT, kind, rawArg) =>
          val path = maintTargetPath(rawT, "RESTORE")
          val arg = unquote(rawArg)
          val version =
            if (kind.equalsIgnoreCase("VERSION")) {
              require(scala.util.Try(arg.trim.toLong).isSuccess,
                s"RESTORE TO VERSION AS OF takes a version number, " +
                  s"got '$arg'")
              arg.trim.toLong
            } else graft.sources.SnapshotTable.versionAtTimestamp(
              spark, path,
              graft.sources.SnapshotTable.parseTsMillis(spark, arg))
          val v = graft.sources.SnapshotTable.restore(spark, path,
            version)
          Some(Seq((version, v))
            .toDF("restored_version", "new_version")
            .queryExecution.logical)
        case _ => None
      }
    }

    // timeTravel BEFORE lower: lower wraps a DML/DDL root into
    // SnapshotDmlCommand, a LEAF command holding the parsed plan as a
    // field — a transform applied afterwards could no longer reach a
    // RelationTimeTravel inside (e.g. the source of `INSERT INTO t
    // SELECT … FROM s VERSION AS OF 1`). DML targets are never
    // time-travel nodes, so the rewrite cannot hide a target from
    // lower's detection.
    override def parsePlan(sqlText: String): LogicalPlan =
      maintenance(sqlText).getOrElse(
        lower(timeTravel(delegate.parsePlan(sqlText))))
    override def parsePlanWithParameters(sqlText: String,
        ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
        : LogicalPlan =
      maintenance(sqlText).getOrElse(
        lower(timeTravel(delegate.parsePlanWithParameters(sqlText, ctx))))
    override def parseQuery(sqlText: String): LogicalPlan =
      timeTravel(delegate.parseQuery(sqlText))
    override def parseExpression(sqlText: String) =
      delegate.parseExpression(sqlText)
    override def parseTableIdentifier(sqlText: String) =
      delegate.parseTableIdentifier(sqlText)
    override def parseFunctionIdentifier(sqlText: String) =
      delegate.parseFunctionIdentifier(sqlText)
    override def parseMultipartIdentifier(sqlText: String) =
      delegate.parseMultipartIdentifier(sqlText)
    override def parseTableSchema(sqlText: String) =
      delegate.parseTableSchema(sqlText)
    override def parseDataType(sqlText: String) =
      delegate.parseDataType(sqlText)
    override def parseRoutineParam(sqlText: String) =
      delegate.parseRoutineParam(sqlText)
  }

  /** `graft_changes('<table>', fromVersion, toVersion)` — the change
    * feed between two snapshot versions as a SQL relation.
    */
  val changesTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 3,
      s"graft_changes(table, fromVersion, toVersion) takes 3 arguments, got ${args.size}")
    val spark = SparkSession.active
    val table = litString(args.head, "graft_changes table path")
    // each bound is version-or-timestamp, like graft_snapshot's second
    // argument. Timestamp semantics are SNAPSHOT-DIFF, the same as the
    // version form: the result is the logical difference between the
    // table AS OF t1 and AS OF t2 (each resolves to its at-or-before
    // version; the from-state is the base, so its own changes are not
    // included). That is deliberately the version form's contract
    // extended to times — NOT Delta's event-window startingTimestamp
    // (earliest commit >= t1, inclusive); for "everything since the
    // beginning" pass version 0.
    graft.sources.SnapshotTable.changesBetween(spark, table,
      versionArg(spark, table, args(1), "graft_changes from"),
      versionArg(spark, table, args(2), "graft_changes to"))
      .queryExecution.logical
  }

  /** `graft_detail('<table>')` — DESCRIBE DETAIL as a SQL relation:
    * one metadata-tier row (version, file counts, declared layout —
    * partition/cluster/identity/stats/bloom/constraints — manifest
    * shape, retention floor).
    */
  val detailTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 1 || args.size == 2,
      s"graft_detail(table[, branch]) takes 1-2 arguments, got " +
        s"${args.size}")
    val spark = SparkSession.active
    val table = litString(args.head, "graft_detail table path")
    args.lift(1) match {
      case Some(b) => graft.sources.SnapshotTable.branchDetail(spark,
        table, litString(b, "graft_detail branch name"))
        .queryExecution.logical
      case None => graft.sources.SnapshotTable.detail(spark, table)
        .queryExecution.logical
    }
  }

  /** `graft_files('<table>'[, version])` — the FILES metadata relation
    * (Iceberg's `t.files`): one row per live data file with bytes,
    * recorded row count, and partition label. Metadata-tier.
    */
  val filesTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 1 || args.size == 2,
      s"graft_files(table[, version]) takes 1-2 arguments, got ${args.size}")
    val spark = SparkSession.active
    val table = litString(args.head, "graft_files table path")
    val version =
      if (args.size == 2) Some(versionArg(spark, table, args(1),
        "graft_files"))
      else None
    graft.sources.SnapshotTable.filesOf(spark, table, version)
      .queryExecution.logical
  }

  /** `graft_partitions('<table>'[, version])` — the PARTITIONS rollup
    * (Iceberg's `t.partitions`): one row per live partition with file
    * count, bytes and recorded rows. Metadata-tier.
    */
  val partitionsTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 1 || args.size == 2,
      s"graft_partitions(table[, version]) takes 1-2 arguments, " +
        s"got ${args.size}")
    val spark = SparkSession.active
    val table = litString(args.head, "graft_partitions table path")
    val version =
      if (args.size == 2) Some(versionArg(spark, table, args(1),
        "graft_partitions"))
      else None
    graft.sources.SnapshotTable.partitionsOf(spark, table, version)
      .queryExecution.logical
  }

  /** `graft_branch('<table>', '<name>')` — the branch HEAD as a SQL
    * relation, isolated from main (read-only; splices the branch read
    * plan like graft_snapshot splices the snapshot's).
    */
  val branchTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 2,
      s"graft_branch(table, name) takes 2 arguments, got ${args.size}")
    val spark = SparkSession.active
    graft.sources.SnapshotTable.readBranch(spark,
      litString(args.head, "graft_branch table path"),
      litString(args(1), "graft_branch name"))
      .queryExecution.logical
  }

  /** `graft_refs('<table>')` — live named refs: one row per branch
    * (name, fork base, head sequence) and per tag (name, pinned
    * version). Metadata-tier.
    */
  val refsTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 1,
      s"graft_refs(table) takes 1 argument, got ${args.size}")
    val spark = SparkSession.active
    val table = litString(args.head, "graft_refs table path")
    import spark.implicits._
    (graft.sources.SnapshotTable.branches(spark, table).map {
      case (n, base, seq) => ("branch", n, base, Some(seq))
    } ++ graft.sources.SnapshotTable.tags(spark, table).toSeq.sortBy(_._1)
      .map { case (n, v) => ("tag", n, v, None) })
      .toDF("ref_type", "name", "version", "head_seq")
      .queryExecution.logical
  }

  /** Ref PROCEDURES — side-effecting, so each resolves to the
    * EXPLAIN-safe deferred command like the other procedures:
    * `graft_create_branch(t, name[, version])`,
    * `graft_publish_branch(t, name)`, `graft_drop_branch(t, name)`,
    * `graft_create_tag(t, name, version)`, `graft_drop_tag(t, name)`.
    */
  private def refProcedure(what: String, args: Seq[Expression],
      arity: Range)(body: (SparkSession, String, String,
        Option[Expression]) => Seq[org.apache.spark.sql.Row])
      : LogicalPlan = {
    require(arity.contains(args.size),
      s"$what takes ${arity.min}-${arity.max} arguments, got ${args.size}")
    val table = litString(args.head, s"$what table path")
    val name = litString(args(1), s"$what ref name")
    val extra = args.lift(2)
    graft.sources.GraftProcedureCommand(what,
      Seq("ref" -> org.apache.spark.sql.types.StringType,
        "result" -> org.apache.spark.sql.types.LongType),
      spark => body(spark, table, name, extra))
  }

  val createBranchTvf: Seq[Expression] => LogicalPlan = { args =>
    refProcedure("graft_create_branch", args, 2 to 3) {
      (spark, t, n, extra) =>
        val from = extra.map(e => versionArg(spark, t, e,
          "graft_create_branch"))
        graft.sources.SnapshotTable.createBranch(spark, t, n, from)
        Seq(org.apache.spark.sql.Row(n, from.getOrElse(
          graft.sources.SnapshotTable.currentVersion(spark, t))))
    }
  }

  val publishBranchTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size >= 2 && args.size <= 4,
      "graft_publish_branch(table, name[, cherry_pick[, retain]]) " +
        s"takes 2-4 arguments, got ${args.size}")
    val table = litString(args.head, "graft_publish_branch table path")
    val name = litString(args(1), "graft_publish_branch ref name")
    // optional third arg: cherry-pick onto a diverged main; optional
    // fourth: RETAIN the branch, re-seeded at the published version
    // (the continuous streaming-WAP publish — the ref survives)
    def boolArg(i: Int, what: String): Boolean = args.lift(i).exists {
      case org.apache.spark.sql.catalyst.expressions
        .Literal(b: Boolean, org.apache.spark.sql.types
        .BooleanType) => b
      case e => sys.error(s"graft_publish_branch $what must be a " +
        s"boolean literal, got $e")
    }
    val cherry = boolArg(2, "cherry_pick")
    val retain = boolArg(3, "retain")
    graft.sources.GraftProcedureCommand("graft_publish_branch",
      Seq("ref" -> org.apache.spark.sql.types.StringType,
        "result" -> org.apache.spark.sql.types.LongType),
      spark => Seq(org.apache.spark.sql.Row(name,
        graft.sources.SnapshotTable.publishBranch(spark, table, name,
          cherryPick = cherry, retainBranch = retain))))
  }

  val dropBranchTvf: Seq[Expression] => LogicalPlan = { args =>
    refProcedure("graft_drop_branch", args, 2 to 2) { (spark, t, n, _) =>
      graft.sources.SnapshotTable.dropBranch(spark, t, n)
      Seq(org.apache.spark.sql.Row(n, 0L))
    }
  }

  /** `graft_create_mv('<mv path>', '<source path>', '<select>')` — a
    * named MATERIALIZED VIEW: the definition (reading the source as
    * `__source__`) materializes at the current source version; the MV
    * is itself a snapshot table carrying its definition and refresh
    * mark in its manifest. Deferred/EXPLAIN-safe like every procedure.
    */
  val createMvTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 3,
      "graft_create_mv(mv, source, query) takes 3 arguments, got " +
        s"${args.size}")
    val mv = litString(args.head, "graft_create_mv mv path")
    val src = litString(args(1), "graft_create_mv source path")
    val query = litString(args(2), "graft_create_mv query")
    graft.sources.GraftProcedureCommand("graft_create_mv",
      Seq("mv" -> org.apache.spark.sql.types.StringType,
        "version" -> org.apache.spark.sql.types.LongType),
      spark => Seq(org.apache.spark.sql.Row(mv,
        graft.sources.MaterializedView.create(spark, mv, src, query))))
  }

  /** `graft_refresh_mv('<mv path>')` — refresh to the source's current
    * version: INCREMENTAL (netted change-feed delta merged, churn-
    * sized IO) when the definition is a nettable count/sum aggregate,
    * full recompute otherwise; "noop" when already current. The
    * refresh mark commits atomically with the contents, so a replay
    * is exactly-once.
    */
  val refreshMvTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 1,
      s"graft_refresh_mv(mv) takes 1 argument, got ${args.size}")
    val mv = litString(args.head, "graft_refresh_mv mv path")
    graft.sources.GraftProcedureCommand("graft_refresh_mv",
      Seq("mode" -> org.apache.spark.sql.types.StringType,
        "from_version" -> org.apache.spark.sql.types.LongType,
        "to_version" -> org.apache.spark.sql.types.LongType,
        "mv_version" -> org.apache.spark.sql.types.LongType),
      spark => {
        val (mode, from, to, v) =
          graft.sources.MaterializedView.refresh(spark, mv)
        Seq(org.apache.spark.sql.Row(mode, from, to, v))
      })
  }

  val createTagTvf: Seq[Expression] => LogicalPlan = { args =>
    refProcedure("graft_create_tag", args, 3 to 3) {
      (spark, t, n, extra) =>
        val v = versionArg(spark, t, extra.get, "graft_create_tag")
        graft.sources.SnapshotTable.tagVersion(spark, t, n, v)
        Seq(org.apache.spark.sql.Row(n, v))
    }
  }

  val dropTagTvf: Seq[Expression] => LogicalPlan = { args =>
    refProcedure("graft_drop_tag", args, 2 to 2) { (spark, t, n, _) =>
      graft.sources.SnapshotTable.dropTag(spark, t, n)
      Seq(org.apache.spark.sql.Row(n, 0L))
    }
  }

  /** `graft_history('<table>')` — the retained-version history
    * (DESCRIBE HISTORY shape) as a SQL relation: commit times, file
    * counts, manifest-diff churn per version, all metadata-tier.
    */
  val historyTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 1 || args.size == 2,
      s"graft_history(table[, branch]) takes 1-2 arguments, got " +
        s"${args.size}")
    val spark = SparkSession.active
    val table = litString(args.head, "graft_history table path")
    // optional second arg: a BRANCH head's staged commit sequence —
    // the WAP audit trail, previously main-line only
    args.lift(1) match {
      case Some(b) => graft.sources.SnapshotTable.branchHistory(spark,
        table, litString(b, "graft_history branch name"))
        .queryExecution.logical
      case None => graft.sources.SnapshotTable.history(spark, table)
        .queryExecution.logical
    }
  }

  /** `graft_restore('<table>', version | TIMESTAMP '…')` — rollback
    * as a SQL procedure (Delta's `RESTORE TABLE`): a METADATA-ONLY
    * commit re-listing the target version's files verbatim
    * ([[graft.sources.SnapshotTable.restore]]); a timestamp second
    * argument resolves through the shared commit-time lookup like
    * every other time-travel surface. Returns one row
    * (restored_version, new_version).
    */
  val restoreTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 2,
      s"graft_restore(table, version|timestamp) takes 2 arguments, " +
        s"got ${args.size}")
    val table = litString(args.head, "graft_restore table path")
    val versionExpr = args(1)
    graft.sources.GraftProcedureCommand("graft_restore",
      Seq("restored_version" -> org.apache.spark.sql.types.LongType,
        "new_version" -> org.apache.spark.sql.types.LongType),
      { spark =>
        // timestamp->version resolution happens at EXECUTION too: the
        // table may gain commits between plan time and run time
        val version = versionArg(spark, table, versionExpr,
          "graft_restore")
        val v = graft.sources.SnapshotTable.restore(spark, table,
          version)
        Seq(org.apache.spark.sql.Row(version, v))
      })
  }

  /** `graft_optimize('<table>'[, 'c1,c2'])` — compaction as a SQL
    * procedure (Delta's `OPTIMIZE [ZORDER BY]`): rewrites the table
    * into target-size files, materializing deletion vectors and
    * clearing the column mapping; a second argument re-clusters on the
    * named columns (recorded as the table's declared cluster key), an
    * omitted one re-clusters on the already-declared key when there is
    * one. Returns one row (version, files_before, files_after).
    */
  val optimizeTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 1 || args.size == 2,
      s"graft_optimize(table[, clusterCols]) takes 1-2 arguments, " +
        s"got ${args.size}")
    val table = litString(args.head, "graft_optimize table path")
    val cluster =
      if (args.size == 2)
        litString(args(1), "graft_optimize cluster columns")
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
      else Nil
    graft.sources.GraftProcedureCommand("graft_optimize",
      Seq("version" -> org.apache.spark.sql.types.LongType,
        "files_before" -> org.apache.spark.sql.types.IntegerType,
        "files_after" -> org.apache.spark.sql.types.IntegerType),
      { spark =>
        val (v, before, after) = graft.sources.SnapshotTable
          .compact(spark, table, clusterBy = cluster)
        Seq(org.apache.spark.sql.Row(v, before, after))
      })
  }

  /** `graft_maintain('<table>')` — the one-call maintenance autopilot
    * ([[graft.sources.SnapshotTable.maintain]]) as a SQL procedure:
    * threshold-gated compaction (re-clustering on the declared key),
    * snapshot expiry, and orphan vacuum. Returns the Maintenance
    * report as one row.
    */
  val maintainTvf: Seq[Expression] => LogicalPlan = { args =>
    require(args.size == 1,
      s"graft_maintain(table) takes 1 argument, got ${args.size}")
    val table = litString(args.head, "graft_maintain table path")
    graft.sources.GraftProcedureCommand("graft_maintain",
      Seq("compacted" -> org.apache.spark.sql.types.BooleanType,
        "files_before" -> org.apache.spark.sql.types.IntegerType,
        "files_after" -> org.apache.spark.sql.types.IntegerType,
        "manifests_expired" -> org.apache.spark.sql.types.IntegerType,
        "data_files_removed" -> org.apache.spark.sql.types.IntegerType,
        "orphans_removed" -> org.apache.spark.sql.types.IntegerType,
        "mv_refresh" -> org.apache.spark.sql.types.StringType),
      { spark =>
        val m = graft.sources.SnapshotTable.maintain(spark, table)
        Seq(org.apache.spark.sql.Row(m.compacted, m.filesBefore,
          m.filesAfter, m.manifestsExpired, m.dataFilesRemoved,
          m.orphanBatchesRemoved, m.mvRefresh))
      })
  }

  /** Runtime registration of the full custom-function surface
    * (including the snapshot TVFs, via the `private[sql]` registry
    * bridge — the driver contract builds plain sessions, so the
    * extensions-config path alone would leave `spark.sql` users
    * without them).
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("partial_ratio",
      udf((a: String, b: String) => FuzzyMatch.normalizedPartialRatio(a, b)))
    spark.udf.register("abbrev_pairs",
      udf((text: String) => AbbrevPairs.parse(text)))
    spark.udf.register("graft_row_density",
      org.apache.spark.sql.functions.udaf(new RowDensityAgg(4)))
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_snapshot", snapshotTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_changes", changesTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_dml", dmlTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_history", historyTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_detail", detailTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_optimize", optimizeTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_maintain", maintainTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_restore", restoreTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_files", filesTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_partitions", partitionsTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_branch", branchTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_refs", refsTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_create_branch", createBranchTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_branch_dml", branchDmlTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_publish_branch", publishBranchTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_drop_branch", dropBranchTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_create_tag", createTagTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_drop_tag", dropTagTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_create_mv", createMvTvf)
    org.apache.spark.sql.GraftShim.registerTableFunction(spark,
      "graft_refresh_mv", refreshMvTvf)
  }
}
