package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.functions._

/** NAMED MATERIALIZED VIEWS over the change feed — the warehouse
  * operator loop `CREATE MATERIALIZED VIEW … / REFRESH` closed the way
  * `graft_optimize` closed compaction. An MV is itself a snapshot
  * table (time travel, refs, catalog registration all apply) whose
  * manifest records its definition (`mvQuery`, with the source table
  * named `__source__`), its source path (`mvSource`) and the exactly-
  * once refresh high-water mark (`cdcUpTo` — the same monotone-mark
  * discipline the streaming sink uses; the mark commits ATOMICALLY
  * with the refreshed contents, so a crashed/replayed refresh can
  * never double-apply a delta).
  *
  * Refresh is INCREMENTAL whenever the definition is a nettable
  * single-source aggregate — `SELECT <group cols…>, count(*) …,
  * count(x) …, sum(x) … FROM __source__ [WHERE …] GROUP BY …` — by
  * running the UNCHANGED query text over the insert- and delete-sides
  * of [[SnapshotTable.changesBetween]]'s netted delta and merging
  * `old + ins − del` per aggregate column (counts and sums net
  * identically; `count(*)` doubles as the group-liveness filter).
  * The delta frame is CHURN-sized — the refresh never re-reads the
  * source table. Any other definition (joins, min/max, avg, DISTINCT,
  * FILTER clauses — not nettable under deletes) falls back to a full
  * recompute at the current source version, same mark discipline.
  *
  * Reference scope: the reference engine re-runs every query from
  * scratch against SQLite (database.py:66-71 `pd.read_sql`); a named
  * incrementally-maintained view is what its workloads need at 100 TB,
  * where "recompute the aggregate" means re-reading the corpus.
  */
object MaterializedView {

  private val SourceToken = "__source__"

  /** One nettable output column of the MV definition. */
  private sealed trait OutCol
  private case class GroupCol(name: String) extends OutCol
  private case class CountStarCol(name: String) extends OutCol
  private case class NettableAggCol(name: String) extends OutCol
  private case object NotNettable extends OutCol

  private def bind(spark: SparkSession, query: String,
      source: DataFrame): (DataFrame, String) = {
    val vn = "graft_mv_src_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    source.createOrReplaceTempView(vn)
    val parsed = GraftShim.parsePlan(spark, query)
    var found = false
    val bound = parsed.transform {
      case r: UnresolvedRelation
          if r.multipartIdentifier.map(_.toLowerCase) ==
            Seq(SourceToken) =>
        found = true
        UnresolvedRelation(Seq(vn))
    }
    require(found,
      s"the MV definition must read FROM $SourceToken, got: $query")
    (GraftShim.ofRows(spark, bound), vn)
  }

  private def dropView(spark: SparkSession, vn: String): Unit =
    spark.catalog.dropTempView(vn)

  /** Classify the ANALYZED definition: Some(group cols, liveness
    * count(*) col) when every output is a group key or a nettable
    * count/sum — the incremental-refresh contract.
    */
  private def nettableShape(analyzed: LogicalPlan)
      : Option[(Seq[String], String)] = analyzed match {
    case Aggregate(_, aggs, _, _) =>
      val cols = aggs.map {
        case a: AttributeReference => GroupCol(a.name)
        case al @ Alias(AggregateExpression(fn, Complete, false, None, _),
            name) => fn match {
          case Count(children)
              if children.isEmpty ||
                children.forall(_.isInstanceOf[Literal]) =>
            CountStarCol(name)
          case Count(_) => NettableAggCol(name)
          case _: Sum => NettableAggCol(name)
          case _ => NotNettable
        }
        case Alias(child, name)
            if !child.exists(_.isInstanceOf[AggregateExpression]) =>
          GroupCol(name)
        case _ => NotNettable
      }
      val liveness = cols.collectFirst { case CountStarCol(n) => n }
      if (cols.contains(NotNettable) || liveness.isEmpty) None
      else Some((cols.collect { case GroupCol(n) => n }, liveness.get))
    case _ => None
  }

  /** Create the MV at `mvPath`: materialize the definition against the
    * CURRENT source version and commit contents + definition + mark in
    * ONE manifest.
    */
  def create(spark: SparkSession, mvPath: String, sourcePath: String,
      query: String): Long = {
    require(SnapshotTable.currentVersion(spark, mvPath) == 0,
      s"$mvPath already has committed snapshots")
    val cur = SnapshotTable.currentVersion(spark, sourcePath)
    require(cur >= 1, s"no committed snapshot at $sourcePath")
    val (df, vn) = bind(spark, query,
      SnapshotTable.read(spark, sourcePath, Some(cur)))
    try {
      val files = SnapshotTable.stageBatch(df.repartition(4), mvPath)
      SnapshotTable.commitManifest(spark, mvPath, df.schema, files, 0L,
        Map("mvSource" -> sourcePath,
          "mvQuery" -> java.net.URLEncoder.encode(query, "UTF-8"),
          "cdcUpTo" -> cur.toString))
    } finally dropView(spark, vn)
  }

  /** Refresh the MV to the source's current version. Returns
    * (mode, from version, to version, new MV version): mode is "noop"
    * (already current), "incremental" (netted delta merged) or "full"
    * (definition not nettable — recomputed).
    */
  def refresh(spark: SparkSession, mvPath: String)
      : (String, Long, Long, Long) = {
    val snap = SnapshotTable.currentSnapshot(spark, mvPath)
    val source = snap.meta.getOrElse("mvSource",
      throw new IllegalArgumentException(
        s"$mvPath is not a materialized view (no mvSource)"))
    val query = java.net.URLDecoder.decode(
      snap.meta("mvQuery"), "UTF-8")
    val upTo = snap.meta.getOrElse("cdcUpTo", "0").toLong
    val cur = SnapshotTable.currentVersion(spark, source)
    if (cur == upTo) return ("noop", upTo, cur, snap.version)
    require(cur > upTo, s"source $source moved backwards? " +
      s"mark $upTo, current $cur")

    // shape-check against the CURRENT source schema (cheap: analysis
    // only, nothing materializes)
    val (probe, vnProbe) = bind(spark, query,
      SnapshotTable.read(spark, source, Some(cur)))
    val shape =
      try nettableShape(probe.queryExecution.analyzed)
      finally dropView(spark, vnProbe)

    val (mode, result: DataFrame) = shape match {
      case Some((groupCols, livenessCol)) =>
        // CHURN-sized: the same query text over each side of the
        // netted delta, merged old + ins − del per aggregate column
        val delta = SnapshotTable.changesBetween(spark, source,
          upTo, cur)
        val srcCols = delta.columns.filterNot(_ == "change_type")
          .map(c => col(s"`$c`")).toIndexedSeq
        val (insDf, vnIns) = bind(spark, query,
          delta.filter(col("change_type") === "insert")
            .select(srcCols: _*))
        val (delDf, vnDel) = bind(spark, query,
          delta.filter(col("change_type") === "delete")
            .select(srcCols: _*))
        try {
          val old = SnapshotTable.read(spark, mvPath)
          val aggCols = old.columns.filterNot(groupCols.contains)
          def tagged(df: DataFrame, tag: String): DataFrame =
            df.select(groupCols.map(c => col(s"`$c`")) ++
              aggCols.map(c => col(s"`$c`").as(s"${tag}_$c")): _*)
          val merged = tagged(old, "o")
            .join(tagged(insDf, "i"), groupCols.toIndexedSeq,
              "full_outer")
            .join(tagged(delDf, "d"), groupCols.toIndexedSeq,
              "full_outer")
          val out = merged.select(
            groupCols.map(c => col(s"`$c`")) ++ aggCols.map { c =>
              // net in the column's OWN type (a double round-trip
              // would corrupt wide longs)
              val zero = lit(0).cast(old.schema(c).dataType)
              (coalesce(col(s"`o_$c`"), zero) +
                coalesce(col(s"`i_$c`"), zero) -
                coalesce(col(s"`d_$c`"), zero))
                .cast(old.schema(c).dataType).as(c)
            }: _*)
          // materialize BEFORE the views drop (localCheckpoint also
          // decouples the commit from the temp-view lifetimes)
          ("incremental",
            out.filter(col(s"`$livenessCol`") > 0).localCheckpoint())
        } finally { dropView(spark, vnIns); dropView(spark, vnDel) }
      case None =>
        val (df, vn) = bind(spark, query,
          SnapshotTable.read(spark, source, Some(cur)))
        try ("full", df.localCheckpoint())
        finally dropView(spark, vn)
    }
    val files = SnapshotTable.stageBatch(result.repartition(4), mvPath)
    val v = SnapshotTable.commitManifest(spark, mvPath, result.schema,
      files, snap.version, snap.meta + ("cdcUpTo" -> cur.toString),
      Map.empty, Map.empty, Nil, Some(snap))
    (mode, upTo, cur, v)
  }
}
