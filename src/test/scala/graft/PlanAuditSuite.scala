package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits for the scale claims the scaladocs make: what is
  * said to be map-only must not shuffle, what is said to broadcast must
  * broadcast, scans must prune and push down, and the dedup hot path must
  * stay out of interpreted higher-order functions.
  */
class PlanAuditSuite extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkFixture._

  test("shingle construction plans no interpreted array lambdas") {
    val plan = operators.DedupOps.shingleRows(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("array_distinct") && !plan.contains("transform("),
      s"shingleRows must stay codegen-friendly, got:\n$plan")
  }

  test("hash sampling shuffles only for the presentation sort") {
    val q = SparkEntry.queries("q_sample_hash")(spark, sf)
    q.collect()
    val shuffles = collectWithSubqueries(q.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e.outputPartitioning
    }
    assert(shuffles.forall(_.isInstanceOf[RangePartitioning]),
      s"sampling itself must be map-only; found hash shuffles: $shuffles")
  }

  test("PDF extraction is file-local: one mapPartitions pass, shuffles " +
      "only for presentation sort / dedup") {
    for (name <- Seq("q_pdf_tables", "q_rad_ingest")) {
      val q = SparkEntry.queries(name)(spark, sf)
      q.collect()
      val shuffles = collectWithSubqueries(q.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e.outputPartitioning
      }
      // the parse itself must not shuffle raw bytes: only the final
      // range sort (and, for rad, the dedup hash) may exchange —
      // and those move extracted cells, never file contents
      assert(shuffles.size <= 2, s"$name: unexpected shuffles $shuffles")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("content#") ||
        !shuffles.exists(_.toString.contains("content")),
        s"$name must never shuffle file bytes:\n$plan")
    }
  }

  test("skew-salted join merges on (key, salt) with no broadcast masking") {
    val q = SparkEntry.queries("q_join_skew_salted")(spark, sf)
    q.collect()
    val exec = q.queryExecution.executedPlan
    val smj = collectWithSubqueries(exec) { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected a sort-merge join, got:\n$exec")
    assert(smj.head.leftKeys.exists(_.toString.contains("__salt")),
      s"join keys must include the salt, got: ${smj.head.leftKeys}")
    val bhj = collectWithSubqueries(exec) { case b: BroadcastHashJoinExec => b }
    assert(bhj.isEmpty,
      "a broadcast would mask the salting the query exists to demonstrate")
  }

  test("date spine joins its aggregated counts by broadcast") {
    val q = SparkEntry.queries("q_date_spine")(spark, sf)
    q.collect()
    val bhj = collectWithSubqueries(q.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "expected a broadcast join for the spine stitch")
  }

  test("column pruning reaches the parquet scan (q_text_tokens)") {
    val q = SparkEntry.queries("q_text_tokens")(spark, sf)
    q.collect()
    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f.requiredSchema.fieldNames.toSet
    }
    assert(scans.nonEmpty)
    scans.foreach { cols =>
      assert(!cols.contains("lang") && !cols.contains("source"),
        s"scan reads more columns than the query needs: $cols")
    }
  }

  test("predicate pushdown reaches the parquet scan") {
    val q = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 45).select(col("l_orderkey"))
    q.collect()
    val pushed = collectWithSubqueries(q.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("GreaterThan(l_quantity"),
      s"filter not pushed to scan: $pushed")
  }

  test("star join broadcasts its dimensions; top-k plans as TakeOrdered") {
    val star = SparkEntry.queries("q_star_join")(spark, sf)
    star.collect()
    val bhj = collectWithSubqueries(star.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.size >= 2, s"nation+region should broadcast, found ${bhj.size}")
    val topk = SparkEntry.queries("q_ship_priority")(spark, sf)
    topk.collect()
    assert(topk.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "order-by-limit must plan as distributed top-k, not a global sort")
  }

  test("skew profile: one-column scan, top-10 as TakeOrdered, total broadcast") {
    val q = SparkEntry.queries("q_skew_profile")(spark, sf)
    q.collect()
    val exec = q.queryExecution.executedPlan
    assert(exec.toString.contains("TakeOrderedAndProject"),
      "hottest-keys cut must be a distributed top-k, not a global sort")
    val scans = collectWithSubqueries(exec) { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty && scans.forall(_.requiredSchema.size <= 1),
      s"skew profile must scan at most the key column, got " +
        scans.map(_.requiredSchema.catalogString))
  }

  test("url dedup shuffles only for its aggregation and presentation sort") {
    val q = SparkEntry.queries("q_dedup_url")(spark, sf)
    q.collect()
    val shuffles = collectWithSubqueries(q.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.size <= 2,
      s"canonicalization must stay map-side; found ${shuffles.size} exchanges")
  }

  test("three-stage funnel plans only keyed joins, never a cartesian") {
    val q = SparkEntry.queries("q_funnel_stages")(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"stage gating must ride the user_id equi-joins:\n$plan")
  }

  test("document chunking is map-only up to the presentation sort") {
    val q = SparkEntry.queries("q_chunk_documents")(spark, sf)
    q.collect()
    val shuffles = collectWithSubqueries(q.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e.outputPartitioning
    }
    assert(shuffles.forall(_.isInstanceOf[RangePartitioning]),
      s"chunk explosion must stay map-side; found hash shuffles: $shuffles")
  }

  test("triangle enumeration rides keyed wedge joins, never a cartesian") {
    val q = SparkEntry.queries("q_graph_triangles")(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge + closure must be equi-joins on (b) and (a, c):\n$plan")
  }

  test("merge upsert plans no single-partition window for insert ids") {
    val q = SparkEntry.queries("q_merge_upsert")(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"insert-id ranks must come from the parallel range+zipWithIndex " +
        s"pattern, not a global window, got:\n$plan")
  }

  test("decontamination broadcasts the benchmark gram set") {
    val q = SparkEntry.queries("q_decontaminate")(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan
    val bhjSemi = collectWithSubqueries(plan) {
      case b: BroadcastHashJoinExec if b.joinType.sql.contains("SEMI") => b
    }
    assert(bhjSemi.nonEmpty,
      s"the eval-set grams are MBs vs a 100 TB corpus — the contamination " +
        s"probe must be a broadcast semi-join, got:\n$plan")
  }

  test("global shuffle plans no single-partition window for positions") {
    val q = SparkEntry.queries("q_shuffle_global")(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"training-order positions must come from the parallel " +
        s"range+zipWithIndex pattern, not a global window, got:\n$plan")
  }

  test("epoch mixing is map-only up to the presentation sort") {
    val q = SparkEntry.queries("q_mix_epochs")(spark, sf)
    q.collect()
    val shuffles = collectWithSubqueries(q.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e.outputPartitioning
    }
    assert(shuffles.forall(_.isInstanceOf[RangePartitioning]),
      s"row replication must not shuffle; found hash shuffles: $shuffles")
  }

  test("nearest as-of runs both directional carries on ONE key shuffle") {
    val q = SparkEntry.queries("q_join_asof_nearest")(spark, sf)
    q.collect()
    val shuffles = collectWithSubqueries(q.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e.outputPartitioning
    }
    val hashShuffles = shuffles.filter(_.isInstanceOf[HashPartitioning])
    assert(hashShuffles.size == 1,
      s"both window frames must share one key partitioning " +
        s"(second differs only by an in-partition re-sort): $shuffles")
  }

  test("inverted-index posting limit plans as map-side WindowGroupLimit") {
    val q = SparkEntry.queries("q_text_inverted_index")(spark, sf)
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rank<=10 must prune map-side, or hot terms buffer whole posting sets")
  }

  test("partial_ratio participates in whole-stage codegen") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val q = SparkEntry.queries("q_udf_fuzzy_ratio")(spark, sf)
    q.collect()
    val inCodegen = collectWithSubqueries(q.queryExecution.executedPlan) {
      case w: WholeStageCodegenExec => w.toString
    }.exists(_.contains("partial_ratio"))
    assert(inCodegen,
      "partial_ratio must run inside a codegen stage, not as fallback")
  }

  test("profile table is a single aggregation pass over one scan") {
    val q = SparkEntry.queries("q_profile_table")(spark, sf)
    q.collect()
    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }
    assert(scans.length == 1,
      s"profile must not rescan per column, found ${scans.length} scans")
  }

  test("ratio-to-report and range buckets plan no global window") {
    for (name <- Seq("q_percent_of_total", "q_range_bucket")) {
      val q = SparkEntry.queries(name)(spark, sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name must use the broadcast-scalar pattern, not a window:\n$plan")
    }
  }

  test("market share star broadcasts every dimension") {
    val q = SparkEntry.queries("q_market_share")(spark, sf)
    q.collect()
    val bhj = collectWithSubqueries(q.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.size >= 5,
      s"part/supplier/nation x2/region must broadcast, found ${bhj.size}")
  }

  test("bucketed range join plans an equi-join, never a nested loop") {
    val q = SparkEntry.queries("q_join_range_bucketed")(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the day-bucket join must stay an equi-join:\n$plan")
    // and it must agree with the naive range-join semantics
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 490000)
    val naive = li.join(o,
        li("l_shipdate") >= o("o_orderdate") &&
        li("l_shipdate") < o("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .count()
    val bucketed = q.agg(sum(col("n_pairs"))).head().getLong(0)
    assert(bucketed == naive, s"bucketed=$bucketed naive=$naive")
  }

  test("ANALYZE + CBO reorders the join tree around the selective dimension") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // Catalog tables + column stats are what unlock cost-based join
    // reordering: the syntactic order joins the two big tables first;
    // with exact rowCounts and ndv/selectivity estimates the optimizer
    // must instead start from customer x (nation WHERE name='FRANCE').
    Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("graft_cbo_orders")
    Tables.customer(spark, sf).write.mode("overwrite").saveAsTable("graft_cbo_customer")
    Tables.nation(spark, sf).write.mode("overwrite").saveAsTable("graft_cbo_nation")
    val q =
      """SELECT count(*) AS n
        |FROM graft_cbo_orders o
        |JOIN graft_cbo_customer c ON o.o_custkey = c.c_custkey
        |JOIN graft_cbo_nation n ON c.c_nationkey = n.n_nationkey
        |WHERE n.n_name = 'FRANCE'""".stripMargin
    def innermostJoinTables(plan: LogicalPlan): Set[String] = {
      val joins = plan.collect { case j: LJoin => j }
      joins.filter(_.children.forall(
          _.collect { case j: LJoin => j }.isEmpty))
        .flatMap(_.collectLeaves().collect {
          case l: LogicalRelation => l.catalogTable.map(_.identifier.table)
        }.flatten).toSet
    }
    try {
      Seq("orders", "customer", "nation").foreach(t => spark.sql(
        s"ANALYZE TABLE graft_cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS"))
      val heuristic = innermostJoinTables(
        spark.sql(q).queryExecution.optimizedPlan)
      assert(heuristic == Set("graft_cbo_orders", "graft_cbo_customer"),
        s"without CBO the syntactic order should hold, got $heuristic")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val cbo = spark.sql(q)
      val reordered = innermostJoinTables(cbo.queryExecution.optimizedPlan)
      assert(reordered == Set("graft_cbo_customer", "graft_cbo_nation"),
        s"CBO should join the selective dim first, got $reordered")
      // and reordering never changes the answer
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(spark, sf).filter(col("n_name") === "FRANCE"),
          col("c_nationkey") === col("n_nationkey"))
        .count()
      assert(cbo.head().getLong(0) == expected)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      Seq("orders", "customer", "nation").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_cbo_$t"))
    }
  }
  test("manifest-sized relations auto-broadcast: a small graft " +
      "dimension joins by broadcast with NO hint, on both the " +
      "FileIndex scan and the DV-bearing fallback relation") {
    import graft.sources.SnapshotTable
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bcast").toString
    val t = s"$dir/dim"
    SnapshotTable.create(spark, t, Tables.nation(spark, sf), numFiles = 1)
    val fact = Tables.customer(spark, sf)
    def joined() = {
      val dim = spark.read.format("graft").load(t)
      val j = fact.join(dim, col("c_nationkey") === col("n_nationkey"))
      j.collect()
      j.queryExecution.executedPlan
    }
    val bhj1 = collectWithSubqueries(joined()) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj1.nonEmpty, "the FileIndex relation must broadcast off " +
      "its manifest-listed size, hint-free")
    // flip the table onto the DV fallback relation: its sizeInBytes
    // must come from the manifest file sizes, not defaultSizeInBytes
    SnapshotTable.deleteWhereVector(spark, t, col("n_nationkey") === 0)
    val bhj2 = collectWithSubqueries(joined()) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj2.nonEmpty, "the DV-bearing relation must broadcast off " +
      "dataBytesOf, hint-free")
  }

  test("bucketed snapshot tables: equal-bucketed join plans with ZERO " +
      "shuffle exchanges, and the layout survives mutation + compact") {
    import graft.sources.SnapshotTable
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bucket").toString
    val (ta, tb) = (s"$dir/a", s"$dir/b")
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    SnapshotTable.createBucketed(spark, ta, orders, "o_custkey", 8,
      sortCols = Seq("o_custkey"))
    SnapshotTable.createBucketed(spark, tb, cust, "c_custkey", 8,
      sortCols = Seq("c_custkey"))
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def joined() = graft.sources.SnapshotScan.scan(spark, ta)._1
        .join(graft.sources.SnapshotScan.scan(spark, tb)._1,
          col("o_custkey") === col("c_custkey"))
      def assertNoExchange(tag: String): Unit = {
        val q = joined()
        q.collect()
        val shuffles = collectWithSubqueries(q.queryExecution.executedPlan) {
          case e: ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty,
          s"$tag: equal-bucketed join must plan NO exchange, got " +
            s"${shuffles.size}:\n${q.queryExecution.executedPlan}")
      }
      assertNoExchange("fresh layout")
      // correctness: the bucketed join equals the plain frame join
      val expect = orders.join(cust,
        col("o_custkey") === col("c_custkey")).count()
      assert(joined().count() === expect)
      // mutations restage per bucket — the property survives an
      // update, an append, and a full compaction
      SnapshotTable.updateWhere(spark, ta, col("o_orderkey") % 10 === 0,
        Map("o_totalprice" -> (col("o_totalprice") + 1)))
      SnapshotTable.append(spark, tb, cust.limit(50))
      assertNoExchange("after update + append")
      SnapshotTable.compact(spark, ta)
      SnapshotTable.compact(spark, tb)
      assertNoExchange("after compact")
      assert(joined().count() ===
        orders.join(cust.unionAll(cust.limit(50)),
          col("o_custkey") === col("c_custkey")).count())
      // SORTED buckets: after compact every bucket is ONE file sorted
      // on the declared key. Spark only trusts bucketed-scan ordering
      // behind spark.sql.legacy.bucketedTableScan.outputOrdering
      // (default false since 3.1 — many-files-per-bucket regressions);
      // with it on, the sort-merge join plans with no SortExec either:
      // zero exchanges AND zero sorts
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val q = joined()
        q.collect()
        val sorts = collectWithSubqueries(q.queryExecution.executedPlan) {
          case s: org.apache.spark.sql.execution.SortExec => s
        }
        assert(sorts.isEmpty,
          s"compacted sorted buckets must need no sort, got " +
            s"${sorts.size}:\n${q.queryExecution.executedPlan}")
      } finally spark.conf.unset(
        "spark.sql.legacy.bucketedTableScan.outputOrdering")
      // MISMATCHED bucket counts (8 vs 4): Spark's
      // coalesceBucketsInJoin (opt-in) reads the 8-bucket side
      // coalesced pairwise into 4 — still ZERO exchanges, no re-layout
      val tc = s"$dir/c"
      SnapshotTable.createBucketed(spark, tc, cust
        .select(col("c_custkey"), col("c_acctbal").as("bal2")),
        "c_custkey", 4)
      spark.conf.set(
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      try {
        val q2 = graft.sources.SnapshotScan.scan(spark, ta)._1
          .join(graft.sources.SnapshotScan.scan(spark, tc)._1,
            col("o_custkey") === col("c_custkey"))
        q2.collect()
        val shuffles2 = collectWithSubqueries(
          q2.queryExecution.executedPlan) {
          case e: ShuffleExchangeExec => e
        }
        assert(shuffles2.isEmpty,
          s"8x4 bucket join must coalesce, not exchange:\n" +
            q2.queryExecution.executedPlan)
      } finally spark.conf.unset(
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled")
    } finally {
      saved match {
        case Some(v) =>
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
