package graft

import graft.sources.{MaterializedView, SnapshotTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized-view maintenance contract: incremental refresh ==
  * full recompute across every maintainable aggregate (count, sum,
  * avg, min/max), the r19-advice correctness rails (grouping-key
  * bijection, NULL-safe group merging, NULL-sum preservation, schema
  * order), and the bounded-drift rebase for FLOAT/DOUBLE measures.
  */
class MaterializedViewSuite extends AnyFunSuite {
  import SparkFixture._
  import spark.implicits._

  private def fresh(tag: String): String =
    s"/tmp/graft_mvsuite_${tag}_${System.nanoTime()}"

  private def refresh(m: String): (String, Long, Long, Long) =
    MaterializedView.refresh(spark, m)

  private def lineitems: DataFrame =
    Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      col("l_quantity"))

  test("avg/min/max maintain incrementally through a mixed gauntlet " +
      "and equal the full recompute exactly (integral-valued measures)") {
    val t = fresh("amm_src"); val m = fresh("amm")
    SnapshotTable.create(spark, t, lineitems, numFiles = 4)
    MaterializedView.create(spark, m, t,
      "SELECT l_returnflag, count(1) AS n, sum(l_quantity) AS qty, " +
        "avg(l_quantity) AS aq, min(l_quantity) AS mn, " +
        "max(l_quantity) AS mx FROM __source__ " +
        "WHERE l_orderkey % 3 != 1 GROUP BY l_returnflag")
    // update touches group A (its delete side forces the min/max
    // recompute for A), delete touches R, the append touches all —
    // so both the merge path and the touched-group recompute run
    SnapshotTable.updateWhere(spark, t,
      col("l_returnflag") === "A" && col("l_orderkey") % 100 === 0,
      Map("l_quantity" -> (col("l_quantity") + 5)))
    SnapshotTable.deleteWhere(spark, t,
      col("l_returnflag") === "R" && col("l_orderkey") % 17 === 3)
    SnapshotTable.append(spark, t,
      lineitems.filter(col("l_orderkey") % 5 === 0))
    val (mode, from, to, _) = refresh(m)
    assert(mode === "incremental", s"expected incremental, got $mode")
    assert(from === 1L && to === 4L)
    val got = SnapshotTable.read(spark, m)
      .orderBy(col("l_returnflag")).collect().toSeq
    val want = SnapshotTable.read(spark, t)
      .filter(col("l_orderkey") % 3 =!= 1)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"),
        avg(col("l_quantity")).as("aq"), min(col("l_quantity")).as("mn"),
        max(col("l_quantity")).as("mx"))
      .orderBy(col("l_returnflag")).collect().toSeq
    assert(got === want,
      "incremental avg/min/max must equal the recompute")
    // the visible schema is the definition's schema — no hidden state
    assert(SnapshotTable.read(spark, m).columns.toSeq ===
      Seq("l_returnflag", "n", "qty", "aq", "mn", "mx"))
    assert(refresh(m)._1 === "noop")
  }

  test("a deleted row RAISES a group min (touched-group recompute) " +
      "while an untouched group merges inserts monotonically") {
    val t = fresh("minraise_src"); val m = fresh("minraise")
    SnapshotTable.create(spark, t,
      Seq(("a", 1.0), ("a", 5.0), ("b", 7.0)).toDF("g", "x"),
      numFiles = 1)
    MaterializedView.create(spark, m, t,
      "SELECT g, min(x) AS mn, max(x) AS mx, count(1) AS n " +
        "FROM __source__ GROUP BY g")
    SnapshotTable.deleteWhere(spark, t, col("g") === "a" && col("x") === 1.0)
    SnapshotTable.append(spark, t, Seq(("b", 3.0)).toDF("g", "x"))
    val (mode, _, _, _) = refresh(m)
    assert(mode === "incremental")
    val rows = SnapshotTable.read(spark, m).orderBy(col("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getLong(3))).toSeq
    assert(rows === Seq(("a", 5.0, 5.0, 1L), ("b", 3.0, 7.0, 2L)),
      s"got $rows")
  }

  test("GROUP BY keys not all projected (many-to-many merge hazard) " +
      "classify as full recompute and stay exact") {
    val t = fresh("bij_src"); val m = fresh("bij")
    val orders = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_orderstatus"))
    SnapshotTable.create(spark, t, orders, numFiles = 2)
    MaterializedView.create(spark, m, t,
      "SELECT o_orderstatus, count(1) AS n FROM __source__ " +
        "GROUP BY o_orderstatus, o_orderkey % 10")
    SnapshotTable.deleteWhere(spark, t, col("o_orderkey") % 7 === 0)
    val (mode, _, _, _) = refresh(m)
    assert(mode === "full",
      "a definition whose GROUP BY keys are not all projected must " +
        s"recompute in full, got $mode")
    val got = SnapshotTable.read(spark, m)
      .orderBy(col("o_orderstatus"), col("n")).collect().toSeq
    val want = SnapshotTable.read(spark, t)
      .groupBy(col("o_orderstatus"), (col("o_orderkey") % 10).as("b"))
      .agg(count(lit(1)).as("n")).select(col("o_orderstatus"), col("n"))
      .orderBy(col("o_orderstatus"), col("n")).collect().toSeq
    assert(got === want)
  }

  test("a NULL group key stays ONE group through incremental refresh " +
      "(null-safe key merge)") {
    val t = fresh("nullg_src"); val m = fresh("nullg")
    SnapshotTable.create(spark, t,
      Seq((None: Option[String], 10L), (None, 20L), (Some("s"), 5L))
        .toDF("grp", "v"),
      numFiles = 1)
    MaterializedView.create(spark, m, t,
      "SELECT grp, sum(v) AS s, count(1) AS n FROM __source__ GROUP BY grp")
    SnapshotTable.deleteWhere(spark, t, col("v") === 10L)
    SnapshotTable.append(spark, t,
      Seq((None: Option[String], 7L)).toDF("grp", "v"))
    val (mode, _, _, _) = refresh(m)
    assert(mode === "incremental")
    val rows = SnapshotTable.read(spark, m)
      .orderBy(col("grp").asc_nulls_first)
      .collect().map(r => (Option(r.getString(0)),
        r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((None, 27L, 2L), (Some("s"), 5L, 1L)),
      s"the NULL group must net as one row, got $rows")
  }

  test("a group whose measures go all-NULL emits a NULL sum, not 0") {
    val t = fresh("nullsum_src"); val m = fresh("nullsum")
    SnapshotTable.create(spark, t,
      Seq(("a", Some(1L)), ("a", None: Option[Long]), ("b", Some(2L)))
        .toDF("g", "x"),
      numFiles = 1)
    MaterializedView.create(spark, m, t,
      "SELECT g, sum(x) AS s, count(1) AS n FROM __source__ GROUP BY g")
    SnapshotTable.deleteWhere(spark, t, col("x") === 1L)
    val (mode, _, _, _) = refresh(m)
    assert(mode === "incremental")
    val rows = SnapshotTable.read(spark, m).orderBy(col("g"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2))).toSeq
    assert(rows === Seq(("a", None, 1L), ("b", Some(2L), 1L)),
      s"netting must preserve the NULL sum, got $rows")
  }

  test("a definition interleaving group and aggregate columns keeps " +
      "its schema order through incremental refresh") {
    val t = fresh("order_src"); val m = fresh("order")
    SnapshotTable.create(spark, t,
      Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "x"), numFiles = 1)
    MaterializedView.create(spark, m, t,
      "SELECT sum(x) AS s, g, count(1) AS n FROM __source__ GROUP BY g")
    assert(SnapshotTable.read(spark, m).columns.toSeq ===
      Seq("s", "g", "n"))
    SnapshotTable.append(spark, t, Seq(("b", 4L)).toDF("g", "x"))
    val (mode, _, _, _) = refresh(m)
    assert(mode === "incremental")
    val df = SnapshotTable.read(spark, m)
    assert(df.columns.toSeq === Seq("s", "g", "n"),
      "incremental refresh must not reorder the MV schema")
    val rows = df.orderBy(col("g"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq((3L, "a", 2L), (7L, "b", 2L)))
  }

  test("a GLOBAL aggregate nets incrementally and keeps its row when " +
      "every source row is deleted (recompute parity)") {
    val t = fresh("glob_src"); val m = fresh("glob")
    SnapshotTable.create(spark, t,
      Seq(("a", 1L), ("b", 2L)).toDF("g", "x"), numFiles = 1)
    MaterializedView.create(spark, m, t,
      "SELECT count(1) AS n, sum(x) AS s FROM __source__")
    SnapshotTable.deleteWhere(spark, t, lit(true))
    val (mode, _, _, _) = refresh(m)
    assert(mode === "incremental")
    val r = SnapshotTable.read(spark, m).head()
    assert(r.getLong(0) === 0L && r.isNullAt(1),
      s"the global row must survive as (0, NULL), got $r")
  }

  test("DOUBLE-sum drift is BOUNDED: every RebaseEvery-th refresh of " +
      "a float-netting definition recomputes in full") {
    val t = fresh("drift_src"); val m = fresh("drift")
    SnapshotTable.create(spark, t,
      Seq(("a", 0.1), ("b", 0.2)).toDF("g", "x"), numFiles = 1)
    MaterializedView.create(spark, m, t,
      "SELECT g, sum(x) AS s FROM __source__ GROUP BY g")
    val modes = (1 to 10).map { i =>
      SnapshotTable.append(spark, t,
        Seq(("a", 0.1 * i), ("b", 1.0 / (i + 2))).toDF("g", "x"))
      val (mode, _, _, _) = refresh(m)
      val got = SnapshotTable.read(spark, m).orderBy(col("g"))
        .collect().map(_.getDouble(1))
      val want = SnapshotTable.read(spark, t).groupBy(col("g"))
        .agg(sum(col("x"))).orderBy(col("g"))
        .collect().map(_.getDouble(1))
      got.zip(want).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
          s"refresh $i drifted: $a vs $b") }
      if (mode == "full")
        got.zip(want).foreach { case (a, b) =>
          assert(a === b, "a rebase must be exactly the recompute") }
      mode
    }
    assert(modes.take(7).forall(_ == "incremental"),
      s"refreshes 1-7 must net incrementally, got $modes")
    assert(modes(7) === "full",
      s"refresh ${MaterializedView.RebaseEvery} must rebase, got $modes")
    assert(modes.drop(8).forall(_ == "incremental"),
      s"netting must resume after the rebase, got $modes")
  }

  test("definitions projecting the reserved aux prefix are refused") {
    val t = fresh("aux_src"); val m = fresh("aux")
    SnapshotTable.create(spark, t,
      Seq(("a", 1L)).toDF("g", "x"), numFiles = 1)
    val e = intercept[Exception] {
      MaterializedView.create(spark, m, t,
        "SELECT g, count(1) AS __graft_mv_live FROM __source__ GROUP BY g")
    }
    assert(e.getMessage.contains("__graft_mv_"))
  }

  test("staging width scales with MV row count (size-aware, capped)") {
    assert(MaterializedView.stagingPartitions(0L) === 1)
    assert(MaterializedView.stagingPartitions(1L) === 1)
    assert(MaterializedView.stagingPartitions(2L * 1024 * 1024) === 1)
    assert(MaterializedView.stagingPartitions(2L * 1024 * 1024 + 1) === 2)
    assert(MaterializedView.stagingPartitions(100L * 1024 * 1024) === 50)
    assert(MaterializedView.stagingPartitions(Long.MaxValue / 4) === 256)
  }
}
