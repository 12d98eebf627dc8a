package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration: the custom operators callable from plain
  * `spark.sql`, both via runtime registration and via
  * `spark.sql.extensions` (native Catalyst function injection).
  */
class ExtensionsSuite extends AnyFunSuite {
  import SparkFixture._

  test("runtime-registered functions are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT partial_ratio('part number', 'Part\\nNumber') AS s, " +
      "size(abbrev_pairs('TID = Total Ionizing Dose')) AS n").head
    assert(r.getInt(0) == 100)
    assert(r.getInt(1) == 1)
    val d = spark.sql(
      "SELECT graft_row_density(x) FROM VALUES (4), (0) AS t(x)").head
    assert(d.getDouble(0) == 0.5)
  }

  test("extensions-injected partial_ratio is a native expression") {
    // force a NEW session instance (same shared context): getOrCreate
    // would return the fixture session and silently ignore the
    // extensions config
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions drives the same injection path as the
      // spark.sql.extensions static conf (which only applies when the
      // SparkContext itself is created — not testable on a shared
      // test context)
      val s2 = SparkSession.builder().master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql("SELECT partial_ratio('dose rate', 'DOSE   RATE') AS s").head
      assert(r.getInt(0) == 100)
      // the injected Generator works in LATERAL VIEW position — the SQL
      // UDTF surface of reference R19
      val pairs = s2.sql(
        """SELECT abbrev, expansion FROM VALUES
          |  ('TID = Total Ionizing Dose\nSEE = Single Event Effects (heavy ion,\nproton)')
          |  AS t(cell)
          |LATERAL VIEW abbrev_pairs_gen(cell) g AS abbrev, expansion
          |ORDER BY abbrev""".stripMargin).collect()
      assert(pairs.map(_.getString(0)).toSeq == Seq("see", "tid"))
      assert(pairs.find(_.getString(0) == "see").get.getString(1) ==
        "single event effects (heavy ion, proton)")
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("SelfSimilarityFold rewrites partial_ratio(x, x) exactly") {
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .appName("graft-ext-rule-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val df = s2.sql(
        """SELECT partial_ratio(v, v) AS s
          |FROM VALUES ('abc def'), ('   '), (CAST(NULL AS STRING)) AS t(v)
          |ORDER BY v NULLS FIRST""".stripMargin)
      // the optimized plan must not evaluate the quadratic expression
      assert(!df.queryExecution.optimizedPlan.toString.contains("partial_ratio"),
        s"self-match must fold away:\n${df.queryExecution.optimizedPlan}")
      val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      // null -> null, whitespace-only -> 0, normal -> 100 — exactly the
      // unfolded expression's semantics (asserted against it below)
      assert(got.toSeq == Seq(None, Some(0), Some(100)), got.mkString(","))
      // the sessions WITHOUT the rule agree (same query, unfolded plan)
      val vcol = org.apache.spark.sql.functions.col("v")
      val ref = prev.sql(
        """SELECT v FROM VALUES ('abc def'), ('   '), (CAST(NULL AS STRING)) AS t(v)""")
        .select(graft.functions.PartialRatioExpr
          .partial_ratio(vcol, vcol).as("s"))
        .orderBy(org.apache.spark.sql.functions.col("s").asc_nulls_first)
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      assert(ref.toSeq == Seq(None, Some(0), Some(100)), ref.mkString(","))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
