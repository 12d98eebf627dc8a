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
      // edge cases chosen to separate String.trim (all chars <= 0x20)
      // from Spark's trim (0x20 only) and from \s: tab, control char,
      // trailing newline
      val cases = Seq("abc def", "   ", "\t", "", "x\n", null)
      def scored(sess: SparkSession) = sess.createDataFrame(
          sess.sparkContext.parallelize(
            cases.map(org.apache.spark.sql.Row(_))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.StringType))))
        .select(org.apache.spark.sql.functions.col("v"),
          graft.functions.PartialRatioExpr.partial_ratio(
            org.apache.spark.sql.functions.col("v"),
            org.apache.spark.sql.functions.col("v")).as("s"))
      // the frames MUST be RDD-backed: a LocalRelation projection is
      // eagerly evaluated by ConvertToLocalRelation BEFORE injected
      // rules run, which would make this test vacuous
      val df = scored(s2)
      // the rule must have FIRED (the fold's regex test is in the plan)
      // and the quadratic expression must be gone
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("partial_ratio"), s"self-match must fold away:\n$plan")
      assert(plan.contains("RLIKE"), s"expected the fold's regex test:\n$plan")
      def toMapOf(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
          (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
      val got = toMapOf(df.collect())
      // the UNFOLDED expression (fixture session, no injected rule; plan
      // verified to still carry partial_ratio) must agree case by case
      val refDf = scored(prev)
      assert(refDf.queryExecution.optimizedPlan.toString
        .contains("partial_ratio"), "reference side must stay unfolded")
      val ref = toMapOf(refDf.collect())
      assert(got == ref, s"fold diverges from the expression: $got vs $ref")
      assert(got("abc def") == Some(100) && got("\t") == Some(0) &&
        got("") == Some(0) && got("x\n") == Some(100) &&
        got(null) == None, got.toString)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
