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
}
