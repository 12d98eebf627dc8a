package graft.tools

import org.apache.spark.sql.SparkSession

/** SQL-surface walkthrough: builds a session with
  * `spark.sql.extensions=graft.GraftExtensions` (static-conf injection of
  * the native partial_ratio expression), adds the runtime-registered
  * functions, and drives everything through plain `spark.sql`.
  */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .appName("graft-sql-demo")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("INJECTED partial_ratio('Deg. Level','degradation level') = " +
      spark.sql("SELECT partial_ratio('Deg. Level', 'degradation level') AS s")
        .head().getInt(0))

    graft.GraftExtensions.register(spark)
    println("ABBREV pairs parsed = " +
      spark.sql("SELECT abbrev_pairs('TID = Total Ionizing Dose\nSEE = See (a,\nb)') AS p")
        .head().getSeq[Any](0).size)
    println("DENSITY over (4,2,0) width 4 = " +
      spark.sql("SELECT graft_row_density(x) AS d FROM VALUES (4),(2),(0) AS t(x)")
        .head().getDouble(0))

    try spark.sql("SELECT partial_ratio('a') AS s").head()
    catch { case e: Exception =>
      println("ARITY-ERR: " + e.getMessage.linesIterator.next()) }

    // canonical DDL (reference R25): register + query via plain SQL
    graft.Schemas.createTables(spark)
    println("DDL tables: " + spark.sql(
      "SHOW TABLES").collect().map(_.getString(1)).sorted.mkString(", "))
    println("rad_table columns: " + spark.sql(
      "SELECT * FROM rad_table").columns.length)
    println("insert+query roundtrip: " + {
      spark.sql("INSERT INTO rad_table VALUES (1, 'OP27', 'AD', null, null," +
        " null, 'bipolar', null, 'passed', 'Y', '<1', null, null, null," +
        " null, '2015 Compendium', '2015.pdf')")
      spark.sql("SELECT part_number, spec, dose_rate FROM rad_table")
        .collect().mkString(";")
    })
    graft.Schemas.canonicalTables.keys.foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $n"))
    spark.stop()
  }
}
