package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Two-phase staged write — the autonomous replacement for the
  * reference's human-in-the-loop CSV checkpoint (R9/R10/R11,
  * tables.py:99-115): every staged table is written to a review area;
  * a reviewer may edit files or veto a table by deleting its directory
  * (the reference's "deleted CSV removes the table" semantics,
  * tables.py:113-114); `promote` then re-reads whatever survived and
  * publishes it. No stdin barrier — the two directories ARE the barrier.
  *
  * Staging is parquet, not CSV, so dtypes survive the round-trip (the
  * reference loses int-ness through CSV and then rejects the floats it
  * gets back — tables.py:233-234, SURVEY.md §3.2).
  */
object Staging {

  /** Phase 1: write each named table into the staging area. With
    * `csvMirror = true`, each table is additionally written as headered
    * CSV under `<stageDir>/csv/<name>` — the reference's literal R9
    * checkpoint format (tables.py:99-104), kept for human review /
    * spreadsheet editing; the parquet copy remains the dtype-authoritative
    * one that `promote` republishes.
    */
  def stage(tables: Map[String, DataFrame], stageDir: String,
      csvMirror: Boolean = false): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$stageDir/$name")
      if (csvMirror)
        df.write.mode("overwrite").option("header", "true")
          .csv(s"$stageDir/csv/$name")
    }

  /** Read back a CSV mirror written by [[stage]] (R10), with an explicit
    * schema so dtypes survive the text round-trip — the failure the
    * reference hits when CSV turns its ints into floats (tables.py:233-234).
    */
  def readCsvMirror(spark: SparkSession, stageDir: String, name: String,
      schema: String): DataFrame =
    spark.read.option("header", "true").schema(schema)
      .csv(s"$stageDir/csv/$name")

  /** List the table names still present (not vetoed) in the staging area. */
  def staged(spark: SparkSession, stageDir: String): Seq[String] = {
    val p = Paths.get(stageDir)
    if (!Files.isDirectory(p)) Nil
    else Files.list(p).iterator.asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filter(_ != "csv") // the R9 CSV mirror area, not a staged table
      .toSeq.sorted
  }

  /** Phase 2: re-read every surviving staged table and publish it to the
    * final area. Returns the promoted table names.
    */
  def promote(spark: SparkSession, stageDir: String,
      finalDir: String): Seq[String] = {
    val names = staged(spark, stageDir)
    names.foreach { name =>
      spark.read.parquet(s"$stageDir/$name")
        .write.mode("overwrite").parquet(s"$finalDir/$name")
    }
    names
  }

  /** Veto a staged table (the reference's delete-the-CSV gesture). */
  def veto(stageDir: String, name: String): Unit = {
    val dir = Paths.get(stageDir, name)
    if (Files.isDirectory(dir)) {
      Files.walk(dir).iterator.asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }
}
