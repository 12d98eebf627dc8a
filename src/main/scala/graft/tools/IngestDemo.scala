package graft.tools

import graft.ingest.{Ingest, Staging, TitleJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end ingest walkthrough through the public `graft.ingest` API:
  * messy extracted table -> classify -> fuzzy-align -> project ->
  * validate -> stage -> veto -> promote -> dedup-append. Prints each
  * stage's observable output; doubles as the usage example for the
  * reference's ingest capability re-expressed on Spark.
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. classification of extracted table titles (R12)
    val titles = Seq("Table 3. Proton SEE Test Results",
      "Abbreviations and Acronyms", "Random caption").toDF("title")
      .withColumn("table_type", Ingest.classifyTitle(col("title")))
    println("== classify =="); titles.show(false)

    // 2. messy header -> canonical categories (R14/R15)
    val header = Seq("Part\nNumber", "MANUFACTURER", "Device  Function",
      "Technology", "Results", "App.\nSpec (Y/N)", "Dose Rate", "Deg. Level")
    val mapping = Ingest.mapHeader(header)
    println("== mapHeader ==")
    mapping.toSeq.sortBy(_._2._1).foreach { case (cat, (idx, score)) =>
      val h = header(idx).replace("\n", "\\n")
      println(s"  col[$idx] '$h' -> $cat (score $score)") }

    // 3. project + validate + measurement parse (R16/R17/R18)
    val staged = Seq(
      ("OP27", "Analog Devices", "op amp", "bipolar", "passed", "Y", "<1", "50-300"),
      ("", "", "", "", "", "", "<1", ""),
      ("2N2222", "Fairchild", "transistor", "bipolar", "failed", "N", "HDR~65 LDR~30", ">50"))
      .toDF(header: _*)
    val projected = Ingest.projectCanonical(staged, mapping, "2015 Compendium", "2015.pdf")
    val mappedCols = mapping.keys.map(_.replace(' ', '_')).toSeq
    val valid = Ingest.withRowDensity(projected, mappedCols)
      .withColumn("dose_rate_parsed", Ingest.parseMeasurement(col("dose_rate")))
    println("== projected + density + parsed ==")
    valid.select("part_number", "manufacturer", "row_density",
      "dose_rate", "dose_rate_parsed").show(false)

    // 4. two-phase staging with veto (R9/R10/R11)
    val base = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val keep = valid.filter(col("row_density") >= 0.5).drop("row_density", "dose_rate_parsed")
    Staging.stage(Map("rad_2015" -> keep, "junk_table" -> titles), s"$base/stage")
    Staging.veto(s"$base/stage", "junk_table")
    val promoted = Staging.promote(spark, s"$base/stage", s"$base/final")
    println(s"== staging == promoted=$promoted")

    // 5. idempotent dedup append (R21/R22)
    val keys = Seq("part_number", "manufacturer", "source_paper")
    val n1 = Ingest.appendDedup(spark.read.parquet(s"$base/final/rad_2015"),
      s"$base/warehouse/rad", keys)
    val n2 = Ingest.appendDedup(spark.read.parquet(s"$base/final/rad_2015"),
      s"$base/warehouse/rad", keys)
    println(s"== appendDedup == first=$n1 rows, re-ingest=$n2 rows (idempotent)")
    println("warehouse contents:")
    spark.read.parquet(s"$base/warehouse/rad")
      .select("part_number", "manufacturer", "spec", "dose_rate", "source_paper")
      .show(false)

    // 5a. CRUD rewrites (R23 update / R24 delete-with-limit)
    val crud = s"$base/warehouse/rad"
    val nUpd = Ingest.updateWhere(spark, crud,
      col("part_number") === "op27", Map("spec" -> lit("n")))
    val nDel = Ingest.deleteWhere(spark, crud,
      col("part_number").isNotNull, "part_number", limit = Some(1))
    println(s"== CRUD == updated=$nUpd deleted(limit 1)=$nDel, remaining:")
    spark.read.parquet(crud).select("part_number", "spec").show(false)

    // 5b. fuzzy near-dup elimination (the reference's '1366 MV Xe' vs
    // '1366 MeV Xe' defect, SURVEY.md §5.2)
    val noisy = Seq(
      (1L, "OP27", "1366 MeV Xe passed"),
      (2L, "OP27", "1366 MV Xe passed"),
      (3L, "OP27", "unrelated result"),
      (4L, "LM139", "1366 MeV Xe passed"))
      .toDF("id", "part_number", "results")
    println("== fuzzyDedup == survivors:")
    Ingest.fuzzyDedup(noisy, Seq("part_number"), "results", "id", 90)
      .orderBy("id").show(false)

    // 5c. abbreviation glossary -> expansion (R19 parse + intended R20):
    // pairs parsed from a glossary cell, then applied to a table
    val glossary = "TID = Total Ionizing Dose\nSEE = Single Event Effects"
    val pairsDf = graft.functions.AbbrevPairs.parse(glossary)
      .toDF("abbrev", "expansion")
    val reports = Seq((1L, "tid threshold reached during see testing"),
      (2L, "tidal loads are unrelated")).toDF("id", "results")
    println("== abbrev expansion ==")
    Ingest.expandAbbreviations(reports, Seq("results"), pairsDf)
      .orderBy("id").show(false)

    // 6. spatial nearest-above title join (R6)
    val texts = Seq((1L, "Table 3. Proton Results", 100.0, 210.0),
      (2L, "(continued)", 100.0, 205.0), (3L, "Footnote", 400.0, 190.0))
      .toDF("obj_id", "text", "x_mid", "y_bottom")
    val anchors = Seq((10L, 100.0, 209.0), (11L, 400.0, 185.0))
      .toDF("table_id", "x_mid", "y_top")
    println("== titleJoin ==")
    TitleJoin.nearestAbove(texts, anchors).orderBy("table_id").show(false)

    // 7. the same dataflow over the REAL corpus (R5 lattice extraction
    // -> the whole reference pipeline): rad_table rows and the mined
    // abbreviation glossary from the actual compendium PDFs
    val docs = graft.ingest.BinaryIngest.defaultDocsDir
    if (new java.io.File(docs).isDirectory) {
      val rad = graft.ingest.PdfIngest.radTable(spark, docs)
      println(s"== REAL corpus rad_table == ${rad.count()} rows")
      rad.select("part_number", "manufacturer", "technology",
          "source_paper_filename")
        .filter(col("part_number").isNotNull && col("part_number") =!= "")
        .orderBy("part_number").show(8, truncate = 24)
      import graft.functions.AbbrevPairsGen.abbrev_pairs_gen
      val glossaryReal = graft.ingest.PdfIngest.abbrevCells(spark, docs)
        .select(abbrev_pairs_gen(col("cell")).as(Seq("abbrev", "expansion")))
        .distinct()
      println(s"== REAL corpus glossary == ${glossaryReal.count()} pairs")
      glossaryReal.orderBy("abbrev").show(8, truncate = 40)
    }
    spark.stop()
  }
}
