package graft

import graft.ingest.{BinaryIngest, Ingest, Staging, TitleJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Ingest-analog pipeline specs over reference-shaped fixtures
  * (FIXTURES.md B2/B3/B6): classification, fuzzy header mapping,
  * canonical projection, density gates, dedup idempotence, two-phase
  * staging, measurement parsing, spatial title join.
  */
class IngestSuite extends AnyFunSuite {
  import SparkFixture._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  test("classifyTitle follows the reference keyword rules (R12)") {
    import spark.implicits._
    val got = Seq(
      "Table 3. Proton Test Results",
      "List of Principal Investigators",
      "Abbreviations and Acronyms",
      "TID test results for 2015",
      "Some unrelated caption")
      .toDF("title")
      .select(Ingest.classifyTitle(col("title")).as("t"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("rad"), Some("principal_investigator"),
      Some("abbreviation"), Some("rad"), None))
  }

  // FIXTURES.md B2 messy header
  val messyHeader = Seq("Part\nNumber", "MANUFACTURER", "Device  Function",
    "Technology", "Results", "App.\nSpec (Y/N)", "Dose Rate", "Deg. Level")

  test("mapHeader aligns all 8 messy headers at >= 75 (R15)") {
    val m = Ingest.mapHeader(messyHeader)
    val expected = Map(
      "part number" -> 0, "manufacturer" -> 1, "device function" -> 2,
      "technology" -> 3, "results" -> 4, "spec" -> 5, "dose rate" -> 6,
      "degradation level" -> 7)
    expected.foreach { case (cat, idx) =>
      assert(m.contains(cat), s"category '$cat' unmapped; got $m")
      assert(m(cat)._1 == idx, s"'$cat' mapped to ${m(cat)._1}, want $idx")
    }
  }

  test("end-to-end: project -> row density gate -> dedup append (R16/R17/R21/R22)") {
    import spark.implicits._
    val staged = Seq(
      ("OP27", "Analog Devices", "op amp", "bipolar", "passed", "Y", "<1", "50-300"),
      ("LM139", "National", "comparator", "bipolar", "failed", "N", ">50", "HDR~65 LDR~30"),
      ("", "", "", "", "", "", "<1", ""), // sparse row -> density gate drops
      ("OP27", "Analog Devices", "op amp", "bipolar", "passed", "Y", "<1", "50-300")) // dup
      .toDF(messyHeader: _*)
    val mapping = Ingest.mapHeader(messyHeader)
    val projected = Ingest.projectCanonical(staged, mapping,
      "2015 Compendium", "2015.pdf")
    val mappedCols = mapping.keys.map(_.replace(' ', '_')).toSeq
    val valid = Ingest.withRowDensity(projected, mappedCols)
      .filter(col("row_density") >= 0.5)
      .drop("row_density")
    assert(valid.count() == 3) // sparse row dropped, dup still present

    val target = Files.createTempDirectory("graft_ingest").toString + "/rad"
    val keys = Seq("part_number", "manufacturer", "source_paper")
    val n1 = Ingest.appendDedup(valid, target, keys)
    assert(n1 == 2, "in-batch dup collapses on first write")
    val n2 = Ingest.appendDedup(valid, target, keys)
    assert(n2 == 0, "re-ingesting the same batch is a no-op (main.py:90)")
    assert(spark.read.parquet(target).count() == 2)
  }

  test("two-phase staging: stage -> veto -> promote (R9/R10/R11)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_stage").toString
    val t1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val t2 = Seq((3, "c")).toDF("id", "v")
    Staging.stage(Map("keep_me" -> t1, "veto_me" -> t2), s"$base/stage")
    assert(Staging.staged(spark, s"$base/stage") == Seq("keep_me", "veto_me"))
    Staging.veto(s"$base/stage", "veto_me")
    val promoted = Staging.promote(spark, s"$base/stage", s"$base/final")
    assert(promoted == Seq("keep_me"))
    assert(spark.read.parquet(s"$base/final/keep_me").count() == 2)
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/final/veto_me")))
  }

  test("updateWhere / deleteWhere rewrite the table (R23/R24)") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_crud").toString + "/t"
    Seq((1L, "OP27", "N"), (2L, "LM139", "N"), (3L, "OP27", "N"))
      .toDF("id", "part", "spec")
      .write.parquet(path)
    // R23: update spec for one part
    val updated = Ingest.updateWhere(spark, path,
      col("part") === "OP27", Map("spec" -> lit("Y")))
    assert(updated == 2)
    val after = spark.read.parquet(path)
    assert(after.filter(col("spec") === "Y").count() == 2)
    assert(after.filter(col("spec") === "N").count() == 1)
    // R24: delete with limit 1 (lowest id among matches)
    val deleted = Ingest.deleteWhere(spark, path,
      col("part") === "OP27", "id", limit = Some(1))
    assert(deleted == 1)
    val rest = spark.read.parquet(path)
    assert(rest.count() == 2)
    assert(rest.filter(col("id") === 1).count() == 0, "lowest-id match deleted")
  }

  test("deleteWhere handles NULL columns and duplicate rows correctly") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_crud2").toString + "/t"
    Seq((1L, "OP27", Some("x")), (2L, "OP27", None), // NULL column victim
      (3L, "OP27", Some("x")), (3L, "OP27", Some("x"))) // exact duplicates
      .toDF("id", "part", "note")
      .write.parquet(path)
    // delete all matches including the NULL-bearing row
    val n1 = Ingest.deleteWhere(spark, path, col("id") === 2, "id")
    assert(n1 == 1, s"NULL-column victim must be deleted, got $n1")
    // limit=1 over exact duplicates removes exactly one copy
    val n2 = Ingest.deleteWhere(spark, path, col("id") === 3, "id",
      limit = Some(1))
    assert(n2 == 1, s"limit=1 must delete one duplicate, got $n2")
    assert(spark.read.parquet(path).filter(col("id") === 3).count() == 1)
  }

  test("nearestAbove keeps a null-titled row when all texts are too far") {
    val texts = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "Far away header", 100.0, 900.0))),
      StructType(Seq(StructField("obj_id", LongType),
        StructField("text", StringType), StructField("x_mid", DoubleType),
        StructField("y_bottom", DoubleType))))
    val tables = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(10L, 100.0, 200.0))),
      StructType(Seq(StructField("table_id", LongType),
        StructField("x_mid", DoubleType), StructField("y_top", DoubleType))))
    val got = TitleJoin.nearestAbove(texts, tables).collect()
    assert(got.length == 1 && got(0).getLong(0) == 10L && got(0).isNullAt(1),
      s"table must survive with null title: ${got.toSeq}")
  }

  test("fuzzyDedup drops the reference's near-dup typo rows (§5.2)") {
    import spark.implicits._
    val rows = Seq(
      (1L, "OP27", "1366 MeV Xe passed"),
      (2L, "OP27", "1366 MV Xe passed"),   // typo twin of row 1 -> dropped
      (3L, "OP27", "completely different result text"),
      (4L, "LM139", "1366 MeV Xe passed")) // different block -> kept
      .toDF("id", "part_number", "results")
    val got = Ingest.fuzzyDedup(rows, Seq("part_number"), "results", "id",
      threshold = 90)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 4L), s"got $got")
  }

  test("expandAbbreviations rewrites whole words across columns (intended R20)") {
    import spark.implicits._
    val pairs = Seq(("tid", "total ionizing dose"), ("see", "single event effects"))
      .toDF("abbrev", "expansion")
    val table = Seq(
      (1L, "tid threshold exceeded", "see section 2"),
      (2L, "tidal effects", "nothing here"))
      .toDF("id", "results", "misc")
    val got = Ingest.expandAbbreviations(table, Seq("results", "misc"), pairs)
      .orderBy("id").collect()
    assert(got(0).getString(1) == "total ionizing dose threshold exceeded")
    assert(got(0).getString(2) == "single event effects section 2")
    assert(got(1).getString(1) == "tidal effects", "no partial-word replacement")
  }

  test("measurement parser handles the reference's value shapes") {
    import spark.implicits._
    val got = Seq("<1", ">50", "50-300", "HDR~65 LDR~30", "17.5", "n/a")
      .toDF("raw_in")
      .select(Ingest.parseMeasurement(col("raw_in")).as("m"))
      .select(col("m.op"), col("m.value"), col("m.value_hi"))
      .collect()
      .map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got(0) == (Some("<"), Some(1.0), None))
    assert(got(1) == (Some(">"), Some(50.0), None))
    assert(got(2) == (Some("range"), Some(50.0), Some(300.0)))
    assert(got(3) == (Some("approx"), Some(65.0), None))
    assert(got(4) == (Some("="), Some(17.5), None))
    assert(got(5) == (None, None, None))
  }

  // FIXTURES.md B3: title candidates geometry
  test("nearestAbove picks closest text above, merges two-line titles (R6)") {
    val texts = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "Table 3. Proton Results", 100.0, 210.0),
        Row(2L, "(continued from previous page)", 100.0, 205.0),
        Row(3L, "Unrelated footnote", 400.0, 190.0),
        Row(4L, "Far away header", 100.0, 900.0))),
      StructType(Seq(StructField("obj_id", LongType),
        StructField("text", StringType), StructField("x_mid", DoubleType),
        StructField("y_bottom", DoubleType))))
    val tables = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, 100.0, 200.0), // title: obj 2 is closest (d=5) but obj 1 has 'table'... obj 2 wins on distance
        Row(11L, 400.0, 185.0))), // obj 3 at d=5
      StructType(Seq(StructField("table_id", LongType),
        StructField("x_mid", DoubleType), StructField("y_top", DoubleType))))
    val got = TitleJoin.nearestAbove(texts, tables)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(10L) == "(continued from previous page)")
    assert(got(11L) == "Unrelated footnote")
    // two-line merge: make obj 1 the nearest for a third table
    val tables2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(12L, 100.0, 209.0))),
      StructType(Seq(StructField("table_id", LongType),
        StructField("x_mid", DoubleType), StructField("y_top", DoubleType))))
    val got2 = TitleJoin.nearestAbove(texts, tables2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // obj 1 (d=1) beats obj 4; contains 'table' -> next obj (2) concatenated
    assert(got2(12L) == "Table 3. Proton Results (continued from previous page)")
  }

  test("CSV staging mirror round-trips a table with dtypes intact (R9/R10)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_csvmirror").toString
    val t = Seq((1, "alpha"), (2, "beta"), (3, "gamma")).toDF("id", "name")
    Staging.stage(Map("dim" -> t), s"$base/stage", csvMirror = true)
    // the csv/ mirror area must not register as a staged table
    assert(Staging.staged(spark, s"$base/stage") == Seq("dim"))
    val back = Staging.readCsvMirror(spark, s"$base/stage", "dim",
      "id INT, name STRING")
    assert(back.schema.map(_.dataType.simpleString) == Seq("int", "string"),
      "explicit schema must survive the text round-trip")
    assert(back.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
      .toSeq == Seq((1, "alpha"), (2, "beta"), (3, "gamma")))
  }

  test("compaction collapses a fragmented table without changing rows") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val docs = Tables.documents(spark, sf)
    docs.repartition(64).write.parquet(dir)
    val checksumBefore = spark.read.parquet(dir)
      .agg(sum(col("doc_id")), count(lit(1))).head
    val (before, after) = Ingest.compact(spark, dir, targetMB = 128)
    assert(before == 64 && after == 1,
      s"expected 64 -> 1 files, got $before -> $after")
    val checksumAfter = spark.read.parquet(dir)
      .agg(sum(col("doc_id")), count(lit(1))).head
    assert(checksumBefore == checksumAfter)
  }

  test("binary manifest: sha256/length match java.security digests (R4 analog)") {
    val docsDir = BinaryIngest.defaultDocsDir
    val m = BinaryIngest.manifest(spark, docsDir).collect()
      .map(r => r.getAs[String]("file_name") ->
        (r.getAs[Long]("length"), r.getAs[String]("sha256"))).toMap
    assert(m.nonEmpty, s"no PDFs found under $docsDir")
    val (fname, (len, sha)) = m.head match { case (k, v) => (k, v) }
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(docsDir, fname))
    assert(bytes.length.toLong == len)
    val expect = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString
    assert(sha == expect, s"$fname sha mismatch")
  }

  test("binary paper-skip anti-join drops already-ingested files (R3)") {
    val docsDir = BinaryIngest.defaultDocsDir
    val m = BinaryIngest.manifest(spark, docsDir, withSha = false)
    val all = m.count()
    val seen = m.limit(3)
    val fresh = BinaryIngest.skipIngested(m, seen)
    assert(fresh.count() == all - 3)
    // idempotence: skipping against everything yields nothing
    assert(BinaryIngest.skipIngested(m, m).count() == 0)
  }
}
