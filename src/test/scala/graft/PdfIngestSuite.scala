package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Per-stage and end-to-end pins for the real-corpus ingest dataflow
  * (PdfIngest): the reference's main.py:83-108 pipeline re-created over
  * the same input bytes, checked stage by stage on synthetic fixtures
  * and end to end on the actual compendium PDFs.
  */
class PdfIngestSuite extends AnyFunSuite {

  private def frag(x: Double, y: Double, w: Double, t: String,
      ord: Int = 0) =
    PdfLattice.TextFrag(x, y, x + w, y, t, ord)

  test("textLines groups baselines and joins runs gap-aware") {
    // ords model the content-stream paint order (joinFrags assembles
    // in stream order, like pdfminer's char walk)
    val lines = PdfIngest.textLines(Seq(
      frag(10, 700, 5, "T", 0), frag(15.5, 700, 30, "ABLE IV", 1),
      frag(80, 700.8, 40, "RESULTS", 2), // same baseline within tolerance
      frag(10, 650, 30, "second line", 3)))
    assert(lines.map(_.text) == Seq("TABLE IV RESULTS", "second line"))
    assert(lines.head.y > lines(1).y)
  }

  test("closestTitle follows the reference walk: shrinking threshold, " +
      "50-char cap, two-line merge, titleless without 'table'") {
    val table = PdfLattice.Table(100, 400, 300, 500, Vector(Vector("x")))
    def line(y: Double, t: String) = PdfIngest.Line(150, 250, y, t)
    // no 'table' substring anywhere -> ""
    assert(PdfIngest.closestTitle(table, Seq(line(520, "just a caption")))
      == "")
    // plain table title, no merge
    assert(PdfIngest.closestTitle(table,
      Seq(line(560, "far away"), line(520, "Table IV results")))
      == "Table IV results")
    // two-line merge: a CLOSER candidate after the flagged title appends
    assert(PdfIngest.closestTitle(table,
      Seq(line(530, "Table IV"), line(510, "summary of results")))
      == "Table IV summary of results")
    // candidates past the 50-char cap never win
    assert(PdfIngest.closestTitle(table,
      Seq(line(510, "x" * 60), line(530, "Table IV"))) == "Table IV")
  }

  test("tableType mirrors find_table_type word-boundary rules") {
    assert(PdfIngest.tableType("TABLE II LIST OF PRINCIPAL INVESTIGATORS")
      .contains("principal_investigator"))
    assert(PdfIngest.tableType("TABLE III ABBREVIATIONS AND CONVENTIONS")
      .contains("abbreviation"))
    assert(PdfIngest.tableType("TABLE IV SUMMARY OF TID AND DD TEST RESULTS")
      .contains("rad"))
    assert(PdfIngest.tableType("TABLE V ONGOING LOW DOSE RATE TESTS :")
      .contains("rad"))
    // 'INVESTIGATORS' does not word-match 'investigator' but 'PRINCIPAL'
    // matches; a title with neither stays untyped and is dropped
    assert(PdfIngest.tableType("TABLE I PROTON TEST FACILITIES").isEmpty)
  }

  test("mapHeader maps the real 2018 header at >= 75 partial_ratio") {
    val m = PdfIngest.mapHeader(Vector("Part Number", "Manufacturer",
      "LDC", "Device Function", "Technology", "PI", "Sample Size",
      "Results", "App. Spec (Y/N)", "Dose rate (mrad(Si)/s)",
      "Degradation Level (krad(Si))"))
    assert(m("part number") == 0)
    assert(m("manufacturer") == 1)
    assert(m("device function") == 3)
    assert(m("technology") == 4)
    assert(m("results") == 7)
    assert(m("dose rate") == 9)
    assert(m("degradation level") == 10)
  }

  test("mapRow enforces the reference validity rule (provenance counts: " +
      "3 non-empty mapped categories suffice)") {
    val mapping = Map("part number" -> 0, "manufacturer" -> 1,
      "results" -> 2, "dose rate" -> 3, "degradation level" -> 4)
    // 5 of 10 categories mapped and non-empty -> valid
    assert(PdfIngest.mapRow(Vector("2N2222", "Fairchild", "ok", "10", ">30"),
      mapping).isDefined)
    // the reference appends the two always-non-empty provenance values
    // before dividing by 10 (tables.py:237-257): 3 non-empty mapped
    // categories -> (3+2)/10 = 0.5 -> valid ...
    assert(PdfIngest.mapRow(Vector("2N2222", "Fairchild", "ok", "", ""),
      mapping).isDefined)
    // ... but 2 -> 0.4 -> invalid
    assert(PdfIngest.mapRow(Vector("2N2222", "Fairchild", "", "", ""),
      mapping).isEmpty)
    assert(PdfIngest.mapRow(Vector("2N2222", "", "", "", ""),
      mapping).isEmpty)
  }

  test("radRowsOf: the real 2018 compendium yields its TID/DD part rows") {
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      BinaryIngest.defaultDocsDir, "2018-nasa-compendium.pdf"))
    val rows = PdfIngest.radRowsOf("2018-nasa-compendium.pdf", data)
    assert(rows.nonEmpty)
    val byPart = rows.map(r => r.head -> r).toMap
    // independently verified against the printed table: AD620SQ/883B,
    // Analog Devices, Bipolar op-amp, App.Spec Y
    val ad620 = byPart("AD620SQ/883B")
    assert(ad620(1) == "Analog Devices")
    assert(ad620(3) == "Bipolar")
    assert(ad620.last == "2018-nasa-compendium.pdf")
    // provenance = Title + ModDate concatenated, quotes stripped
    // (get_pdf_title, tables.py:67-76)
    assert(ad620(10).startsWith("NASA Goddard"))
    assert(ad620(10).endsWith("00"), "ModDate tail, quotes stripped")
    assert(!ad620(10).contains("'") && !ad620(10).contains("\""))
  }

  test("R4 gate: a PDF without an Info /Title contributes no rows " +
      "(tables.py:83-84)") {
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      BinaryIngest.defaultDocsDir, "2019-nasa-compendium.pdf"))
    assert(PdfMeta.titleModDate(data)._1.isEmpty, "fixture: 2019 has no /Title")
    assert(PdfIngest.radRowsOf("2019-nasa-compendium.pdf", data).isEmpty)
  }

  test("the declarative TitleJoin agrees with the reference walk on " +
      "real extracted geometry") {
    import org.apache.spark.sql.functions.col
    val spark = SparkFixture.spark
    import spark.implicits._
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      BinaryIngest.defaultDocsDir, "2018-nasa-compendium.pdf"))
    val pe = PdfLattice.pages(data)(2) // page 3: the TID results table
    val texts = PdfIngest.textLines(pe.texts).zipWithIndex
      .map { case (l, i) =>
        (i.toLong, l.text, (l.xMin + l.xMax) / 2.0, l.y)
      }.toDF("obj_id", "text", "x_mid", "y_bottom")
    val tables = pe.tables.zipWithIndex.map { case (t, i) =>
      (i.toLong, (t.xMin + t.xMax) / 2.0, t.yMax)
    }.toDF("table_id", "x_mid", "y_top")
    val joined = TitleJoin.nearestAbove(texts, tables)
      .orderBy(col("table_id")).collect()
    // the DataFrame operator (min_by over a range join) and the local
    // sequential walk both land on the TID summary title
    assert(joined.head.getString(1).toLowerCase.replace(" ", "")
      .contains("tidtestresults"), s"got: ${joined.head.getString(1)}")
  }

  test("q_abbrev_ingest mines the real glossaries through the Generator") {
    val rows = graft.SparkEntry.queries("q_abbrev_ingest")(
      SparkFixture.spark, SparkFixture.sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length >= 300, s"expected corpus-wide pairs, got ${rows.length}")
    // the canonical radiation glossary entries, defined independently in
    // SEVERAL files' abbreviation tables
    assert(rows.count(t => t._2 == "tid" && t._3 == "total ionizing dose") >= 5)
    assert(rows.count(t => t._2 == "dd" && t._3 == "displacement damage") >= 5)
    assert(rows.exists(t => t._2 == "cmos" &&
      t._3 == "complementary metal oxide semiconductor"))
  }

  /** The reference's committed artifact (main.db rad_table, 532 rows)
    * exported verbatim to CSV at build time — the golden against which
    * recall is measured.
    */
  private def goldenRows: Vector[Vector[String]] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/golden_rad_table.csv")),
      java.nio.charset.StandardCharsets.UTF_8)
    text.split("\n").iterator.map(_.stripSuffix("\r")).filter(_.nonEmpty)
      .drop(1).map { l =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val sb = new StringBuilder; var inQ = false; var i = 0
        while (i < l.length) {
          val c = l.charAt(i)
          if (inQ) {
            if (c == '"' && i + 1 < l.length && l.charAt(i + 1) == '"') {
              sb += '"'; i += 1
            } else if (c == '"') inQ = false
            else sb += c
          } else if (c == '"') inQ = true
          else if (c == ',') { out += sb.toString; sb.clear() }
          else sb += c
          i += 1
        }
        out += sb.toString
        out.toVector
      }.toVector
  }

  test("golden parity: q_rad_ingest recovers 344/344 of the reference's " +
      "FULL main.db (2007's JBIG2-scanned pages included)") {
    // NO exclusions, and since round 10 NO misses: every distinct
    // (file, part_number) pair of the reference's committed artifact is
    // recovered. The last residuals fell to: resolved font /Widths +
    // standard-14 AFM metrics (exact glyph advances), pen advance
    // between show ops (ISO 32000 §9.4.4), pdfminer-faithful stream-
    // order line assembly with border-artifact glyph deferral, line-
    // overlap grouping (superscripts), and dark separator BARS read as
    // centerline rules. 2005-b (scanned, CCITT G4) and 2019 (no Info
    // /Title, R4-skipped) contribute zero golden rows, faithfully.
    def norm(s: String) =
      Option(s).getOrElse("").toUpperCase.replaceAll("\\s+", " ").trim
    val golden = goldenRows
    assert(golden.size == 532, s"golden rows: ${golden.size}")
    val ours = graft.SparkEntry.queries("q_rad_ingest")(
      SparkFixture.spark, SparkFixture.sf).collect()
    val ourPairs = ours.map(r => (r.getString(11), norm(r.getString(0)))).toSet
    // distinct (file, part_number) pairs — the identity a user of the
    // artifact looks up by
    val gPairs = golden.map(r => (r.last, norm(r.head))).toSet
    val hit = gPairs.count(ourPairs.contains)
    val recall = hit.toDouble / gPairs.size
    info(f"golden-pair recall: $hit/${gPairs.size} = $recall%.3f")
    assert(recall >= 0.99, s"recall $recall under the 0.99 floor")
    assert(gPairs.forall(ourPairs.contains),
      "missed golden pairs: " + gPairs.filterNot(ourPairs.contains))
    // EXACT per-file row pins (round 10): any single-row drift in
    // either direction fails. Files above their golden count carry
    // verified genuine-device rows the reference's camelot run
    // under-detected (see the precision test below for the pair-level
    // accounting).
    val expectRows = Map(
      "2006-nasa-compendium.pdf" -> 51, "2007-nasa-compendium.pdf" -> 32,
      "2010-nasa-compendium.pdf" -> 55, "2011-nasa-compendium.pdf" -> 91,
      "2013-nasa-compendium.pdf" -> 103, "2014-nasa-compendium.pdf" -> 102,
      "2015-nasa-compendium.pdf" -> 64, "2016-nasa-compendium.pdf" -> 67,
      "2017-nasa-compendium.pdf" -> 16, "2018-nasa-compendium.pdf" -> 15)
    val oursByFile = ours.groupBy(_.getString(11)).view.mapValues(_.length)
    expectRows.foreach { case (f, exp) =>
      val n = oursByFile.getOrElse(f, 0)
      assert(n == exp, s"$f: $n rows, pinned $exp")
    }
    assert(oursByFile.keys.toSet == expectRows.keySet,
      s"unexpected contributing files: ${oursByFile.keys.toSet}")
  }

  test("golden precision: the extracted-but-not-golden pair set is " +
      "pinned exactly — over-extraction cannot drift") {
    // 55 extras, classified by hand:
    //  - GENUINE device rows the reference's pipeline dropped (its
    //    camelot run under-detected the table or its OCR cell splits
    //    failed the validity rule): all of 2006/2013/2014/2018, the
    //    AD565/AD670/LTC1419 trio of 2007, 2010's processor rows.
    //  - ARTIFACTS, kept deliberately (the reference's own rules keep
    //    them when extraction surfaces them; suppressing them would be
    //    data-dependent special-casing): 2007's second scanned header
    //    band row ("PART NUMBER") and one empty-part OCR row (""),
    //    2010's "N/A" placeholder row.
    def norm(s: String) =
      Option(s).getOrElse("").toUpperCase.replaceAll("\\s+", " ").trim
    val golden = goldenRows
    val gPairs = golden.map(r => (r.last, norm(r.head))).toSet
    val ours = graft.SparkEntry.queries("q_rad_ingest")(
      SparkFixture.spark, SparkFixture.sf).collect()
    val extras = ours.map(r => (r.getString(11), norm(r.getString(0))))
      .toSet.diff(gPairs)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted.toVector).toMap
    val expected = Map(
      "2006-nasa-compendium.pdf" -> Vector("53272", "54AC2525", "54ACTQ04",
        "54ACTQ14", "54ACTQ16244", "AD580", "ADV202", "DS26F31",
        "HCPL-520K", "HCPL-553K", "HCPL-655K", "HCPL-6731", "LM111",
        "LM117", "LM119", "LM136", "LM139", "LTZ1000A", "MAX6021",
        "MT29F2G08B", "SG1644", "STAR1000"),
      "2007-nasa-compendium.pdf" -> Vector("", "AD565", "AD670",
        "LTC1419", "PART NUMBER"),
      "2010-nasa-compendium.pdf" -> Vector("COMPLEX 45NM PROCESSOR",
        "COMPLEX 65NM PROCESSOR", "N/A"),
      "2013-nasa-compendium.pdf" -> Vector("IDD0", "IDD1", "IDD2N",
        "IDD2P", "IDD2Q", "IDD3P", "RH1078MW (FLATPACK)"),
      "2014-nasa-compendium.pdf" -> Vector("2N3811UX", "2N5153", "2N5154",
        "A3PE3000L", "ACT4468", "AD648", "ADUM3223AR7", "LM6172",
        "MAX5069", "MOS-250-2", "MT29F32G08ABAA AWP", "OP497", "SMA1031",
        "STAR1000", "VIRTEX 5QV"),
      "2018-nasa-compendium.pdf" -> Vector("ADCMP600", "ADCMP604",
        "ADF4252"))
    assert(extras.values.map(_.size).sum == 55,
      s"extra pair count: ${extras.values.map(_.size).sum}")
    expected.foreach { case (f, exp) =>
      assert(extras.getOrElse(f, Vector.empty) == exp,
        s"$f extras drifted: ${extras.getOrElse(f, Vector.empty)}")
    }
    assert(extras.keySet == expected.keySet,
      s"files with extras: ${extras.keySet}")
  }

  test("2007 (JBIG2 raster): known part rows extract end-to-end") {
    // the raster grid decoded from the symbol/text JBIG2 streams + the
    // invisible-OCR text layer produce the reference's own 2007 rows —
    // ALL 23 golden pairs since round 10, including the OCR border-
    // artifact parts "OP200  (" and "OP27A  1" that main.db keeps
    // (pdfminer exiles the stray rule-glyphs to trailing textboxes;
    // joinFrags defers them the same way)
    val rows = graft.SparkEntry.queries("q_rad_ingest")(
      SparkFixture.spark, SparkFixture.sf).collect()
      .filter(_.getString(11) == "2007-nasa-compendium.pdf")
    assert(rows.length == 32, s"2007 rows: ${rows.length}")
    def squash(s: String) = s.replaceAll("\\s+", " ").trim
    val parts = rows.map(r =>
      squash(Option(r.getString(0)).getOrElse(""))).toSet
    Seq("LT1037", "AD584", "JANS2N2222", "UC1708", "K9F4G08UOA",
      "TC58FVM7B2ATG-65", "AT22V10", "HCPL-675 1", "OP200 (",
      "OP27A 1").foreach { p =>
      assert(parts.contains(p), s"missing 2007 part $p")
    }
    val lt = rows.find(r => Option(r.getString(0)).exists(_.trim == "LT1037")).get
    assert(lt.getString(1).contains("Linear Tech"))
    // the unbordered-row rule (scans drop a lone data row's dividers):
    // AT22V10's row keeps its geometric columns instead of melting left
    val at = rows.find(r =>
      Option(r.getString(0)).exists(_.trim == "AT22V10")).get
    assert(at.getString(1).trim == "Atmel")
    // source_paper is reference-byte-exact (Title + 'b' + ModDate via
    // the bytes-repr quoting path, apostrophes stripped)
    assert(at.getString(10) == "untitledbD:20081031132548-0400")
  }

  test("q_rad_relational (staged SQL tail) agrees with q_rad_ingest " +
      "(imperative walk) row for row") {
    // two independent derivations of the same artifact: radRowsOf walks
    // tables per file imperatively; q_rad_relational re-derives the
    // R7->R8->R12->R17->R16->R21 tail in DataFrame algebra over staged
    // frames (and DuckDB hash-checks that algebra). They must agree.
    val a = graft.SparkEntry.queries("q_rad_ingest")(
      SparkFixture.spark, SparkFixture.sf)
      .collect().map(_.toSeq.map(v => Option(v).fold("")(_.toString)))
    val b = graft.SparkEntry.queries("q_rad_relational")(
      SparkFixture.spark, SparkFixture.sf)
      .collect().map(_.toSeq.map(v => Option(v).fold("")(_.toString)))
    assert(a.length == b.length, s"${a.length} vs ${b.length} rows")
    assert(a.map(_.mkString("\u0001")).toSet ==
      b.map(_.mkString("\u0001")).toSet)
  }

  test("q_rad_relational_full (titles + header map DERIVED from staged " +
      "geometry/scores) agrees with q_rad_ingest row for row") {
    // the deepest oracle boundary: R6's walk is re-derived as a
    // running-minima scan over raw line/table geometry and R15's argmax
    // over the raw score matrix — if either relational re-formulation
    // diverged from the imperative walk by even one title, rows here
    // would differ
    val a = graft.SparkEntry.queries("q_rad_ingest")(
      SparkFixture.spark, SparkFixture.sf)
      .collect().map(_.toSeq.map(v => Option(v).fold("")(_.toString)))
    val b = graft.SparkEntry.queries("q_rad_relational_full")(
      SparkFixture.spark, SparkFixture.sf)
      .collect().map(_.toSeq.map(v => Option(v).fold("")(_.toString)))
    assert(a.length == b.length, s"${a.length} vs ${b.length} rows")
    assert(a.map(_.mkString("\u0001")).toSet ==
      b.map(_.mkString("\u0001")).toSet)
  }

  test("q_abbrev_expand applies the mined glossary in context (R19->R20, " +
      "the composition main.py:45-50 intends)") {
    val rows = graft.SparkEntry.queries("q_abbrev_expand")(
      SparkFixture.spark, SparkFixture.sf).collect()
    assert(rows.length >= 500, s"full corpus expected, got ${rows.length}")
    val results = rows.map(r => Option(r.getString(4)).getOrElse(""))
    // the canonical glossary entry (mined from >= 5 files by
    // q_abbrev_ingest) applied to real result prose: 2011's "Vth
    // degrades with TID" carries the expansion
    assert(results.exists(_.toLowerCase.contains(
      "degrades with total ionizing dose")),
      "known 2011 row must carry the expansion in context")
    // whole-word replacement is exhaustive: no standalone TID token
    // survives anywhere the glossary applies
    val tid = "(?i)\\btid\\b".r
    assert(!results.exists(s => tid.findFirstIn(s).isDefined),
      "a standalone TID token survived expansion")
  }

  test("q_rad_ingest assembles the corpus-wide rad_table") {
    val q = graft.SparkEntry.queries("q_rad_ingest")(
      SparkFixture.spark, SparkFixture.sf)
    val rows = q.collect()
    assert(rows.length >= 500, s"expected the full corpus, got ${rows.length}")
    val files = rows.map(_.getString(11)).distinct.sorted
    assert(files.length >= 8, s"files contributing: ${files.toSeq}")
    assert(!files.contains("2019-nasa-compendium.pdf"), "R4 gate")
    // a known row end-to-end through Spark
    assert(rows.exists(r => r.getString(0) == "OP200" &&
      r.getString(1) == "Analog Devices"))
    // R21: no duplicate rows survive
    assert(rows.map(_.toString).distinct.length == rows.length)
  }
}
