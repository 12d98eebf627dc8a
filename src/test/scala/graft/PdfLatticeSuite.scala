package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.PdfLattice

/** Planted-value pins for the vector lattice table extractor (R5): a
  * synthetic ruled table built byte-by-byte (the honest-codec pattern of
  * PdfMetaSuite — synthetic INPUT, real container/content-stream
  * parsing), the same table under a translated CTM, and real cells of
  * the reference corpus cross-checked with an independent parser
  * implementation.
  */
class PdfLatticeSuite extends AnyFunSuite {
  import SparkFixture._

  private def b(s: String): Array[Byte] = s.getBytes(ISO_8859_1)

  /** Classic one-page PDF whose content stream is `content` (stored). */
  private def onePagePdf(content: String): Array[Byte] = b(
    "%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R " +
      "/MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")

  /** A 2x2 ruled grid (cols 100-200-300, rows 500-550-600 in pdf space,
    * so A1/B1 is the TOP row) drawn the way word processors do: thin
    * filled rectangles for every rule.
    */
  private val gridContent =
    // horizontal rules at y = 600, 550, 500
    "100 599.5 200 1 re f\n" +
      "100 549.5 200 1 re f\n" +
      "100 499.5 200 1 re f\n" +
      // vertical rules at x = 100, 200, 300
      "99.5 499.5 1 101 re f\n" +
      "199.5 499.5 1 101 re f\n" +
      "299.5 499.5 1 101 re f\n" +
      // one text op per cell
      "BT /F1 10 Tf 110 575 Td (A1) Tj ET\n" +
      "BT /F1 10 Tf 210 575 Td (B1) Tj ET\n" +
      "BT /F1 10 Tf 110 525 Td (A2) Tj ET\n" +
      "BT /F1 10 Tf 210 525 Td (B2) Tj ET"

  test("planted 2x2 ruled grid extracts exactly, top row first") {
    val tables = PdfLattice.tablesOf(onePagePdf(gridContent))
    assert(tables.map(t => (t._1, t._2)) == Seq((1, 0)),
      s"one table on page 1, got ${tables.map(t => (t._1, t._2))}")
    assert(tables.head._3 ==
      Vector(Vector("A1", "B1"), Vector("A2", "B2")))
  }

  test("the same grid under a translated+scaled CTM lands identically") {
    // wrap in q .. cm .. Q: half scale plus a (40, 30) shift — the
    // machine must place both rules and text through the same CTM
    val moved = "q\n0.5 0 0 0.5 40 30 cm\n" + gridContent + "\nQ"
    val tables = PdfLattice.tablesOf(onePagePdf(moved))
    assert(tables.head._3 ==
      Vector(Vector("A1", "B1"), Vector("A2", "B2")))
  }

  test("TJ arrays, kerning, multi-fragment cells and empty cells behave") {
    val content =
      "100 599.5 200 1 re f\n100 549.5 200 1 re f\n100 499.5 200 1 re f\n" +
        "99.5 499.5 1 101 re f\n199.5 499.5 1 101 re f\n299.5 499.5 1 101 re f\n" +
        // TJ with kerning numbers; two fragments in one cell — a
        // WRAPPED cell keeps its newline, like a rendered cell (the
        // header mapper strips it, the abbreviation parser splits on
        // it); B2 left EMPTY
        "BT /F1 10 Tf 110 580 Td [(Pa)-12.2(rt)] TJ ET\n" +
        "BT /F1 10 Tf 110 565 Td (Number) Tj ET\n" +
        "BT /F1 10 Tf 210 575 Td (Mfr) Tj ET\n" +
        "BT /F1 10 Tf 110 525 Td (2N2222) Tj ET"
    val tables = PdfLattice.tablesOf(onePagePdf(content))
    assert(tables.head._3 ==
      Vector(Vector("Part\nNumber", "Mfr"), Vector("2N2222", "")))
  }

  test("copy_text=['v']: a vertically merged cell fills down, exactly " +
      "like camelot's spanning-text smoothing") {
    // 2-col x 4-row grid; the LEFT column's three data cells are merged
    // (the horizontal rules at y=600 and y=550 exist only over the
    // right column), text only in the first merged band — camelot with
    // copy_text=['v'] (which the reference always passes, tables.py:54)
    // cascades 'SPAN' into both continuation cells
    val content =
      "100 699.5 200 1 re f\n" + // y=700, full width
        "100 649.5 200 1 re f\n" + // y=650, full width
        "200 599.5 100 1 re f\n" + // y=600, RIGHT column only
        "200 549.5 100 1 re f\n" + // y=550, RIGHT column only
        "100 499.5 200 1 re f\n" + // y=500, full width
        "99.5 499.5 1 201 re f\n" + // x=100
        "199.5 499.5 1 201 re f\n" + // x=200
        "299.5 499.5 1 201 re f\n" + // x=300
        "BT /F1 10 Tf 110 675 Td (Hdr) Tj ET\n" +
        "BT /F1 10 Tf 210 675 Td (Val) Tj ET\n" +
        "BT /F1 10 Tf 110 625 Td (SPAN) Tj ET\n" +
        "BT /F1 10 Tf 210 625 Td (r1) Tj ET\n" +
        "BT /F1 10 Tf 210 575 Td (r2) Tj ET\n" +
        "BT /F1 10 Tf 210 525 Td (r3) Tj ET"
    val tables = PdfLattice.tablesOf(onePagePdf(content))
    assert(tables.head._3 == Vector(
      Vector("Hdr", "Val"),
      Vector("SPAN", "r1"),
      Vector("SPAN", "r2"),
      Vector("SPAN", "r3")))
  }

  test("header-band shading: a full-width shaded band's edge is a row " +
      "boundary; partial-width shading never splits anything") {
    // Grid stroked only at the outer frame (y=500/700, x=100/200/300);
    // the header/data boundary at y=650 exists ONLY as the bottom edge
    // of a filled header-band rect — the way spreadsheet exporters
    // shade header rows. A raster line detector (camelot's) sees that
    // edge; the vector machine must admit it as a boundary without
    // letting the band's side edges create phantom columns.
    val shaded =
      "100 699.5 200 1 re f\n" + // top rule y=700
        "100 499.5 200 1 re f\n" + // bottom rule y=500
        "99.5 499.5 1 201 re f\n" + // x=100
        "199.5 499.5 1 201 re f\n" + // x=200
        "299.5 499.5 1 201 re f\n" + // x=300
        "100 650 200 50 re f\n" + // header-band SHADING, y 650..700
        "BT /F1 10 Tf 110 675 Td (Hdr) Tj ET\n" +
        "BT /F1 10 Tf 210 675 Td (Val) Tj ET\n" +
        "BT /F1 10 Tf 110 575 Td (a) Tj ET\n" +
        "BT /F1 10 Tf 210 575 Td (b) Tj ET"
    val tables = PdfLattice.tablesOf(onePagePdf(shaded))
    assert(tables.head._3 == Vector(
      Vector("Hdr", "Val"),
      Vector("a", "b")))

    // partial-width shading (left column only): its edges are
    // edge-presence evidence at most, never a new boundary — the
    // table stays one row, cells keep their wrapped text
    val partial =
      "100 699.5 200 1 re f\n" +
        "100 499.5 200 1 re f\n" +
        "99.5 499.5 1 201 re f\n" +
        "199.5 499.5 1 201 re f\n" +
        "299.5 499.5 1 201 re f\n" +
        "100 650 100 50 re f\n" + // LEFT column band only
        "BT /F1 10 Tf 110 675 Td (Hdr) Tj ET\n" +
        "BT /F1 10 Tf 110 575 Td (a) Tj ET"
    val pTables = PdfLattice.tablesOf(onePagePdf(partial))
    assert(pTables.head._3.length == 1,
      s"partial shading must not split rows: ${pTables.head._3}")
  }

  test("a DARK filled separator bar is a centerline rule; the same bar " +
      "painted light is shading, not a rule") {
    // 2-row frame whose middle boundary is a 3pt-tall PARTIAL-width
    // (half-table) filled bar, the per-column header-separator idiom:
    // dark -> camelot's raster morphology reduces the bar to its
    // centerline, a real rule, so a row boundary appears; the same bar
    // painted light gray is partial shading — edge evidence only, no
    // boundary. (FULL-width light bands DO make a boundary — the
    // header-band rule pinned in the shading test above.)
    def frame(setColor: String) =
      "100 599.5 200 1 re f\n" +
        "100 499.5 200 1 re f\n" +
        "99.5 499.5 1 101 re f\n" +
        "299.5 499.5 1 101 re f\n" +
        s"$setColor 100 550 100 3 re f\n" + // half-width 3pt filled bar
        "0 g\n" +
        "BT /F1 10 Tf 110 575 Td (TOP) Tj ET\n" +
        "BT /F1 10 Tf 110 520 Td (BOT) Tj ET"
    val dark = PdfLattice.tablesOf(onePagePdf(frame("0 g")))
    assert(dark.nonEmpty)
    assert(dark.head._3 == Vector(Vector("TOP"), Vector("BOT")),
      s"dark bar must split rows: ${dark.head._3}")
    val light = PdfLattice.tablesOf(onePagePdf(frame("0.85 g")))
    assert(light.nonEmpty)
    assert(light.head._3 == Vector(Vector("TOP\nBOT")),
      s"partial light band must NOT split rows: ${light.head._3}")
  }

  test("q/Q restores the TEXT state (font size drives advance estimates)") {
    // inside q..Q a huge Tf is selected; after Q the outer 10pt state
    // must be back — otherwise the 100pt estimated advances push the
    // second cell's text ord-join and cell-center assignment off
    val content =
      "100 599.5 200 1 re f\n" +
        "100 549.5 200 1 re f\n" +
        "99.5 549.5 1 51 re f\n" +
        "199.5 549.5 1 51 re f\n" +
        "299.5 549.5 1 51 re f\n" +
        "q BT /F1 100 Tf 400 700 Td (HUGE) Tj ET Q\n" +
        "BT /F1 10 Tf 110 575 Td (AB) Tj (CD) Tj ET\n" +
        "BT /F1 10 Tf 210 575 Td (X1) Tj ET"
    val tables = PdfLattice.tablesOf(onePagePdf(content))
    assert(tables.nonEmpty)
    // with the leak, (CD) lands ~70pt right of (AB) (100pt-sized
    // estimates) and falls into the SECOND cell; restored, the two runs
    // abut inside cell one
    assert(tables.head._3 == Vector(Vector("ABCD", "X1")),
      s"got ${tables.head._3}")
  }

  test("no rules -> no tables; malformed bytes -> no tables, no throw") {
    val textOnly = "BT /F1 10 Tf 110 575 Td (just text) Tj ET"
    assert(PdfLattice.tablesOf(onePagePdf(textOnly)).isEmpty)
    assert(PdfLattice.tablesOf(b("%PDF-1.4 garbage")).isEmpty)
    assert(PdfLattice.tablesOf(Array.emptyByteArray).isEmpty)
  }

  test("reference corpus: 2015 compendium tables pin exactly") {
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      graft.ingest.BinaryIngest.defaultDocsDir, "2015-nasa-compendium.pdf"))
    val tables = PdfLattice.tablesOf(data)
    // values verified against an independent parser over the same bytes
    // (page numbering follows the /Kids tree: the title page is object
    // 1825, PREPENDED by an incremental update — a byte-order object
    // scan would misnumber every page, which is why the tree walk wins)
    val p1t0 = tables.find(t => t._1 == 1 && t._2 == 0).get._3
    assert(p1t0.head == Vector("Facility", "Incident\nProton Energy, (MeV)"))
    val p2t0 = tables.find(t => t._1 == 2 && t._2 == 0).get._3
    assert(p2t0 == Vector(
      Vector("Abbreviation", "Principal Investigator (PI)"),
      Vector("DC", "Dakai Chen"),
      Vector("RG", "Robert Gigliuto"),
      Vector("RL", "Raymond Ladbury"),
      Vector("JML", "Jean-Marie Lauenstein"),
      Vector("DV", "Daniel Violette")))
    // the R5 payload: the TID results table headers + a real part row
    val p4t0 = tables.find(t => t._1 == 4 && t._2 == 0).get._3
    assert(p4t0.head.take(5) == Vector("Part Number", "Manufacturer",
      "REAG ID;\nLDC", "Device\nFunction", "Technology"))
    assert(p4t0(1).take(4) == Vector("2N6351", "Microsemi", "0714",
      "Transistor"))
  }

  test("2005-b (CCITT G4): every fax image decodes; pages parse; zero " +
      "rad rows, faithfully") {
    // the last scanned corpus file: pure T.6 (K=-1) images. The ITU-T
    // T.6/T.4 decoder must decode EVERY page image at full size — the
    // ink census of the first image is pinned (a single wrong MH code
    // or 2-D mode would cascade into a structurally failed or wildly
    // different decode). The reference's camelot run extracted zero
    // usable rows from this file (main.db has none), and the noisy
    // skewed scan grid must keep failing the density/title/type gates
    // here too — parity, not capability, is the contract.
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      graft.ingest.BinaryIngest.defaultDocsDir, "2005-nasa-compendium-b.pdf"))
    val s = new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
    val objs = """(\d+)\s+0\s+obj\b""".r.findAllMatchIn(s).flatMap { m =>
      val st = s.indexOf("stream", m.end)
      val end = s.indexOf("endobj", m.end)
      if (st >= 0 && (end < 0 || st < end) &&
        s.substring(m.end, st).contains("/CCITTFaxDecode"))
        Some(m.group(1).toInt)
      else None
    }.toSeq
    assert(objs.size >= 7, s"expected the scanned page images, got $objs")
    val first = PdfLattice.ccittBitmapDebug(data, s, objs.head)
    assert(first.isDefined, "first G4 image failed to decode")
    val bm = first.get
    assert((bm.w, bm.h) == (2568, 3289))
    assert(bm.bits.count(_ != 0) == 597358, "ink census drifted")
    objs.tail.foreach { n =>
      assert(PdfLattice.ccittBitmapDebug(data, s, n).isDefined,
        s"G4 image obj $n failed to decode")
    }
    // pages carry the OCR text layer and the raster grids parse
    val pages = PdfLattice.pages(data)
    assert(pages.length >= 7)
    assert(pages.map(_.texts.length).sum > 500, "OCR text layer missing")
    assert(pages.map(_.tables.length).sum >= 5, "raster grids missing")
    // ...but none of it becomes rad_table rows (reference parity)
    assert(graft.ingest.PdfIngest.radRowsOf(
      "2005-nasa-compendium-b.pdf", data).isEmpty)
  }

  test("parse cache evicts cold entries at the cap, never the hot one") {
    // distinct tiny "documents" (content varies the hash; extraction of
    // garbage is the cached empty result — cheap by design)
    def doc(i: Int): Array[Byte] = b(s"%PDF-1.4 cache-fixture $i")
    val hot = doc(-1)
    PdfLattice.pages(hot)
    (0 until PdfLattice.ParseCacheCap).foreach(i => PdfLattice.pages(doc(i)))
    // touch the hot entry AFTER the fillers, then push past the cap:
    // eviction must drop cold fillers, not the just-reused entry
    PdfLattice.pages(hot)
    PdfLattice.pages(doc(PdfLattice.ParseCacheCap + 1))
    assert(PdfLattice.parseCacheHas(hot),
      "LRU eviction dropped the most recently used entry")
  }

  test("q_pdf_tables emits a deterministic non-trivial cell frame") {
    val q = SparkEntry.queries("q_pdf_tables")(spark, sf)
    val rows = q.collect()
    assert(rows.length > 500, s"expected corpus-wide cells, got ${rows.length}")
    // multiple files contribute
    assert(rows.map(_.getString(0)).distinct.length >= 3)
    val again = SparkEntry.queries("q_pdf_tables")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
