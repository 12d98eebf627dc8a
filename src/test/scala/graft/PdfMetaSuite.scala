package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.PdfMeta

/** Planted-value pins for the PDF Info-dictionary parser: synthetic PDFs
  * built byte-by-byte in the test (the same honest-codec pattern as the
  * multimodal suite — the INPUT is synthetic, the PARSER walks the real
  * container format), plus reference-corpus values cross-checked with an
  * independent implementation.
  */
class PdfMetaSuite extends AnyFunSuite {
  import SparkFixture._

  private def b(s: String): Array[Byte] = s.getBytes(ISO_8859_1)

  /** Minimal classic-layout PDF: trailer /Info points at object 1. */
  private def classicPdf(infoBody: String): Array[Byte] = b(
    "%PDF-1.4\n" +
      s"1 0 obj\n<< $infoBody >>\nendobj\n" +
      "2 0 obj\n<< /Type /Catalog >>\nendobj\n" +
      "trailer\n<< /Size 3 /Root 2 0 R /Info 1 0 R >>\n" +
      "startxref\n0\n%%EOF\n")

  /** Object-stream-layout PDF: the Info dict (object 7) lives inside a
    * Flate-compressed /ObjStm next to a sibling object, exercising the
    * header-offset walk and the Inflater path.
    */
  private def objStmPdf(infoBody: String): Array[Byte] = {
    val obj7 = s"<< $infoBody >>"
    val obj8 = "<< /Type /Catalog >>"
    val header = s"7 0 8 ${obj7.length} "
    val payload = b(header + obj7 + obj8)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(payload)
    deflater.finish()
    val buf = new Array[Byte](payload.length * 2 + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val compressed = buf.take(n)
    val out = new java.io.ByteArrayOutputStream()
    out.write(b("%PDF-1.5\n"))
    out.write(b(s"3 0 obj\n<< /Type /ObjStm /N 2 " +
      s"/First ${header.length} /Length ${compressed.length} " +
      "/Filter /FlateDecode >>\nstream\n"))
    out.write(compressed)
    out.write(b("\nendstream\nendobj\n"))
    out.write(b("trailer\n<< /Size 9 /Root 8 0 R /Info 7 0 R >>\n%%EOF\n"))
    out.toByteArray
  }

  test("classic-layout Info dict round-trips planted Title and ModDate") {
    val pdf = classicPdf(
      """/Title (Planted \(escaped\) Title) /ModDate (D:20260813090000Z)""")
    val (t, md) = PdfMeta.titleModDate(pdf)
    assert(t.contains("Planted (escaped) Title"))
    assert(md.contains("D:20260813090000Z"))
  }

  test("object-stream Info dict is reached through the Inflater") {
    val pdf = objStmPdf(
      """/Title (Compressed Planted Title) /ModDate (D:20250101000000Z)""")
    // the planted title must NOT be readable from the raw bytes — else
    // this test would pass without the decompression path working
    assert(!new String(pdf, ISO_8859_1).contains("Compressed Planted Title"))
    val (t, md) = PdfMeta.titleModDate(pdf)
    assert(t.contains("Compressed Planted Title"))
    assert(md.contains("D:20250101000000Z"))
  }

  test("literal strings unescape the FULL 7.3.4.2 set (octal, control, " +
      "line continuation)") {
    val pdf = classicPdf(
      "/Title (Tab\\tNew\\nOct\\101\\102 Cont\\\ninued \\q) " +
        "/ModDate (D:20260101000000Z)")
    val (t, _) = PdfMeta.titleModDate(pdf)
    // \t -> TAB, \n -> LF, \101\102 -> AB, backslash-EOL swallowed,
    // unknown escape \q -> the char itself
    assert(t.contains("Tab\tNew\nOctAB Continued q"), s"got: $t")
  }

  test("UTF-16BE hex strings and missing fields decode per the spec") {
    val hexTitle = "FEFF" +
      "Café Título".map(c => f"${c.toInt}%04X").mkString
    val (t, md) = PdfMeta.titleModDate(
      classicPdf(s"/Title <$hexTitle> /Producer (x)"))
    assert(t.contains("Café Título"))
    assert(md.isEmpty, "absent ModDate must be None, not invented")
    val (t2, _) = PdfMeta.titleModDate(b("%PDF-1.4\nno trailer info\n%%EOF"))
    assert(t2.isEmpty, "a PDF without /Info must yield no fields")
  }

  test("q_pdf_meta extracts the reference corpus's real Info metadata") {
    val rows = SparkEntry.queries("q_pdf_meta")(spark, sf).collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), Option(r.getString(2))))
      .toMap
    assert(rows.size >= 12, s"expected the full PDF corpus, got ${rows.size}")
    // every file's Info dict carries a ModDate (verified with an
    // independent parser implementation over the same bytes)
    rows.foreach { case (f, (_, md)) =>
      assert(md.exists(_.startsWith("D:")), s"$f: mod_date $md")
    }
    // pinned values, one per layout: 2011 = classic uncompressed
    // object, 2013 = Flate-compressed object stream
    assert(rows("2011-nasa-compendium.pdf")._1.contains(
      "Recent Total Ionizing Dose and Displacement Damage Compendium " +
        "of Candidate Electronics for NASA Space Systems"))
    assert(rows("2011-nasa-compendium.pdf")._2.contains("D:20120125151409-05'00'"))
    assert(rows("2013-nasa-compendium.pdf")._1.contains("untitled"))
    assert(rows("2013-nasa-compendium.pdf")._2.contains("D:20120824092711-04'00'"))
    // files whose Info dict has no /Title surface None, not a guess
    assert(rows("2019-nasa-compendium.pdf")._1.isEmpty)
  }
}
