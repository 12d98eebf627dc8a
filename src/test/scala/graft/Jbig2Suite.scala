package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Decoder-level pins for the embedded JBIG2 path (ITU-T T.88 MQ coder
  * + symbol dictionary + text region), below the end-to-end ingest
  * tests: the decode of a real scanned stream is a pure function of its
  * bytes, so its geometry is pinned exactly — any MQ-coder or context
  * regression shows up as a changed pixel census long before it would
  * be visible (or silently wrong) in rad_table.
  */
class Jbig2Suite extends AnyFunSuite {

  private def jbig2StreamOf(objNum: Int): (Int, Int, Array[Byte]) = {
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"${BinaryIngest.defaultDocsDir}/2007-nasa-compendium.pdf"))
    val s = PdfMeta.latin1(data)
    val m = ("""(?:^|[^0-9])""" + objNum + """\s+0\s+obj\b""").r
      .findAllMatchIn(s).toSeq.last
    val dictEnd = s.indexOf("stream", m.end)
    val dict = s.substring(m.end, dictEnd)
    val w = """/Width (\d+)""".r.findFirstMatchIn(dict).get.group(1).toInt
    val h = """/Height (\d+)""".r.findFirstMatchIn(dict).get.group(1).toInt
    var s0 = dictEnd + "stream".length
    if (s.charAt(s0) == '\r') s0 += 2 else if (s.charAt(s0) == '\n') s0 += 1
    val se = s.indexOf("endstream", s0)
    (w, h, java.util.Arrays.copyOfRange(data, s0, se))
  }

  test("decodes the 2007 page-5 stream to the exact known pixel census") {
    val (w, h, bytes) = jbig2StreamOf(12)
    assert((w, h) == (6600, 5099))
    val bm = Jbig2.decodePage(bytes, w, h).get
    // census independently confirmed by a from-scratch prototype
    // decoder: 352,311 black pixels of 33,653,400
    val black = bm.bits.count(_ != 0)
    assert(black == 352311, s"black pixel census drifted: $black")
  }

  test("mines the known table grid from the decoded raster") {
    val (w, h, bytes) = jbig2StreamOf(12)
    val bm = Jbig2.decodePage(bytes, w, h).get
    val (hs, vs) = Jbig2.rules(bm)
    // the page's ruled grid: a full-width horizontal rule near row 413
    // and a tall vertical near col 415 (known from the raster)
    assert(hs.exists(r => r._3 >= 410 && r._3 <= 418 && r._2 - r._1 > 5000),
      s"missing top rule; horizontals: ${hs.take(8)}")
    assert(vs.exists(v => v._3 >= 411 && v._3 <= 419 && v._2 - v._1 > 600),
      s"missing left rule; verticals: ${vs.take(8)}")
    // no run-away segment count (merge collapses thickness)
    assert(hs.length + vs.length < 400, s"${hs.length + vs.length} segments")
  }

  test("fails closed on out-of-profile or corrupt input") {
    // garbage bytes
    assert(Jbig2.decodePage(Array.fill[Byte](64)(0x41), 100, 100).isEmpty)
    // truncated real stream (cut mid-symbol-dictionary)
    val (w, h, bytes) = jbig2StreamOf(12)
    assert(Jbig2.decodePage(bytes.take(200), w, h).isEmpty)
    // wrong declared dimensions
    assert(Jbig2.decodePage(bytes, w + 1, h).isEmpty)
    // empty input
    assert(Jbig2.decodePage(Array.emptyByteArray, 1, 1).isEmpty)
  }
}
