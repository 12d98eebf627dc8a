package graft.ingest

import scala.util.Try

/** ITU-T T.6 (CCITT Group 4, pure 2-D MMR) decoder for the
  * /CCITTFaxDecode (K < 0) image streams of scanned PDFs — the last
  * raster codec the reference corpus needs (2005-b; its sibling 2007 is
  * JBIG2, see [[Jbig2]]). Like the JBIG2 decoder this is written from
  * the PUBLIC spec: the 2-D vertical/horizontal/pass modes of T.6 §4
  * with the one-dimensional run-length alphabet of T.4 §4.1 (the
  * standard terminating + make-up Modified Huffman tables, transcribed
  * below). Reference analog: camelot rasterized these pages through
  * ghostscript (tables.py:54); here the codec feeds the same
  * [[Jbig2.rules]] line miner instead.
  *
  * Fail-closed: any structural inconsistency (run overshoot, unknown
  * code, row misalignment) aborts the whole decode with None —
  * extraction then simply sees no raster rules, never garbage ones.
  */
object CcittG4 {

  // ---------------------------------------------------- T.4 MH tables

  /** "run code" rows; code written MSB-first as 0/1 text, exactly as
    * printed in the public T.4 tables (terminating 0-63, make-up
    * 64-1728, and the extended make-ups 1792-2560 shared by both
    * colors).
    */
  private val WhiteCodes =
    """0 00110101  1 000111    2 0111      3 1000      4 1011
       5 1100      6 1110      7 1111      8 10011     9 10100
       10 00111    11 01000    12 001000   13 000011   14 110100
       15 110101   16 101010   17 101011   18 0100111  19 0001100
       20 0001000  21 0010111  22 0000011  23 0000100  24 0101000
       25 0101011  26 0010011  27 0100100  28 0011000  29 00000010
       30 00000011 31 00011010 32 00011011 33 00010010 34 00010011
       35 00010100 36 00010101 37 00010110 38 00010111 39 00101000
       40 00101001 41 00101010 42 00101011 43 00101100 44 00101101
       45 00000100 46 00000101 47 00001010 48 00001011 49 01010010
       50 01010011 51 01010100 52 01010101 53 00100100 54 00100101
       55 01011000 56 01011001 57 01011010 58 01011011 59 01001010
       60 01001011 61 00110010 62 00110011 63 00110100
       64 11011     128 10010     192 010111   256 0110111
       320 00110110 384 00110111  448 01100100 512 01100101
       576 01101000 640 01100111  704 011001100 768 011001101
       832 011010010 896 011010011 960 011010100 1024 011010101
       1088 011010110 1152 011010111 1216 011011000 1280 011011001
       1344 011011010 1408 011011011 1472 010011000 1536 010011001
       1600 010011010 1664 011000   1728 010011011"""

  private val BlackCodes =
    """0 0000110111  1 010         2 11          3 10
       4 011         5 0011        6 0010        7 00011
       8 000101      9 000100      10 0000100    11 0000101
       12 0000111    13 00000100   14 00000111   15 000011000
       16 0000010111 17 0000011000 18 0000001000 19 00001100111
       20 00001101000 21 00001101100 22 00000110111 23 00000101000
       24 00000010111 25 00000011000 26 000011001010 27 000011001011
       28 000011001100 29 000011001101 30 000001101000 31 000001101001
       32 000001101010 33 000001101011 34 000011010010 35 000011010011
       36 000011010100 37 000011010101 38 000011010110 39 000011010111
       40 000001101100 41 000001101101 42 000011011010 43 000011011011
       44 000001010100 45 000001010101 46 000001010110 47 000001010111
       48 000001100100 49 000001100101 50 000001010010 51 000001010011
       52 000000100100 53 000000110111 54 000000111000 55 000000100111
       56 000000101000 57 000001011000 58 000001011001 59 000000101011
       60 000000101100 61 000001011010 62 000001100110 63 000001100111
       64 0000001111   128 000011001000 192 000011001001
       256 000001011011 320 000000110011 384 000000110100
       448 000000110101 512 0000001101100 576 0000001101101
       640 0000001001010 704 0000001001011 768 0000001001100
       832 0000001001101 896 0000001110010 960 0000001110011
       1024 0000001110100 1088 0000001110101 1152 0000001110110
       1216 0000001110111 1280 0000001010010 1344 0000001010011
       1408 0000001010100 1472 0000001010101 1536 0000001011010
       1600 0000001011011 1664 0000001100100 1728 0000001100101"""

  private val ExtCodes =
    """1792 00000001000 1856 00000001100 1920 00000001101
       1984 000000010010 2048 000000010011 2112 000000010100
       2176 000000010101 2240 000000010110 2304 000000010111
       2368 000000011100 2432 000000011101 2496 000000011110
       2560 000000011111"""

  /** (length << 16 | bits) -> run length. */
  private def buildTable(specs: String*): Map[Int, Int] =
    specs.flatMap { spec =>
      val toks = spec.split("\\s+").filter(_.nonEmpty)
      toks.grouped(2).map { case Array(run, code) =>
        val bits = Integer.parseInt(code, 2)
        ((code.length << 16) | bits) -> run.toInt
      }
    }.toMap

  private val WhiteTable = buildTable(WhiteCodes, ExtCodes)
  private val BlackTable = buildTable(BlackCodes, ExtCodes)

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0 // bit position
    def eof: Boolean = pos >= data.length * 8
    def bit(): Int = {
      require(!eof, "bit past end")
      val b = (data(pos >>> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    /** Peek up to n bits without consuming (zero-padded past end). */
    def peek(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val p = pos + i
        val b =
          if (p < data.length * 8) (data(p >>> 3) >> (7 - (p & 7))) & 1
          else 0
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = pos += n
  }

  /** One MH run of the given color: zero or more make-up codes
    * (>= 64) then a terminating code (< 64), summed.
    */
  private def readRun(r: BitReader, white: Boolean): Int = {
    val table = if (white) WhiteTable else BlackTable
    var total = 0
    var terminated = false
    var guard = 0
    while (!terminated) {
      require(guard < 64, "runaway make-up chain")
      guard += 1
      var len = 0; var bits = 0; var run = -1
      while (run < 0) {
        require(len < 14, s"unknown ${if (white) "white" else "black"} code")
        bits = (bits << 1) | r.bit()
        len += 1
        run = table.getOrElse((len << 16) | bits, -1)
      }
      total += run
      // terminating codes are 0-63; make-ups (all >= 64) keep the run open
      terminated = run < 64
    }
    total
  }

  /** Decode a K<0 (pure T.6) stream into a bitmap with 1 = BLACK ink.
    * Sample-value conventions (/BlackIs1, /Decode) are irrelevant: the
    * run-length structure itself says which runs are ink. None on any
    * error.
    */
  def decode(data: Array[Byte], cols: Int,
      rows: Int): Option[Jbig2.Bitmap] = Try {
    require(cols > 0 && rows > 0 && cols.toLong * rows < (1L << 28),
      s"implausible ${cols}x$rows")
    val r = new BitReader(data)
    val bm = new Jbig2.Bitmap(cols, rows)
    // changing elements of the reference (previous) row: positions of
    // color flips, alternating white->black, black->white, terminated
    // by two sentinels at cols. First reference row: all white.
    var ref = Array(cols, cols)
    var y = 0
    while (y < rows) {
      val cur = new scala.collection.mutable.ArrayBuffer[Int](16)
      var a0 = -1
      var white = true
      while (a0 < cols) {
        // b1: first ref transition > a0 with the color opposite to the
        // current — transitions alternate starting white->black, so
        // parity selects color
        var bi = 0
        while (bi < ref.length && ref(bi) <= (if (a0 < 0) -1 else a0)) bi += 1
        if (((bi & 1) == 0) != white) bi += 1
        val b1 = if (bi < ref.length) ref(bi) else cols
        val b2 = if (bi + 1 < ref.length) ref(bi + 1) else cols
        // mode code
        if (r.peek(1) == 1) { // V0
          r.skip(1)
          require(b1 > a0, s"V0 not advancing at row $y")
          cur += b1
          a0 = b1
          white = !white
        } else if (r.peek(3) == 1) { // 001 horizontal
          r.skip(3)
          val s = math.max(a0, 0)
          val r1 = readRun(r, white)
          val r2 = readRun(r, !white)
          require(s + r1 + r2 <= cols && r1 + r2 > 0,
            s"H overrun/stall at row $y")
          cur += s + r1
          cur += s + r1 + r2
          a0 = s + r1 + r2
        } else if (r.peek(4) == 1) { // 0001 pass
          r.skip(4)
          require(b2 <= cols && b2 > a0, s"pass not advancing at row $y")
          a0 = b2
        } else if (r.peek(3) == 2) { // 010 VL1
          r.skip(3); val a1 = b1 - 1
          require(a1 > a0 && a1 >= 0 && a1 <= cols, s"VL1 out of range row $y")
          cur += a1; a0 = a1; white = !white
        } else if (r.peek(3) == 3) { // 011 VR1
          r.skip(3); val a1 = b1 + 1
          require(a1 > a0 && a1 <= cols, s"VR1 out of range row $y")
          cur += a1; a0 = a1; white = !white
        } else if (r.peek(6) == 2) { // 000010 VL2
          r.skip(6); val a1 = b1 - 2
          require(a1 > a0 && a1 >= 0 && a1 <= cols, s"VL2 out of range row $y")
          cur += a1; a0 = a1; white = !white
        } else if (r.peek(6) == 3) { // 000011 VR2
          r.skip(6); val a1 = b1 + 2
          require(a1 > a0 && a1 <= cols, s"VR2 out of range row $y")
          cur += a1; a0 = a1; white = !white
        } else if (r.peek(7) == 2) { // 0000010 VL3
          r.skip(7); val a1 = b1 - 3
          require(a1 > a0 && a1 >= 0 && a1 <= cols, s"VL3 out of range row $y")
          cur += a1; a0 = a1; white = !white
        } else if (r.peek(7) == 3) { // 0000011 VR3
          r.skip(7); val a1 = b1 + 3
          require(a1 > a0 && a1 <= cols, s"VR3 out of range row $y")
          cur += a1; a0 = a1; white = !white
        } else if (r.peek(24) == 0x001001) { // EOFB
          require(false, s"EOFB inside image at row $y")
        } else {
          require(false, s"unknown mode code at row $y")
        }
      }
      // materialize the row: transitions alternate to-black/to-white
      require(cur.forall(p => p >= 0 && p <= cols), s"bad transition row $y")
      var i = 0
      val base = y * cols
      while (i + 1 <= cur.length) {
        val from = cur(i)
        val until = if (i + 1 < cur.length) cur(i + 1) else cols
        if ((i & 1) == 0) { // to-black transition starts ink
          var x = from
          while (x < until) { bm.bits(base + x) = 1; x += 1 }
        }
        i += 2
      }
      // sentinel-terminate for the next row's b-search
      cur += cols; cur += cols
      ref = cur.toArray
      y += 1
    }
    // structural black is 1 in `bm`. BlackIs1=false means the SAMPLE
    // for black is 0, and a /Decode [1 0] flips it again — but the
    // run-length structure already told us which pixels are ink, so
    // `bm` is polarity-correct regardless of the sample conventions.
    bm
  }.toOption
}
