package graft.ingest

import scala.collection.mutable.ArrayBuffer
import scala.util.Try

/** Embedded JBIG2 decoder (public ITU-T T.88 spec) for the profile the
  * 2007 scanned compendium actually uses — and the one essentially every
  * scanned-PDF JBIG2 encoder emits for text pages: arithmetic coding
  * only (SDHUFF=0/SBHUFF=0 — no Huffman tables), symbol dictionary with
  * REFAGG=0 (every symbol bitmap is a plain generic-region decode,
  * template 0) and an immediate text region with REFINE=0, TRANSPOSED=0,
  * REFCORNER=TOPLEFT, one-row strips. Everything outside that profile
  * FAILS CLOSED (None), never garbage: generic/halftone/refinement
  * regions, Huffman variants, unknown-length segments.
  *
  * Spec map: MQ arithmetic decoder per T.88 Annex E (INITDEC/BYTEIN/
  * DECODE with the 47-state Qe table), IAx integer decoding per Annex A,
  * IAID per A.3, generic region template 0 per 6.2.5.7 (context is the
  * 16 template pixels — 12 fixed + 4 adaptive — read in raster order,
  * MSB first), symbol dictionary per 6.5.5 (height-class deltas IADH,
  * per-symbol width deltas IADW, run-length export flags IAEX), text
  * region per 6.4.5 (strip T via IADT, first-S via IAFS, delta-S via
  * IADS with OOB strip terminator, symbol IDs via IAID).
  *
  * Why it exists: the reference's camelot run rasterized these pages
  * through ghostscript and mined their printed table grid; this
  * container has no renderer, but the grid RULES live in the JBIG2
  * raster and the cell text lives in the invisible-OCR text layer the
  * lattice text machine already reads — decoding the raster closes the
  * last 23 golden rows (reference main.db, 2007 file).
  */
private[graft] object Jbig2 {

  // ------------------------------------------------------------ MQ coder
  // T.88 Table E.1: (Qe, NMPS, NLPS, SWITCH)
  private val QeTab: Array[Int] = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val NmpsTab: Array[Int] = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val NlpsTab: Array[Int] = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val SwitchTab: Array[Int] = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** One decoder over one segment's arithmetic payload. Context state
    * lives in caller-owned byte arrays: value = (stateIndex << 1) | MPS.
    */
  private final class MQ(data: Array[Byte]) {
    private var bp = 0
    private var c: Long = 0L
    private var ct = 0
    private var a = 0
    private def byteAt(i: Int): Int =
      if (i < data.length) data(i) & 0xff else 0xff

    // INITDEC (E.3.5)
    c = byteAt(0).toLong << 16
    bytein()
    c = (c << 7) & 0xFFFFFFFFL
    ct -= 7
    a = 0x8000

    // BYTEIN (E.3.4) with 0xFF stuffing
    private def bytein(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00L; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
      c &= 0xFFFFFFFFL
    }

    // DECODE (E.3.2) + MPS/LPS exchange + RENORMD
    def decode(cx: Array[Byte], i: Int): Int = {
      val st = cx(i) & 0xff
      val icx = st >> 1
      var mps = st & 1
      val qe = QeTab(icx)
      a -= qe
      var d = 0
      if (((c >> 16) & 0xffff) < qe) {
        if (a < qe) { d = mps; cx(i) = ((NmpsTab(icx) << 1) | mps).toByte }
        else {
          d = 1 - mps
          if (SwitchTab(icx) == 1) mps = 1 - mps
          cx(i) = ((NlpsTab(icx) << 1) | mps).toByte
        }
        a = qe
      } else {
        c = (c - (qe.toLong << 16)) & 0xFFFFFFFFL
        if ((a & 0x8000) != 0) return mps
        if (a < qe) {
          d = 1 - mps
          if (SwitchTab(icx) == 1) mps = 1 - mps
          cx(i) = ((NlpsTab(icx) << 1) | mps).toByte
        } else { d = mps; cx(i) = ((NmpsTab(icx) << 1) | mps).toByte }
      }
      // RENORMD
      while ({
        if (ct == 0) bytein()
        a = (a << 1) & 0xffff
        c = (c << 1) & 0xFFFFFFFFL
        ct -= 1
        (a & 0x8000) == 0
      }) ()
      d
    }
  }

  private val OOB = Int.MinValue

  /** Arithmetic integer decoding, T.88 Annex A: a 512-context tree. */
  private def decodeInt(mq: MQ, cx: Array[Byte]): Int = {
    var prev = 1
    def bit(): Int = {
      val d = mq.decode(cx, prev)
      prev = if (prev < 256) (prev << 1) | d
             else ((((prev << 1) | d) & 511) | 256)
      d
    }
    def bits(n: Int): Int = {
      var v = 0; var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    val s = bit()
    val v =
      if (bit() == 0) bits(2)
      else if (bit() == 0) bits(4) + 4
      else if (bit() == 0) bits(6) + 20
      else if (bit() == 0) bits(8) + 84
      else if (bit() == 0) bits(12) + 340
      else bits(32) + 4436
    if (s == 1 && v == 0) OOB
    else if (s == 1) -v
    else v
  }

  /** Symbol-ID decoding, T.88 A.3: a codelen-level binary tree. */
  private def decodeIaid(mq: MQ, cx: Array[Byte], codelen: Int): Int = {
    var prev = 1
    var k = 0
    while (k < codelen) { prev = (prev << 1) | mq.decode(cx, prev); k += 1 }
    prev - (1 << codelen)
  }

  private[graft] final class Bitmap(val w: Int, val h: Int) {
    val bits = new Array[Byte](w * h)
    def get(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0 || y >= h) 0 else bits(y * w + x)
  }

  /** Generic region decoding, template 0, TPGDON off (6.2.5.7): the
    * context is the 16 template pixels (12 fixed + the 4 adaptive
    * pixels) read in raster order, MSB first — with nominal ATs this is
    * exactly the spec's figure-4 layout.
    */
  private def decodeGenericT0(mq: MQ, gb: Array[Byte], w: Int, h: Int,
      at: Array[(Int, Int)]): Bitmap = {
    val tmpl = (Array((-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1),
      (0, -1), (1, -1), (2, -1), (-4, 0), (-3, 0), (-2, 0), (-1, 0)) ++ at)
      .sortBy(p => (p._2, p._1))
    val dxs = tmpl.map(_._1)
    val dys = tmpl.map(_._2)
    val bm = new Bitmap(w, h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var cxv = 0
        var k = 0
        while (k < 16) {
          cxv = (cxv << 1) | bm.get(x + dxs(k), y + dys(k))
          k += 1
        }
        bm.bits(y * w + x) = mq.decode(gb, cxv).toByte
        x += 1
      }
      y += 1
    }
    bm
  }

  // --------------------------------------------------- segment structure

  private final case class Segment(num: Int, stype: Int, payload: Array[Byte])

  /** Embedded-organization segment headers (7.2): number, flags,
    * referred-to counts, page association, data length.
    */
  private def segments(buf: Array[Byte]): Seq[Segment] = {
    def u32(i: Int): Long =
      ((buf(i) & 0xffL) << 24) | ((buf(i + 1) & 0xffL) << 16) |
        ((buf(i + 2) & 0xffL) << 8) | (buf(i + 3) & 0xffL)
    val out = ArrayBuffer.empty[Segment]
    var i = 0
    while (i < buf.length - 11) {
      val segnum = u32(i); i += 4
      val flags = buf(i) & 0xff; i += 1
      val stype = flags & 0x3f
      val pa4 = (flags >> 6) & 1
      val rts = buf(i) & 0xff
      var cnt = (rts >> 5) & 7
      if (cnt == 7) {
        cnt = (u32(i) & 0x1fffffffL).toInt
        i += 4 + (cnt + 8) / 8
      } else i += 1
      val sz = if (segnum <= 256) 1 else if (segnum <= 65536) 2 else 4
      i += cnt * sz
      i += (if (pa4 == 1) 4 else 1)
      val dl = u32(i); i += 4
      require(dl != 0xffffffffL, "unknown-length segment unsupported")
      require(i + dl <= buf.length, "segment overruns stream")
      out += Segment(segnum.toInt, stype, buf.slice(i, i + dl.toInt))
      i += dl.toInt
    }
    out.toSeq
  }

  // ------------------------------------------------- symbol dictionary

  /** 6.5.5, SDHUFF=0 / REFAGG=0 / template 0 only. */
  private def decodeSymbolDict(pl: Array[Byte]): IndexedSeq[Bitmap] = {
    def u16(i: Int) = ((pl(i) & 0xff) << 8) | (pl(i + 1) & 0xff)
    def u32(i: Int) =
      ((pl(i) & 0xff) << 24) | ((pl(i + 1) & 0xff) << 16) |
        ((pl(i + 2) & 0xff) << 8) | (pl(i + 3) & 0xff)
    val fl = u16(0)
    require((fl & 1) == 0, "SDHUFF unsupported")
    require(((fl >> 1) & 1) == 0, "REFAGG unsupported")
    require(((fl >> 10) & 3) == 0, "SDTEMPLATE != 0 unsupported")
    require(((fl >> 12) & 1) == 0, "SDRTEMPLATE unsupported")
    require((fl & 0x0300) == 0, "bitmap coding context retain/used unsupported")
    val at = new Array[(Int, Int)](4)
    var p = 2
    var k = 0
    while (k < 4) { at(k) = (pl(p).toInt, pl(p + 1).toInt); p += 2; k += 1 }
    // The raster-order context layout below (decodeGenericT0) IS the
    // spec's bit assignment only when the adaptive pixels sit at their
    // nominal slots; a moved AT keeps its BIT position but changes its
    // read location, which raster-sorting would scramble — so anything
    // non-nominal fails closed instead of decoding silent garbage.
    require(at.sameElements(Array((3, -1), (-3, -1), (2, -2), (-2, -2))),
      s"non-nominal AT pixels unsupported: ${at.mkString(",")}")
    val numex = u32(p); val numnew = u32(p + 4); p += 8
    require(numnew >= 0 && numnew < (1 << 20), s"implausible SDNUMNEWSYMS $numnew")
    val mq = new MQ(pl.drop(p))
    val gb = new Array[Byte](1 << 16)
    val iadh = new Array[Byte](512)
    val iadw = new Array[Byte](512)
    val iaex = new Array[Byte](512)
    val syms = ArrayBuffer.empty[Bitmap]
    var hc = 0
    // progress guard: a corrupt stream can feed dh=0 + immediate OOB
    // width (an empty height class) forever off the MQ decoder's
    // deterministic past-end tail — Try/None cannot catch
    // non-termination, so bound the class count explicitly
    var classes = 0
    while (syms.length < numnew) {
      classes += 1
      require(classes <= numnew + 8, "no-progress symbol height classes")
      val dh = decodeInt(mq, iadh)
      require(dh != OOB, "OOB height delta")
      hc += dh
      require(hc > 0 && hc < (1 << 14), s"implausible height $hc")
      var sw = 0
      var done = false
      while (!done) {
        val dw = decodeInt(mq, iadw)
        if (dw == OOB) done = true
        else {
          sw += dw
          require(sw > 0 && sw < (1 << 14), s"implausible width $sw")
          require(syms.length < numnew, "symbol overrun")
          syms += decodeGenericT0(mq, gb, sw, hc, at)
        }
      }
    }
    // export flags: alternating run lengths over (input ++ new) symbols
    // (run = 0 is legal — e.g. leading exported run — but bounded runs
    // of zeroes must not spin forever)
    val exflags = new Array[Boolean](numnew)
    var idx = 0
    var cur = false
    var exRuns = 0
    while (idx < numnew) {
      exRuns += 1
      require(exRuns <= 2 * numnew + 8, "no-progress export runs")
      val run = decodeInt(mq, iaex)
      require(run != OOB && run >= 0 && idx + run <= numnew, "bad export run")
      if (cur) java.util.Arrays.fill(exflags, idx, idx + run, true)
      idx += run
      cur = !cur
    }
    val exported = syms.indices.filter(exflags).map(syms)
    require(exported.length == numex,
      s"export mismatch: ${exported.length} vs $numex")
    exported.toIndexedSeq
  }

  // ------------------------------------------------------- text region

  /** 6.4.5, SBHUFF=0 / REFINE=0 / TRANSPOSED=0 / REFCORNER=TOPLEFT /
    * one-row strips only; draws onto a fresh region bitmap with OR.
    */
  private def decodeTextRegion(pl: Array[Byte],
      syms: IndexedSeq[Bitmap]): Bitmap = {
    def u16(i: Int) = ((pl(i) & 0xff) << 8) | (pl(i + 1) & 0xff)
    def u32(i: Int) =
      ((pl(i) & 0xff) << 24) | ((pl(i + 1) & 0xff) << 16) |
        ((pl(i + 2) & 0xff) << 8) | (pl(i + 3) & 0xff)
    val w = u32(0); val h = u32(4)
    require(w > 0 && h > 0 && w.toLong * h < (1L << 28), s"implausible region ${w}x$h")
    // region placement (7.4.1 bytes 8-15): rule coordinates below are
    // emitted unshifted, so a region not anchored at the page origin
    // would silently mis-map — fail closed instead
    require(u32(8) == 0 && u32(12) == 0,
      s"nonzero region offset ${u32(8)},${u32(12)} unsupported")
    val fl = u16(17)
    require((fl & 1) == 0, "SBHUFF unsupported")
    require(((fl >> 1) & 1) == 0, "REFINE unsupported")
    require(((fl >> 2) & 3) == 0, "multi-row strips unsupported")
    require(((fl >> 4) & 3) == 1, "REFCORNER != TOPLEFT unsupported")
    require(((fl >> 6) & 1) == 0, "TRANSPOSED unsupported")
    require(((fl >> 7) & 3) == 0, "SBCOMBOP != OR unsupported")
    require(((fl >> 9) & 1) == 0, "SBDEFPIXEL != 0 unsupported")
    require(((fl >> 15) & 1) == 0, "SBRTEMPLATE unsupported")
    var dsoffset = (fl >> 10) & 0x1f
    if (dsoffset > 15) dsoffset -= 32
    val numinst = u32(19)
    require(numinst >= 0 && numinst < (1 << 22), s"implausible instances $numinst")
    val codelen = math.max(1,
      32 - Integer.numberOfLeadingZeros(math.max(1, syms.length - 1)))
    val mq = new MQ(pl.drop(23))
    val iadt = new Array[Byte](512)
    val iafs = new Array[Byte](512)
    val iads = new Array[Byte](512)
    val iaid = new Array[Byte](1 << (codelen + 1))
    val page = new Bitmap(w, h)
    var stript = {
      val v = decodeInt(mq, iadt); require(v != OOB, "OOB STRIPT"); -v
    }
    var firsts = 0
    var ninst = 0
    while (ninst < numinst) {
      val dt = decodeInt(mq, iadt)
      require(dt != OOB, "OOB DT")
      stript += dt
      val dfs = decodeInt(mq, iafs)
      require(dfs != OOB, "OOB DFS")
      firsts += dfs
      var curs = firsts
      var first = true
      var strip = true
      while (strip) {
        if (!first) {
          val ids = decodeInt(mq, iads)
          if (ids == OOB) strip = false
          else curs += ids + dsoffset
        }
        if (strip) {
          first = false
          val ti = stript // CURT = 0 at one-row strips
          val sid = decodeIaid(mq, iaid, codelen)
          require(sid >= 0 && sid < syms.length, s"symbol id $sid")
          val sym = syms(sid)
          // REFCORNER=TOPLEFT, TRANSPOSED=0: (curs, ti) is the top-left
          var sy = 0
          while (sy < sym.h) {
            val py = ti + sy
            if (py >= 0 && py < h) {
              var sx = 0
              val rowBase = py * w
              val symBase = sy * sym.w
              while (sx < sym.w) {
                val px = curs + sx
                if (px >= 0 && px < w && sym.bits(symBase + sx) != 0)
                  page.bits(rowBase + px) = 1
                sx += 1
              }
            }
            sy += 1
          }
          curs += sym.w - 1
          ninst += 1
          if (ninst >= numinst) {
            // the strip's trailing OOB terminator
            val tail = decodeInt(mq, iads)
            require(tail == OOB, "expected strip terminator")
            strip = false
          }
        }
      }
    }
    page
  }

  // ----------------------------------------------------------- public

  /** Decode one embedded JBIG2 stream (the /JBIG2Decode payload of an
    * image XObject) into a page bitmap. None on anything outside the
    * supported profile or any structural inconsistency — fail closed.
    */
  private[ingest] def decodePage(stream: Array[Byte], w: Int,
      h: Int): Option[Bitmap] =
    Try {
      var syms: IndexedSeq[Bitmap] = null
      var page: Bitmap = null
      segments(stream).foreach { seg =>
        seg.stype match {
          case 0 =>
            // a second dictionary would silently replace the first: a
            // region importing from both would then decode against the
            // wrong symbol list/codelen yet can pass the structural
            // checks — fail closed
            require(syms == null, "multiple symbol dictionaries unsupported")
            syms = decodeSymbolDict(seg.payload)
          case 4 | 6 | 7 =>
            require(syms != null, "text region before symbol dict")
            require(page == null, "multiple regions unsupported")
            page = decodeTextRegion(seg.payload, syms)
          case 48 | 49 | 50 | 51 | 62 => () // page info / end / extension
          case t => throw new IllegalStateException(s"segment type $t")
        }
      }
      require(page != null, "no text region")
      require(page.w == w && page.h == h,
        s"region ${page.w}x${page.h} != image ${w}x$h")
      page
    }.toOption

  /** Ruled-line extraction from a decoded raster: maximal horizontal /
    * vertical black runs at least dim/40 long, with consecutive
    * same-span rows/cols merged into one physical rule. Returns
    * (horizontal, vertical) segments in PIXEL coordinates:
    * (x0, x1, y) and (y0, y1, x).
    *
    * The dim/40 length gate is the reference's own: tables.py:54 calls
    * camelot with line_scale=40 (kernel = dim // line_scale), NOT the
    * library default 15. The distinction matters on scans — a grid's
    * verticals are CUT at every crossing band in the raster (the 2007
    * header band's verticals measure 295 px; a dim/15 gate of 340
    * would melt the header into one spanning cell and R15 would map
    * every category onto column 0). Isolated long underlines die in
    * grid detection anyway (a >= 2x2 intersecting component is
    * required).
    */
  private[graft] def rules(bm: Bitmap)
      : (Seq[(Int, Int, Int)], Seq[(Int, Int, Int)]) = {
    val minH = math.max(bm.w / 40, 8)
    val minV = math.max(bm.h / 40, 8)

    // collect runs >= min along the major axis, one list per minor
    // line, bridging gaps <= BridgeGap px: a 600 dpi scan pockmarks
    // its rules with 1-10 px holes that would split one printed line
    // into sub-threshold pieces (a row-height vertical is ~160 px —
    // unreachable through any sane length gate once split), while
    // genuine structure gaps (band crossings) measure 100+ px and
    // stay unbridged
    val BridgeGap = 12
    def runsOf(major: Int, minor: Int, min: Int,
        get: (Int, Int) => Int): Array[List[(Int, Int)]] = {
      val out = Array.fill(minor)(List.empty[(Int, Int)])
      var mi = 0
      while (mi < minor) {
        var x = 0
        var open = -1 // start of the current bridged run
        var last = -1 // last black pixel seen
        while (x <= major) {
          val black = x < major && get(x, mi) != 0
          if (black) {
            if (open < 0) open = x
            else if (x - last > BridgeGap + 1) {
              if (last - open + 1 >= min) out(mi) = (open, last) :: out(mi)
              open = x
            }
            last = x
          } else if (open >= 0 && (x - last > BridgeGap || x == major)) {
            if (last - open + 1 >= min) out(mi) = (open, last) :: out(mi)
            open = -1
          }
          x += 1
        }
        out(mi) = out(mi).reverse
        mi += 1
      }
      out
    }

    // merge runs on consecutive minor lines whose spans overlap >= 80%
    // (one thick physical rule scans as several adjacent thin runs)
    def merge(perLine: Array[List[(Int, Int)]]): Seq[(Int, Int, Int)] = {
      final case class Open(var lo: Int, var hi: Int, start: Int,
        var last: Int)
      val open = ArrayBuffer.empty[Open]
      val done = ArrayBuffer.empty[(Int, Int, Int)]
      def close(o: Open): Unit =
        done += ((o.lo, o.hi, (o.start + o.last) / 2))
      var mi = 0
      while (mi < perLine.length) {
        perLine(mi).foreach { case (lo, hi) =>
          val hit = open.find { o =>
            o.last >= mi - 1 && {
              val ov = math.min(hi, o.hi) - math.max(lo, o.lo) + 1
              ov * 5 >= (hi - lo + 1) * 4 || ov * 5 >= (o.hi - o.lo + 1) * 4
            }
          }
          hit match {
            case Some(o) =>
              o.lo = math.min(o.lo, lo); o.hi = math.max(o.hi, hi)
              o.last = mi
            case None => open += Open(lo, hi, mi, mi)
          }
        }
        // close stale
        var k = open.length - 1
        while (k >= 0) {
          if (open(k).last < mi - 1) { close(open(k)); open.remove(k) }
          k -= 1
        }
        mi += 1
      }
      open.foreach(close)
      done.toSeq
    }

    val hs = merge(runsOf(bm.w, bm.h, minH, (x, y) => bm.get(x, y)))
    val vs = merge(runsOf(bm.h, bm.w, minV, (y, x) => bm.get(x, y)))
    (hs, vs)
  }
}
