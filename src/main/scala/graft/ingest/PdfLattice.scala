package graft.ingest

import scala.collection.mutable.ArrayBuffer
import scala.util.Try

/** Ruled-table extraction from vector PDFs — the lattice half of R5
  * (reference tables.py:51-97: camelot `flavor='lattice'` over every
  * page, then density-gated assembly). Camelot rasterizes each page with
  * Ghostscript and detects rules by image morphology; no renderer exists
  * in this container, but the SAME rules are present as vector geometry
  * in the page content streams (word-processor output draws cell borders
  * as thin filled rectangles / line paths). So this is an honest
  * re-creation of lattice semantics from the vector source:
  *
  *   1. walk the page tree and inflate each page's content streams
  *      (classic objects; `PdfMeta` handles the container primitives);
  *   2. interpret the content: a text machine (BT ET, Tm Td TD Tstar
  *      TL, Tj TJ ' ", with the q Q cm CTM stack) emits positioned
  *      text fragments, and a path machine (m l re h plus the stroke
  *      and fill paint operators) emits axis-aligned segments in
  *      device space;
  *   3. thin rectangles become horizontal/vertical rules, large painted
  *      rectangles contribute their borders; rules that intersect are
  *      union-found into connected grids — each component with >= 2
  *      rules in both directions is a table (camelot's contour step);
  *   4. rule coordinates cluster into row/column boundaries; text
  *      fragments land in their enclosing cell, concatenated in reading
  *      order (top-to-bottom, left-to-right).
  *
  * camelot's `copy_text=['v']` (merged-cell value smoothing — the
  * reference always passes it, tables.py:54) IS re-created: an empty
  * cell with left/right rules but no top rule inherits the value
  * above it ([[CopyTextV]]). Variances from camelot, all conservative:
  * character codes outside printable Latin-1
  * (CID-font artifacts — bullets, NBSPs) are dropped rather than
  * guessed. SCANNED pages (a full-page image + invisible-OCR text
  * layer) are covered by embedded raster decoders: JBIG2 (ITU-T T.88,
  * the 2007 compendium — [[Jbig2]]) and CCITT G4 (ITU-T T.6, the
  * 2005-b compendium — [[CcittG4]]); their pixel grids feed the same
  * rule miner, so ALL 13 reference PDFs parse.
  * PdfLatticeSuite pins a planted ruled table exactly AND real cells of
  * the reference corpus (part numbers, PI names) against values
  * verified with an independent parser.
  *
  * Scale shape: everything is bytes-local to one file inside
  * `mapPartitions` over the `binaryFile` source — a corpus of PDFs
  * parallelizes per file with zero shuffle until the cell frame exists.
  */
object PdfLattice {

  // ---------------------------------------------------------------- lexer

  private sealed trait Tok
  private case class TNum(v: Double) extends Tok
  private case class TStr(bytes: Array[Byte]) extends Tok
  private case class THex(bytes: Array[Byte]) extends Tok
  private case class TName(s: String) extends Tok
  private case class TOp(s: String) extends Tok
  private case object TDelim extends Tok // [, ], <<, >> — structure we can ignore

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == 0 || c == '\f'
  private def isDelimChar(c: Byte): Boolean =
    c == '/' || c == '[' || c == ']' || c == '(' || c == ')' ||
    c == '<' || c == '>' || c == '{' || c == '}' || c == '%'

  /** Tokenize a decoded content stream (ISO 32000 §7.2 syntax, the
    * subset content streams use). Inline images (BI..EI) are skipped.
    */
  private def lex(c: Array[Byte]): ArrayBuffer[Tok] = {
    val toks = new ArrayBuffer[Tok](c.length / 8 + 16)
    var i = 0
    val n = c.length
    while (i < n) {
      val ch = c(i)
      if (isWs(ch)) i += 1
      else if (ch == '%') { while (i < n && c(i) != '\n') i += 1 }
      else if (ch == '(') {
        val out = new java.io.ByteArrayOutputStream()
        var depth = 1; var j = i + 1
        while (j < n && depth > 0) {
          val cj = c(j)
          if (cj == '\\' && j + 1 < n) {
            val nx = c(j + 1)
            nx match {
              case 'n' => out.write('\n'); j += 2
              case 'r' => out.write('\r'); j += 2
              case 't' => out.write('\t'); j += 2
              case 'b' => out.write('\b'); j += 2
              case 'f' => out.write('\f'); j += 2
              case '(' => out.write('('); j += 2
              case ')' => out.write(')'); j += 2
              case '\\' => out.write('\\'); j += 2
              case '\n' => j += 2
              case d if d >= '0' && d <= '7' =>
                var k = j + 1; var v = 0
                while (k < n && k < j + 4 && c(k) >= '0' && c(k) <= '7') {
                  v = v * 8 + (c(k) - '0'); k += 1
                }
                out.write(v & 0xff); j = k
              case _ => j += 2
            }
          } else if (cj == '(') { depth += 1; out.write(cj); j += 1 }
          else if (cj == ')') { depth -= 1; if (depth > 0) out.write(cj); j += 1 }
          else { out.write(cj); j += 1 }
        }
        toks += TStr(out.toByteArray); i = j
      } else if (ch == '<' && i + 1 < n && c(i + 1) == '<') { toks += TDelim; i += 2 }
      else if (ch == '>' && i + 1 < n && c(i + 1) == '>') { toks += TDelim; i += 2 }
      else if (ch == '<') {
        var j = i + 1
        val hx = new StringBuilder
        while (j < n && c(j) != '>') {
          val cj = c(j).toChar
          if (!cj.isWhitespace) hx += cj
          j += 1
        }
        if (hx.length % 2 == 1) hx += '0'
        val bytes = Try(hx.toString.grouped(2)
          .map(h => Integer.parseInt(h, 16).toByte).toArray)
          .getOrElse(Array.emptyByteArray)
        toks += THex(bytes); i = j + 1
      } else if (ch == '[' || ch == ']') { toks += TDelim; i += 1 }
      else if (ch == '/') {
        var j = i + 1
        while (j < n && !isWs(c(j)) && !isDelimChar(c(j))) j += 1
        toks += TName(new String(c, i + 1, j - i - 1,
          java.nio.charset.StandardCharsets.ISO_8859_1)); i = j
      } else if (ch == '+' || ch == '-' || ch == '.' || (ch >= '0' && ch <= '9')) {
        var j = i
        while (j < n && (c(j) == '+' || c(j) == '-' || c(j) == '.' ||
          (c(j) >= '0' && c(j) <= '9'))) j += 1
        Try(new String(c, i, j - i,
          java.nio.charset.StandardCharsets.ISO_8859_1).toDouble)
          .foreach(v => toks += TNum(v))
        i = j
      } else {
        var j = i
        while (j < n && !isWs(c(j)) && !isDelimChar(c(j))) j += 1
        val op = new String(c, i, j - i,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        if (op == "BI") { // inline image: skip to EI
          var k = j
          while (k + 1 < n && !(c(k) == 'E' && c(k + 1) == 'I')) k += 1
          i = k + 2
        } else { toks += TOp(op); i = j }
      }
    }
    toks
  }

  // ---------------------------------------------------- content interpreter

  /** Row-major affine text matrix (a b c d e f). */
  private[ingest] final case class Mat(a: Double, b: Double, c: Double,
      d: Double, e: Double, f: Double) {
    def *(o: Mat): Mat = Mat(
      a * o.a + b * o.c, a * o.b + b * o.d,
      c * o.a + d * o.c, c * o.b + d * o.d,
      e * o.a + f * o.c + o.e, e * o.b + f * o.d + o.f)
    def apply(x: Double, y: Double): (Double, Double) =
      (a * x + c * y + e, b * x + d * y + f)
  }
  private val Id = Mat(1, 0, 0, 1, 0, 0)

  /** A positioned show-text run: start point plus an ESTIMATED advance
    * endpoint (0.5 em per char at the effective size, along the text
    * matrix's x axis — so rotated text spans vertically until page
    * normalization). No font metrics exist without the font files, but
    * the estimate only drives the space-vs-juxtapose decision when
    * fragments join into lines, where sub-point errors are harmless
    * against multi-point column gaps.
    */
  final case class TextFrag(x: Double, y: Double, xEnd: Double,
      yEnd: Double, text: String, ord: Int = 0, size: Double = 0.0,
      est: Boolean = true) {
    def xMin: Double = math.min(x, xEnd)
    def xMax: Double = math.max(x, xEnd)
  }
  /** Painted axis-aligned box in device space (lines have ~0 extent on
    * one axis). `shade = true` marks the border of a LARGE fill-only
    * rect (background shading): not a rule — it never participates in
    * grid detection — but its edges CONFIRM cell-boundary presence for
    * the span/shift/fill machinery (a raster line detector sees them,
    * and camelot's cells gain their top borders from exactly these
    * header-band edges).
    */
  final case class Box(x: Double, y: Double, w: Double, h: Double,
      shade: Boolean = false)

  /** Advance estimate in text-space ems, by glyph class — the FALLBACK
    * when a font's /Widths cannot be resolved: narrow strokes ~0.35 em,
    * caps/digits ~0.66 em, everything else ~0.5 em.
    */
  private def estCharWidth(c: Char): Double =
    if ("ilIjt.,:;'()[]|!f ".indexOf(c) >= 0) 0.35
    else if (c.isUpper || c.isDigit) 0.66
    else 0.5

  // -------------------------------------------------------- font metrics

  /** Resolved advance widths of one simple font (glyph-space units,
    * 1000/em). `width(code)` < 0 means unknown — caller estimates.
    */
  private[graft] final case class PdfFont(first: Int,
      widths: Array[Double], missing: Double) {
    def width(code: Int): Double = {
      val i = code - first
      if (i >= 0 && i < widths.length && widths(i) > 0) widths(i)
      else if (missing > 0) missing
      else -1.0
    }
  }

  /** AFM advance widths of the standard-14 Type1 fonts (codes 32-126,
    * StandardEncoding = ASCII in this range) — public Adobe core-font
    * metrics, required because a PDF may reference these fonts with no
    * /Widths array at all (ISO 32000 §9.6.2.2); the 2007 scan's OCR
    * layer does exactly that.
    */
  private val StdWidths: Map[String, Array[Double]] = {
    def w(s: String) = s.trim.split("\\s+").map(_.toDouble)
    val helv = w("""278 278 355 556 556 889 667 191 333 333 389 584 278
      333 278 278 556 556 556 556 556 556 556 556 556 556 278 278 584
      584 584 556 1015 667 667 722 722 667 611 778 722 278 500 667 556
      833 722 778 667 778 722 667 611 722 667 944 667 667 611 278 278
      278 469 556 333 556 556 500 556 556 278 556 556 222 222 500 222
      833 556 556 556 556 333 500 278 556 500 722 500 500 500 334 260
      334 584""")
    val helvB = w("""278 333 474 556 556 889 722 238 333 333 389 584 278
      333 278 278 556 556 556 556 556 556 556 556 556 556 333 333 584
      584 584 611 975 722 722 722 722 667 611 778 722 278 556 722 611
      833 722 778 667 778 722 667 611 722 667 944 667 667 611 333 278
      333 584 556 333 556 611 556 611 556 333 611 611 278 278 556 278
      889 611 611 611 611 389 556 333 611 556 778 556 556 500 389 280
      389 584""")
    val times = w("""250 333 408 500 500 833 778 180 333 333 500 564 250
      333 250 278 500 500 500 500 500 500 500 500 500 500 278 278 564
      564 564 444 921 722 667 667 722 611 556 722 722 333 389 722 611
      889 722 722 556 722 667 556 611 722 722 944 722 722 611 333 278
      333 469 500 333 444 500 444 500 444 333 500 500 278 278 500 278
      778 500 500 500 500 333 389 278 500 500 722 500 500 444 480 200
      480 541""")
    val timesB = w("""250 333 555 500 500 1000 833 278 333 333 500 570
      250 333 250 278 500 500 500 500 500 500 500 500 500 500 333 333
      570 570 570 500 930 722 667 722 722 667 611 778 778 389 500 778
      667 944 722 778 611 778 722 556 667 722 722 1000 722 722 667 333
      278 333 581 500 333 500 556 444 556 444 333 500 556 278 333 556
      278 833 556 500 556 556 444 389 333 556 500 722 500 500 444 394
      220 394 520""")
    val timesI = w("""250 333 420 500 500 833 778 214 333 333 500 675
      250 333 250 278 500 500 500 500 500 500 500 500 500 500 333 333
      675 675 675 500 920 611 611 667 722 611 611 722 722 333 444 667
      556 833 667 722 611 722 611 500 556 722 611 833 611 556 556 389
      278 389 422 500 333 500 500 444 500 444 278 500 500 278 278 444
      278 722 500 500 500 500 389 389 278 500 444 667 444 444 389 400
      275 400 541""")
    val timesBI = w("""250 389 555 500 500 833 778 278 333 333 500 570
      250 333 250 278 500 500 500 500 500 500 500 500 500 500 333 333
      570 570 570 500 832 667 667 667 722 667 667 722 778 389 500 667
      611 889 722 722 611 722 667 556 611 722 667 889 667 611 611 333
      278 333 570 500 333 500 500 444 500 444 333 500 556 278 278 500
      278 778 556 500 500 500 389 389 278 556 444 667 500 444 389 348
      220 348 570""")
    val courier = Array.fill(95)(600.0)
    Map(
      "Helvetica" -> helv, "Helvetica-Oblique" -> helv, "Arial" -> helv,
      "ArialMT" -> helv,
      "Helvetica-Bold" -> helvB, "Helvetica-BoldOblique" -> helvB,
      "Arial-Bold" -> helvB, "Arial-BoldMT" -> helvB,
      "Times-Roman" -> times, "TimesNewRoman" -> times,
      "TimesNewRomanPSMT" -> times,
      "Times-Bold" -> timesB, "TimesNewRomanPS-BoldMT" -> timesB,
      "Times-Italic" -> timesI, "TimesNewRomanPS-ItalicMT" -> timesI,
      "Times-BoldItalic" -> timesBI,
      "TimesNewRomanPS-BoldItalicMT" -> timesBI,
      "Courier" -> courier, "Courier-Bold" -> courier,
      "Courier-Oblique" -> courier, "Courier-BoldOblique" -> courier)
  }

  private val FontDictRefRe = """/Font\s+(\d+)\s+0\s+R""".r
  private val FirstCharRe = """/FirstChar\s+(\d+)""".r
  private val WidthsArrRe = """(?s)/Widths\s*\[(.*?)\]""".r
  private val WidthsRefRe = """/Widths\s+(\d+)\s+0\s+R""".r
  private val DescRefRe = """/FontDescriptor\s+(\d+)\s+0\s+R""".r
  private val MissingWRe = """/MissingWidth\s+([\d.]+)""".r
  private val BaseFontRe = """/BaseFont\s*/([^\s/<>\[\]()]+)""".r
  private val NumRe = """-?[\d.]+""".r

  /** Bracket-match the `<<...>>` that starts at or after `from`. */
  private def dictAt(r: String, from: Int): Option[String] = {
    val open = r.indexOf("<<", from)
    if (open < 0) None
    else {
      var depth = 0; var j = open; var end = -1
      while (j < r.length - 1 && end < 0) {
        if (r.charAt(j) == '<' && r.charAt(j + 1) == '<') { depth += 1; j += 2 }
        else if (r.charAt(j) == '>' && r.charAt(j + 1) == '>') {
          depth -= 1; j += 2; if (depth == 0) end = j
        } else j += 1
      }
      if (end < 0) None else Some(r.substring(open, end))
    }
  }

  /** The /Font name -> metrics map of one page. Best-effort: a font
    * that cannot be resolved (Type0/CID, broken refs) is simply absent
    * and its runs fall back to estimated advances.
    */
  private[graft] def pageFonts(data: Array[Byte], s: String,
      pageDict: String): Map[String, PdfFont] = {
    val res =
      if (pageDict.contains("/Font")) Some(pageDict)
      else ResourcesRefRe.findFirstMatchIn(pageDict)
        .flatMap(m => fetchObj(data, s, m.group(1).toInt))
    res.toSeq.flatMap { r =>
      // inline /Font<<...>> — or an indirect /Font N 0 R dictionary
      val inlineAt = """/Font\s*<<""".r.findFirstMatchIn(r)
      val body = inlineAt.flatMap(m => dictAt(r, m.start))
        .orElse(FontDictRefRe.findFirstMatchIn(r)
          .flatMap(m => fetchObj(data, s, m.group(1).toInt)))
      body.toSeq.flatMap { fd =>
        XObjPairRe.findAllMatchIn(fd).flatMap { m =>
          val name = m.group(1)
          fetchObj(data, s, m.group(2).toInt).flatMap { obj =>
            if (obj.contains("/Type0")) None
            else {
              val widths = WidthsArrRe.findFirstMatchIn(obj)
                .map(_.group(1))
                .orElse(WidthsRefRe.findFirstMatchIn(obj).flatMap(w =>
                  fetchObj(data, s, w.group(1).toInt)))
                .map(a => NumRe.findAllIn(a).map(_.toDouble).toArray)
                .filter(_.nonEmpty)
              val first = FirstCharRe.findFirstMatchIn(obj)
                .map(_.group(1).toInt)
              val missing = DescRefRe.findFirstMatchIn(obj)
                .flatMap(d => fetchObj(data, s, d.group(1).toInt))
                .flatMap(d => MissingWRe.findFirstMatchIn(d))
                .map(_.group(1).toDouble).getOrElse(0.0)
              // /FirstChar is REQUIRED with /Widths (§9.6.2): guessing
              // 0 would misindex every glyph while claiming resolved
              // metrics — treat such a font as unresolved instead
              widths.flatMap(w => first.map(f =>
                name -> PdfFont(f, w, missing)))
                .orElse {
                  // no /Widths: a standard-14 font carries its public
                  // AFM metrics implicitly
                  BaseFontRe.findFirstMatchIn(obj)
                    .map(_.group(1).replaceFirst("^[A-Z]{6}\\+", ""))
                    .flatMap(StdWidths.get)
                    .map(w => name -> PdfFont(32, w, missing))
                }
            }
          }
        }
      }
    }.toMap
  }

  private def printable(bytes: Array[Byte], keepAll: Boolean): String = {
    val sb = new StringBuilder(bytes.length)
    bytes.foreach { b =>
      val v = b & 0xff
      if (v >= 32 && (keepAll || v < 127)) sb += v.toChar
    }
    sb.toString
  }

  /** Run the text + path machines over one page's content. Also records
    * every XObject invocation with the CTM active at its `Do` — the
    * placement a raster-rule extractor (Jbig2) needs to map image-pixel
    * geometry into device space.
    */
  private[ingest] def interpret(content: Array[Byte],
      fonts: Map[String, PdfFont] = Map.empty)
      : (Seq[TextFrag], Seq[Box], Seq[(String, Mat)]) = {
    val texts = new ArrayBuffer[TextFrag]
    val boxes = new ArrayBuffer[Box]
    val places = new ArrayBuffer[(String, Mat)]
    var ctm = Id
    // non-stroking fill luminance (0 = black, the PDF initial color):
    // distinguishes a dark separator BAR (a rule to a raster line
    // detector) from light background shading. Part of graphics state,
    // so saved/restored with q/Q alongside the CTM.
    var fillLum = 0.0
    var tm = Id; var tlm = Id; var tl = 0.0; var fs = 1.0
    var tc = 0.0; var tw = 0.0 // Tc char / Tw word spacing (text state)
    var curFont: PdfFont = null // resolved metrics of the Tf-selected font
    // ISO 32000 Table 52: the graphics state q/Q saves includes the
    // TEXT state (font, size, spacings) — a header drawn inside q..Q
    // with its own Tf must not leak its font into the following cells
    final case class GState(ctm: Mat, lum: Double, fs: Double,
        tc: Double, tw: Double, tl: Double, font: PdfFont)
    val gsStack = new ArrayBuffer[GState]
    val operands = new ArrayBuffer[Tok]
    val pathRects = new ArrayBuffer[(Double, Double, Double, Double)]
    val pathLines = new ArrayBuffer[((Double, Double), (Double, Double))]
    var cur: (Double, Double) = null
    var pathStart: (Double, Double) = null

    def nums(k: Int): Option[IndexedSeq[Double]] = {
      val ds = operands.collect { case TNum(v) => v }
      if (ds.length >= k) Some(ds.takeRight(k).toIndexedSeq) else None
    }
    def lastString: Option[String] = operands.reverseIterator.collectFirst {
      case TStr(b) => printable(b, keepAll = true)
      case THex(b) => printable(b, keepAll = false)
    }
    // A thin painted rect is a rule either way. A LARGE rect depends on
    // the paint op: stroked -> its four borders are drawn lines (table
    // outer frames); fill-only -> background SHADING, whose edges are
    // not rules (header-band shading otherwise splits header cells into
    // phantom rows that a morphological line detector never sees).
    // EXCEPT a DARK fill-only bar a few points thick: rendered it is a
    // thick dark line, and camelot's morphology reduces any such
    // contour to its centerline (image_processing find_lines) — header
    // separator bars are drawn this way (per-column filled rects
    // ~2-3 pt tall). Emit the centerline as a rule.
    def paint(stroked: Boolean): Unit = {
      val thin = 2.0
      val bar = 4.0
      val dark = fillLum < 0.5
      pathRects.foreach { case (x, y, w, h) =>
        val (x1, y1) = ctm(x, y); val (x2, y2) = ctm(x + w, y + h)
        val (bx, by) = (math.min(x1, x2), math.min(y1, y2))
        val (bw, bh) = (math.abs(x2 - x1), math.abs(y2 - y1))
        if (bw <= thin || bh <= thin) boxes += Box(bx, by, bw, bh)
        else if (!stroked && dark && math.min(bw, bh) <= bar) {
          if (bh <= bw) boxes += Box(bx, by + bh / 2, bw, 0)
          else boxes += Box(bx + bw / 2, by, 0, bh)
        }
        else if (stroked) {
          boxes += Box(bx, by, bw, 0)
          boxes += Box(bx, by + bh, bw, 0)
          boxes += Box(bx, by, 0, bh)
          boxes += Box(bx + bw, by, 0, bh)
        } else {
          // fill-only large rect: SHADING. Its edges are not rules
          // (they would split shaded bands into phantom rows), but
          // where they coincide with boundaries the real rules already
          // establish, they carry edge presence — emit them marked.
          boxes += Box(bx, by, bw, 0, shade = true)
          boxes += Box(bx, by + bh, bw, 0, shade = true)
          boxes += Box(bx, by, 0, bh, shade = true)
          boxes += Box(bx + bw, by, 0, bh, shade = true)
        }
      }
      pathLines.foreach { case (a, b) =>
        val (x1, y1) = ctm(a._1, a._2); val (x2, y2) = ctm(b._1, b._2)
        boxes += Box(math.min(x1, x2), math.min(y1, y2),
          math.abs(x2 - x1), math.abs(y2 - y1))
      }
      clearPath()
    }
    def clearPath(): Unit = {
      pathRects.clear(); pathLines.clear(); cur = null; pathStart = null
    }
    def newline(): Unit = { tlm = Mat(1, 0, 0, 1, 0, -tl) * tlm; tm = tlm }
    // ---- show-text run assembly. A single show op can paint text that
    // spans several table cells (space glyphs stretched by Tw, or TJ
    // kern jumps) — pdfminer lays glyphs at their true advances and its
    // line grouping splits at the gaps, so camelot sees one textline
    // per cell. We re-create that: walk glyphs tracking the offset in
    // unscaled text space (estimated widths + Tc/Tw), and FLUSH the run
    // whenever a space or kern advances more than one em — that gap is
    // a tabulation into another column, not a word break.
    val rsb = new StringBuilder
    var rOff = 0.0; var rOff0 = 0.0; var rEnd = 0.0
    // a single unresolved glyph width poisons every later offset in the
    // same show op (no absolute repositioning until the next Tm/Td) —
    // track estimation per SHOW, not per run
    var showEst = false
    def flushRun(): Unit = {
      if (rsb.nonEmpty) {
        val m = tm * ctm
        val (x, y) = m(rOff0, 0)
        val (xe, ye) = m(rEnd, 0)
        // device-space em size: fs scaled by the advance axis of the
        // effective matrix — drives word-margin and line-overlap
        // decisions downstream (pdfminer derives the same from glyph
        // bboxes)
        val devSize = fs * math.hypot(m.a, m.b)
        texts += TextFrag(x, y, xe, ye, rsb.toString, texts.length,
          devSize, showEst)
        rsb.clear()
      }
    }
    def beginShow(): Unit = {
      rsb.clear(); rOff = 0.0; rOff0 = 0.0; rEnd = 0.0
      showEst = curFont == null
    }
    def runString(s: String): Unit = s.foreach { c =>
      val w = if (curFont != null) curFont.width(c) else -1.0
      if (w < 0) showEst = true
      val cw = if (w >= 0) w / 1000.0 else estCharWidth(c)
      val adv = cw * fs + tc + (if (c == ' ') tw else 0.0)
      if (c == ' ' && adv > fs) { flushRun(); rOff += adv }
      else {
        if (rsb.isEmpty) rOff0 = rOff
        rsb += c; rOff += adv; rEnd = rOff
      }
    }
    // after a show op the pen has ADVANCED: tm moves by the total
    // accumulated displacement (glyph advances + kerns), so a following
    // show op without repositioning paints where this one ended
    // (ISO 32000 §9.4.4) — files draw e.g. "LTC6268" TJ then "(-)Tj"
    // relying on exactly that
    def advancePen(): Unit = tm = Mat(1, 0, 0, 1, rOff, 0) * tm
    def emit(s: String): Unit = {
      beginShow(); runString(s); flushRun(); advancePen()
    }

    lex(content).foreach {
      case TOp(op) =>
        op match {
          case "q" => gsStack += GState(ctm, fillLum, fs, tc, tw, tl, curFont)
          case "Q" => if (gsStack.nonEmpty) {
            val g = gsStack.last; gsStack.dropRightInPlace(1)
            ctm = g.ctm; fillLum = g.lum; fs = g.fs
            tc = g.tc; tw = g.tw; tl = g.tl; curFont = g.font
          }
          case "cm" => nums(6).foreach(v =>
            ctm = Mat(v(0), v(1), v(2), v(3), v(4), v(5)) * ctm)
          case "re" => nums(4).foreach(v =>
            pathRects += ((v(0), v(1), v(2), v(3))))
          case "m" => nums(2).foreach { v =>
            cur = (v(0), v(1)); pathStart = cur
          }
          case "l" => nums(2).foreach { v =>
            if (cur != null) { pathLines += ((cur, (v(0), v(1)))); cur = (v(0), v(1)) }
          }
          case "h" => if (cur != null && pathStart != null) {
            pathLines += ((cur, pathStart)); cur = pathStart
          }
          case "S" | "s" | "B" | "B*" | "b" | "b*" => paint(stroked = true)
          case "f" | "F" | "f*" => paint(stroked = false)
          case "n" => clearPath()
          case "W" | "W*" => () // clipping: path persists until the paint op
          case "BT" => tm = Id; tlm = Id
          case "ET" => ()
          case "Tf" =>
            nums(1).foreach(v => fs = v(0))
            operands.reverseIterator.collectFirst { case TName(nm) => nm }
              .foreach(nm => curFont = fonts.getOrElse(nm, null))
          case "TL" => nums(1).foreach(v => tl = v(0))
          case "Tc" => nums(1).foreach(v => tc = v(0))
          case "Tw" => nums(1).foreach(v => tw = v(0))
          case "Tm" => nums(6).foreach { v =>
            tm = Mat(v(0), v(1), v(2), v(3), v(4), v(5)); tlm = tm
          }
          case "Td" => nums(2).foreach { v =>
            tlm = Mat(1, 0, 0, 1, v(0), v(1)) * tlm; tm = tlm
          }
          case "TD" => nums(2).foreach { v =>
            tl = -v(1); tlm = Mat(1, 0, 0, 1, v(0), v(1)) * tlm; tm = tlm
          }
          case "T*" => newline()
          case "Tj" => lastString.foreach(emit)
          case "'" => newline(); lastString.foreach(emit)
          case "\"" =>
            // aw ac string ": set word + char spacing, newline, show
            nums(2).foreach { v => tw = v(0); tc = v(1) }
            newline(); lastString.foreach(emit)
          case "TJ" =>
            // numeric elements are kerning adjustments in thousandths
            // of an em; a large negative one IS the word gap in files
            // that space words by displacement instead of space glyphs
            // (the pdftotext/pdfminer heuristic, threshold ~-180). A
            // VERY large one (> 1 em) is a tabulation jump into the
            // next table column — pdfminer's layout splits the line at
            // the gap, and so must we: the runs become separate
            // fragments at their true x positions, otherwise a row
            // painted as one kerned TJ melts its cells together.
            beginShow()
            operands.foreach {
              case TStr(b) => runString(printable(b, keepAll = true))
              case THex(b) => runString(printable(b, keepAll = false))
              case TNum(v) =>
                if (v < -1000) flushRun()
                else if (v < -180 && rsb.nonEmpty && !rsb.last.isWhitespace)
                  rsb += ' '
                rOff -= v / 1000.0 * fs
              case _ => ()
            }
            flushRun()
            advancePen()
          case "Do" => operands.reverseIterator.collectFirst {
            case TName(nm) => nm
          }.foreach(nm => places += ((nm, ctm)))
          // ---- non-stroking color (ISO 32000 §8.6.8): luminance only
          case "g" => nums(1).foreach(v => fillLum = v(0))
          case "rg" => nums(3).foreach(v =>
            fillLum = 0.3 * v(0) + 0.59 * v(1) + 0.11 * v(2))
          case "k" => nums(4).foreach(v => fillLum = math.max(0.0,
            1.0 - math.min(1.0, 0.3 * v(0) + 0.59 * v(1) + 0.11 * v(2) + v(3))))
          case "sc" | "scn" =>
            // generic set-color: interpret by operand count (gray/RGB/
            // CMYK); pattern or ICC names leave the estimate unchanged
            val ds = operands.collect { case TNum(x) => x }
            ds.length match {
              case 1 => fillLum = ds(0)
              case 3 => fillLum = 0.3 * ds(0) + 0.59 * ds(1) + 0.11 * ds(2)
              case 4 => fillLum = math.max(0.0, 1.0 -
                math.min(1.0, 0.3 * ds(0) + 0.59 * ds(1) + 0.11 * ds(2) + ds(3)))
              case _ => ()
            }
          case "cs" => fillLum = 0.0 // new colorspace resets to initial (black)
          case _ => () // Tc/Tw/Tz/Ts/Tf/Tr, stroke color, marked content
        }
        operands.clear()
      case t => operands += t
    }
    (texts.toSeq, boxes.toSeq, places.toSeq)
  }

  // ------------------------------------------------------- grid detection

  /** One detected grid: device-space bbox (PDF y grows upward, so yMax
    * is the TOP) + cells ordered top-first, each row left-to-right.
    */
  final case class Table(xMin: Double, yMin: Double, xMax: Double,
      yMax: Double, cells: Vector[Vector[String]]) {
    def top: Double = yMax
  }

  /** One page's interpreted content: positioned text + detected grids. */
  final case class PageExtract(page: Int, texts: Seq[TextFrag],
      tables: Seq[Table])

  /** camelot `copy_text=['v']` smoothing on/off — on, because the
    * reference passes it on every read_pdf call (tables.py:54).
    */
  private[ingest] val CopyTextV = true

  private val Tol = 2.0
  private val SegJoinGap = 6.0 // collinear rule pieces bridge gaps this wide
  private val MaxRules = 5000 // union-find is O(rules^2); vector pages are O(100)

  /** Group fragments into lines: sorted by descending y, a fragment
    * joins the previous one's line when their baselines sit within the
    * tolerance OR their glyph extents overlap by more than half the
    * smaller height (pdfminer's line_overlap rule — a raised
    * superscript shares its body line even though its baseline is
    * points above).
    */
  private[ingest] def lineGroups(frags: Seq[TextFrag]): Seq[Seq[TextFrag]] = {
    val sorted = frags.sortBy(-_.y)
    val out = new ArrayBuffer[ArrayBuffer[TextFrag]]
    def overlaps(a: TextFrag, b: TextFrag): Boolean = {
      val asc = 0.72 // ascender height as a fraction of the em size
      val (aTop, bTop) = (a.y + asc * a.size, b.y + asc * b.size)
      val ov = math.min(aTop, bTop) - math.max(a.y, b.y)
      val minH = asc * math.min(a.size, b.size)
      minH > 0 && ov > 0.5 * minH
    }
    sorted.foreach { f =>
      if (out.nonEmpty && (math.abs(out.last.last.y - f.y) <= Tol ||
        overlaps(out.last.last, f))) out.last += f
      else out += ArrayBuffer(f)
    }
    out.map(_.toSeq).toSeq
  }

  /** Join one baseline's fragments in STREAM order — pdfminer's
    * LTTextLine.add walks chars as the content stream painted them and
    * never re-sorts, so a stray OCR glyph drawn after a word but
    * positioned left of it lands at the END of the line's text (the
    * reference's main.db keeps exactly that order). A space is inserted
    * across forward gaps: the word-margin fraction of the em size for
    * width-resolved runs (pdfminer's word_margin semantics), a coarse
    * absolute threshold when the run's advance was estimated (sub-point
    * estimate errors must not fabricate spaces).
    */
  private[ingest] def joinFrags(frags: Seq[TextFrag],
      boundaries: Seq[Double] = Nil): String = {
    // Border-artifact glyphs: a scanned table's rules OCR into stray
    // 1-2 char runs sitting exactly on a grid boundary. pdfminer's
    // layout analysis exiles them into their own textboxes, which trail
    // the main flow when camelot concatenates a cell's textlines — the
    // reference artifact has them LAST in every observable instance
    // ("OP200  (", "Analog Devices  I"). Defer them to the line's end.
    val ordSorted = frags.sortBy(_.ord)
    val (main, stray) =
      if (boundaries.isEmpty) (ordSorted, Seq.empty[TextFrag])
      else ordSorted.partition(f => !(f.text.trim.length <= 2 &&
        boundaries.exists(b => math.abs(f.xMin - b) < 4.0)))
    val sb = new StringBuilder
    var prevEnd = Double.NaN
    (main ++ stray).foreach { f =>
      val margin = if (f.est) 2.5 else math.max(0.5, 0.1 * f.size)
      if (sb.nonEmpty && f.xMin - prevEnd > margin && !sb.last.isWhitespace)
        sb += ' '
      sb ++= f.text
      prevEnd = f.xMax
    }
    sb.toString.replaceAll("\\s+", " ").trim
  }

  /** Camelot-lattice grid detection over painted boxes + positioned text:
    * thin boxes are rules, intersecting rules union into grid components,
    * each >= 2x2 component becomes a table with clustered boundaries.
    */
  private[ingest] def detectTables(texts: Seq[TextFrag], boxes: Seq[Box]): Seq[Table] = {
    // (lo, hi, pos): lo..hi along the rule, pos on the perpendicular axis
    val hs = new ArrayBuffer[(Double, Double, Double)]
    val vs = new ArrayBuffer[(Double, Double, Double)]
    // shading-band borders: excluded from grid geometry, consulted
    // only when computing per-cell edge presence below
    val shadeH = new ArrayBuffer[(Boolean, Double, Double, Double)]
    val shadeV = new ArrayBuffer[(Boolean, Double, Double, Double)]
    boxes.foreach { b =>
      if (b.shade) {
        if (b.h <= Tol && b.w > 4) shadeH += ((true, b.x, b.x + b.w, b.y + b.h / 2))
        else if (b.w <= Tol && b.h > 4) shadeV += ((false, b.y, b.y + b.h, b.x + b.w / 2))
      }
      // stroked frames arrive pre-split into four thin borders (paint)
      else if (b.h <= Tol && b.w > 4) hs += ((b.x, b.x + b.w, b.y + b.h / 2))
      else if (b.w <= Tol && b.h > 4) vs += ((b.y, b.y + b.h, b.x + b.w / 2))
    }
    if (hs.length + vs.length > MaxRules) return Seq.empty
    // lines(i): (isH, lo, hi, pos)
    val lines = (hs.map(t => (true, t._1, t._2, t._3)) ++
      vs.map(t => (false, t._1, t._2, t._3))).toIndexedSeq
    val parent = Array.tabulate(lines.length)(identity)
    def find(a: Int): Int = {
      var x = a
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    def union(a: Int, b: Int): Unit = {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    for (i <- lines.indices; j <- (i + 1) until lines.length) {
      val li = lines(i); val lj = lines(j)
      if (li._1 == lj._1) {
        // collinear segments: same offset, extents within a small join
        // gap -> one rule (rules arrive as dashed/segmented pieces; a
        // morphological detector closes these gaps too)
        if (math.abs(li._4 - lj._4) <= Tol &&
          !(li._3 < lj._2 - SegJoinGap || lj._3 < li._2 - SegJoinGap))
          union(i, j)
      } else {
        val h = if (li._1) li else lj
        val v = if (li._1) lj else li
        if (h._2 - Tol <= v._4 && v._4 <= h._3 + Tol &&
          v._2 - Tol <= h._4 && h._4 <= v._3 + Tol) union(i, j)
      }
    }
    val comps = lines.indices.groupBy(find)
    val tables = comps.values.flatMap { comp =>
      val ys0 = cluster(comp.filter(lines(_)._1).map(lines(_)._4).sorted)
      val xs = cluster(comp.filterNot(lines(_)._1).map(lines(_)._4).sorted)
      // a shading-band border spanning the FULL table width is a row
      // boundary a raster line detector (camelot's) sees even though no
      // rule was stroked there — typically the header band's bottom
      // edge. Admit those positions as boundaries AFTER clustering:
      // full-width edges cannot create phantom column splits, and the
      // span-shift + copy_text machinery reassembles any cell a band
      // legitimately crosses. Partial-width shading stays edge-flag
      // evidence only.
      val ys =
        if (ys0.length < 2 || xs.length < 2) ys0
        else {
          val fullWidth = shadeH.filter { s =>
            s._4 > ys0.head + Tol && s._4 < ys0.last - Tol &&
              s._2 <= xs.head + Tol && s._3 >= xs.last - Tol &&
              ys0.forall(y => math.abs(y - s._4) > Tol)
          }.map(_._4)
          if (fullWidth.isEmpty) ys0
          else cluster((ys0 ++ fullWidth).sorted)
        }
      if (ys.length < 2 || xs.length < 2) None
      else {
        val nRows = ys.length - 1; val nCols = xs.length - 1
        // per-edge rule presence, from this component's own segments:
        // hEdge(k)(c) = a rule runs along y band boundary ys(k) over
        // column band c; vEdge(j)(r) likewise for x boundary xs(j)
        // edge presence consults the component's own rules PLUS any
        // shading-band borders inside this table's bbox: shading can
        // only CONFIRM a boundary the real rules already clustered
        // (hAt/vAt bucket by |pos − boundary| ≤ 2·Tol), never create
        // one — grid geometry above never saw the shading
        val hSegs = comp.filter(lines(_)._1).map(lines(_)) ++
          shadeH.filter(s => s._4 >= ys.head - Tol && s._4 <= ys.last + Tol &&
            s._2 <= xs.last + Tol && s._3 >= xs.head - Tol)
        val vSegs = comp.filterNot(lines(_)._1).map(lines(_)) ++
          shadeV.filter(s => s._4 >= xs.head - Tol && s._4 <= xs.last + Tol &&
            s._2 <= ys.last + Tol && s._3 >= ys.head - Tol)
        // bucket segments per boundary once, then test coverage per
        // band — O(B·S + B·C·s̄) instead of O(B·C·S)
        val hAt = Array.tabulate(ys.length)(k =>
          hSegs.filter(s => math.abs(s._4 - ys(k)) <= Tol * 2))
        val vAt = Array.tabulate(xs.length)(j =>
          vSegs.filter(s => math.abs(s._4 - xs(j)) <= Tol * 2))
        val hEdge = Array.tabulate(ys.length, nCols)((k, c) =>
          edgeCovered(hAt(k), xs(c), xs(c + 1)))
        val vEdge = Array.tabulate(xs.length, nRows)((j, r) =>
          edgeCovered(vAt(j), ys(r), ys(r + 1)))
        // camelot's per-cell border flags in OUTPUT coordinates (row i
        // top-first, col c): band r = nRows - 1 - i. Precomputed as
        // matrices — the shift walk below runs per text fragment.
        def top(i: Int, c: Int) = hEdge(nRows - i)(c)
        def left(i: Int, c: Int) = vEdge(c)(nRows - 1 - i)
        // camelot cell.set_span: a 3-bounded cell missing one h edge
        // spans horizontally, missing one v edge spans vertically; a
        // 2-bounded cell spans along its bounded axis
        val hspanM = Array.tabulate(nRows, nCols) { (i, c) =>
          val t = top(i, c); val b = hEdge(nRows - 1 - i)(c)
          val l = left(i, c); val r = vEdge(c + 1)(nRows - 1 - i)
          val bound = (if (t) 1 else 0) + (if (b) 1 else 0) +
            (if (l) 1 else 0) + (if (r) 1 else 0)
          (bound == 3 && t && b && (!l || !r)) || (bound == 2 && t && b)
        }
        val vspanM = Array.tabulate(nRows, nCols) { (i, c) =>
          val t = top(i, c); val b = hEdge(nRows - 1 - i)(c)
          val l = left(i, c); val r = vEdge(c + 1)(nRows - 1 - i)
          val bound = (if (t) 1 else 0) + (if (b) 1 else 0) +
            (if (l) 1 else 0) + (if (r) 1 else 0)
          (bound == 3 && l && r && (!t || !b)) || (bound == 2 && l && r)
        }
        def hspan(i: Int, c: Int): Boolean = hspanM(i)(c)
        def vspan(i: Int, c: Int): Boolean = vspanM(i)(c)
        // a row with NO interior vertical edge at all is not a merged
        // cell — it is an unbordered row (scans drop the dividers of a
        // lone data row between two band rows; band headers legitimately
        // span). Shifting such a row left would melt every cell into
        // column 0 and destroy the row; the reference's committed
        // artifact keeps these rows split by the table's column grid
        // (main.db's 2007 AT22V10/HCPL rows), so text assignment stays
        // geometric and only PARTIALLY bordered rows shift.
        val unborderedRow = Array.tabulate(nRows) { i =>
          (1 until nCols).forall(j => !vEdge(j)(nRows - 1 - i))
        }
        val grid = scala.collection.mutable.Map
          .empty[(Int, Int), ArrayBuffer[TextFrag]]
        texts.foreach { t =>
          if (t.text.trim.nonEmpty) {
            // assign by estimated CENTER: a run that starts a hair left
            // of a rule (small-caps splits) still belongs to the cell
            // holding most of it
            val ci = bucket(xs, (t.xMin + t.xMax) / 2)
            val ri = bucket(ys, t.y)
            if (ci >= 0 && ri >= 0) {
              // camelot shift_text=['l','t'] (lattice.py _reduce_index,
              // the defaults the reference inherits): text landing in a
              // spanning cell is credited to the span ROOT — walk left
              // to a left-bounded cell, then up to a top-bounded one.
              // This is what turns a wrapped line inside a vertically
              // merged cell into ONE joined cell value instead of a
              // stray fragment in the continuation band below.
              var i = nRows - 1 - ri; var c = ci
              if (hspan(i, c) && !unborderedRow(i))
                while (c > 0 && !left(i, c)) c -= 1
              if (vspan(i, c)) while (i > 0 && !top(i, c)) i -= 1
              grid.getOrElseUpdate((nRows - 1 - i, c), new ArrayBuffer) += t
            }
          }
        }
        if (grid.isEmpty) None
        else {
          // pdf y grows upward: top row of the table is the LAST y band
          val txt = Array.tabulate(nRows, nCols) { (i, c) =>
            // wrapped lines keep their newline, like a rendered cell:
            // downstream header mapping strips it (tables.py:178) and
            // the R19 abbreviation parser SPLITS on it
            grid.get((nRows - 1 - i, c)).fold("") { frags =>
              lineGroups(frags.toSeq).map(joinFrags(_, xs))
                .mkString("\n").trim
            }
          }
          if (CopyTextV) {
            // camelot's copy_text=['v'] (the reference always passes it,
            // tables.py:54; lattice.py _copy_spanning_text): an EMPTY
            // vertically-spanning cell with no top rule inherits the
            // text of the cell above; top-first iteration cascades the
            // value down multi-row merges exactly like camelot's
            // ascending-row walk.
            var i = 1
            while (i < nRows) {
              var c = 0
              while (c < nCols) {
                if (txt(i)(c).isEmpty && vspan(i, c) && !top(i, c))
                  txt(i)(c) = txt(i - 1)(c)
                c += 1
              }
              i += 1
            }
          }
          Some(Table(xs.head, ys.head, xs.last, ys.last,
            txt.map(_.toVector).toVector))
        }
      }
    }.toSeq
    tables.sortBy(-_.top)
  }

  private def cluster(sorted: Seq[Double]): IndexedSeq[Double] = {
    val groups = new ArrayBuffer[ArrayBuffer[Double]]
    sorted.foreach { v =>
      if (groups.nonEmpty && v - groups.last.last <= Tol) groups.last += v
      else groups += ArrayBuffer(v)
    }
    groups.map(g => g.sum / g.length).toIndexedSeq
  }

  /** True when the given boundary's rule segments (pre-filtered to the
    * boundary position within 2·Tol — segment positions may sit up to
    * Tol either side of the clustered centroid) cover at least half of
    * [lo, hi]. Interval-union sweep, so an edge assembled from several
    * dashed pieces counts once.
    */
  private def edgeCovered(segs: Seq[(Boolean, Double, Double, Double)],
      lo: Double, hi: Double): Boolean = {
    val iv = segs.iterator
      .map(s => (math.max(s._2, lo), math.min(s._3, hi)))
      .filter(p => p._2 > p._1).toArray.sortBy(_._1)
    var tot = 0.0; var cur = lo
    iv.foreach { case (a, b) =>
      if (b > cur) { tot += b - math.max(a, cur); cur = b }
    }
    tot >= (hi - lo) * 0.5
  }

  private def bucket(bounds: IndexedSeq[Double], v: Double): Int = {
    var i = 0
    while (i < bounds.length - 1) {
      if (bounds(i) <= v && v < bounds(i + 1)) return i
      i += 1
    }
    -1
  }

  // ------------------------------------------------------------ page walk

  private val RootRef = """/Root\s+(\d+)\s+\d+\s+R""".r
  private val PagesRef = """/Pages\s+(\d+)\s+\d+\s+R""".r
  private val KidsArr = """(?s)/Kids\s*\[(.*?)\]""".r
  private val Ref = """(\d+)\s+0\s+R""".r
  private val ContentsRefs = """(?s)/Contents\s*(\[.*?\]|\d+\s+\d+\s+R)""".r

  private def fetchObj(data: Array[Byte], s: String, n: Int): Option[String] =
    PdfMeta.rawObject(s, n).orElse(PdfMeta.objStreamObject(data, s, n))

  /** Page dictionaries in document order: /Root -> /Pages -> /Kids walk,
    * falling back to byte-order /Type /Page scan when the tree is
    * unresolvable.
    */
  private[graft] def pageDicts(data: Array[Byte]): Seq[String] = {
    val s = PdfMeta.latin1(data)
    val viaTree = for {
      rootN <- RootRef.findAllMatchIn(s).map(_.group(1).toInt).toSeq.lastOption
      root <- fetchObj(data, s, rootN)
      pagesN <- PagesRef.findFirstMatchIn(root).map(_.group(1).toInt)
    } yield {
      val out = new ArrayBuffer[String]
      def walk(n: Int, depth: Int): Unit = if (depth < 64) {
        fetchObj(data, s, n).foreach { d =>
          if (d.contains("/Kids"))
            KidsArr.findFirstMatchIn(d).foreach { m =>
              Ref.findAllMatchIn(m.group(1)).foreach(r =>
                walk(r.group(1).toInt, depth + 1))
            }
          else if (d.contains("/Page")) out += d
        }
      }
      walk(pagesN, 0)
      out.toSeq
    }
    viaTree.filter(_.nonEmpty).getOrElse {
      """(\d+)\s+0\s+obj""".r.findAllMatchIn(s).flatMap { m =>
        val end = s.indexOf("endobj", m.end)
        if (end < 0) None
        else {
          val body = s.substring(m.end, end)
          val dictEnd = body.indexOf("stream")
          val dict = if (dictEnd >= 0) body.substring(0, dictEnd) else body
          if ("""/Type\s*/Page\b""".r.findFirstIn(dict).isDefined &&
            !dict.contains("/Kids")) Some(dict)
          else None
        }
      }.toSeq
    }
  }

  /** Concatenated, decoded content bytes of one page. */
  /** Dev-tool alias for [[pageContent]] (graft.tools.ParityDiag). */
  private[graft] def pageContentDebug(data: Array[Byte],
      pageDict: String): Array[Byte] = pageContent(data, pageDict)

  private[ingest] def pageContent(data: Array[Byte], pageDict: String): Array[Byte] = {
    val s = PdfMeta.latin1(data)
    val refs = ContentsRefs.findFirstMatchIn(pageDict).toSeq
      .flatMap(m => Ref.findAllMatchIn(m.group(1)).map(_.group(1).toInt))
    val out = new java.io.ByteArrayOutputStream()
    refs.foreach { n =>
      // last match wins: incremental updates append replacement
      // objects, and the newest generation is the live one (the same
      // last-trailer-wins policy as PdfMeta.rawObject)
      ("""(?:^|[^0-9])""" + n + """\s+0\s+obj\b""").r
        .findAllMatchIn(s).toSeq.lastOption
        .foreach { m =>
          val st = s.indexOf("stream", m.end)
          val end = s.indexOf("endobj", m.end)
          if (st >= 0 && (end < 0 || st < end)) {
            val dict = s.substring(m.end, st)
            var s0 = st + "stream".length
            if (s0 + 1 < s.length && s.charAt(s0) == '\r' &&
              s.charAt(s0 + 1) == '\n') s0 += 2
            else if (s0 < s.length && s.charAt(s0) == '\n') s0 += 1
            val se = s.indexOf("endstream", s0)
            if (se >= 0) {
              if (dict.contains("/FlateDecode"))
                PdfMeta.inflate(data, s0, se).foreach { b =>
                  out.write(b); out.write('\n')
                }
              else if (!dict.contains("/Filter")) {
                out.write(data, s0, se - s0); out.write('\n')
              } // other filters (LZW/DCT/...): skip — not table vectors
            }
          }
        }
    }
    out.toByteArray
  }

  // ----------------------------------------------- raster (JBIG2) rules

  private val ResourcesRefRe = """/Resources\s+(\d+)\s+0\s+R""".r
  private val XObjPairRe = """/([^\s/<>\[\]()]+)\s+(\d+)\s+0\s+R""".r

  /** The /XObject name -> object-number map of a page: inline
    * /Resources<</XObject<<...>>>> or an indirect /Resources object.
    */
  private def xobjectRefs(data: Array[Byte], s: String,
      pageDict: String): Map[String, Int] = {
    val res =
      if (pageDict.contains("/XObject")) Some(pageDict)
      else ResourcesRefRe.findFirstMatchIn(pageDict)
        .flatMap(m => fetchObj(data, s, m.group(1).toInt))
    res.flatMap { r =>
      val i = r.indexOf("/XObject")
      if (i < 0) None
      else {
        val open = r.indexOf("<<", i)
        if (open < 0) None
        else {
          // bracket-match the XObject dict (values are plain refs)
          var depth = 0; var j = open; var end = -1
          while (j < r.length - 1 && end < 0) {
            if (r.charAt(j) == '<' && r.charAt(j + 1) == '<') {
              depth += 1; j += 2
            } else if (r.charAt(j) == '>' && r.charAt(j + 1) == '>') {
              depth -= 1; j += 2; if (depth == 0) end = j
            } else j += 1
          }
          if (end < 0) None else Some(r.substring(open, end))
        }
      }
    }.map { body =>
      XObjPairRe.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toInt).toMap
    }.getOrElse(Map.empty)
  }

  /** Raw (undecoded) stream bytes + decoded page bitmap of a
    * CCITTFaxDecode (K < 0, pure G4) image XObject; None for any other
    * object or an out-of-profile stream.
    */
  /** Dev-tool alias (graft.tools.ParityDiag). */
  private[graft] def ccittBitmapDebug(data: Array[Byte], s: String,
      n: Int): Option[Jbig2.Bitmap] = ccittBitmap(data, s, n)

  private def ccittBitmap(data: Array[Byte], s: String,
      n: Int): Option[Jbig2.Bitmap] =
    ("""(?:^|[^0-9])""" + n + """\s+0\s+obj\b""").r
      .findAllMatchIn(s).toSeq.lastOption.flatMap { m =>
        val st = s.indexOf("stream", m.end)
        val end = s.indexOf("endobj", m.end)
        if (st < 0 || (end >= 0 && st > end)) None
        else {
          val dict = s.substring(m.end, st)
          if (!dict.contains("/CCITTFaxDecode")) None
          else for {
            k <- """/K\s+(-?\d+)""".r.findFirstMatchIn(dict)
              .map(_.group(1).toInt)
            if k < 0 // pure T.6; K>=0 (G3) does not occur in the corpus
            cols <- """/Columns\s+(\d+)""".r.findFirstMatchIn(dict)
              .map(_.group(1).toInt)
            rows <- """/Rows\s+(\d+)""".r.findFirstMatchIn(dict)
              .map(_.group(1).toInt)
              .orElse("""/Height\s+(\d+)""".r.findFirstMatchIn(dict)
                .map(_.group(1).toInt))
            bytes <- {
              var s0 = st + "stream".length
              if (s0 + 1 < s.length && s.charAt(s0) == '\r' &&
                s.charAt(s0 + 1) == '\n') s0 += 2
              else if (s0 < s.length && s.charAt(s0) == '\r') s0 += 1
              else if (s0 < s.length && s.charAt(s0) == '\n') s0 += 1
              val se = s.indexOf("endstream", s0)
              if (se < 0) None
              else Some(java.util.Arrays.copyOfRange(data, s0, se))
            }
            bm <- CcittG4.decode(bytes, cols, rows)
          } yield {
            // polarity: the structural runs say which pixels the CODER
            // called black, but /BlackIs1 (sample mapping) and /Decode
            // [1 0] (component inversion) can each flip what RENDERS as
            // ink — 2005-b stacks both, rendering structural white as
            // ink. A scanned text page is always mostly background, so
            // resolve the convention stack empirically: majority color
            // is paper.
            var ink = 0L
            bm.bits.foreach(v => if (v != 0) ink += 1)
            if (ink * 2 > bm.bits.length.toLong) {
              var i = 0
              while (i < bm.bits.length) {
                bm.bits(i) = (1 - bm.bits(i)).toByte; i += 1
              }
            }
            bm
          }
        }
      }

  /** Raw (undecoded) stream bytes + /Width /Height of a JBIG2-filtered
    * image XObject; None for any other object.
    */
  private def jbig2Stream(data: Array[Byte], s: String,
      n: Int): Option[(Int, Int, Array[Byte])] =
    ("""(?:^|[^0-9])""" + n + """\s+0\s+obj\b""").r
      .findAllMatchIn(s).toSeq.lastOption.flatMap { m =>
        val st = s.indexOf("stream", m.end)
        val end = s.indexOf("endobj", m.end)
        if (st < 0 || (end >= 0 && st > end)) None
        else {
          val dict = s.substring(m.end, st)
          if (!dict.contains("/JBIG2Decode")) None
          else for {
            w <- """/Width\s+(\d+)""".r.findFirstMatchIn(dict)
              .map(_.group(1).toInt)
            h <- """/Height\s+(\d+)""".r.findFirstMatchIn(dict)
              .map(_.group(1).toInt)
            bytes <- {
              var s0 = st + "stream".length
              if (s0 + 1 < s.length && s.charAt(s0) == '\r' &&
                s.charAt(s0 + 1) == '\n') s0 += 2
              else if (s0 < s.length && s.charAt(s0) == '\n') s0 += 1
              val se = s.indexOf("endstream", s0)
              if (se < 0) None
              else Some(java.util.Arrays.copyOfRange(data, s0, se))
            }
          } yield (w, h, bytes)
        }
      }

  /** Rules mined from a page's JBIG2 raster images (scanned pages draw
    * their table grid as pixels, not vector strokes): decode each
    * placed JBIG2 XObject, extract long horizontal/vertical runs, and
    * map them through the CTM active at the image's `Do` into the same
    * device space the vector rules live in. The unit image square maps
    * pixel (px, py) to ((px+.5)/w, 1-(py+.5)/h) — image row 0 is the
    * TOP, device y grows UP. Fail-closed per image: an undecodable or
    * out-of-profile stream contributes nothing.
    */
  private def jbig2Boxes(data: Array[Byte], s: String, pageDict: String,
      places: Seq[(String, Mat)]): Seq[Box] = {
    if (places.isEmpty) return Seq.empty
    val xobjs = xobjectRefs(data, s, pageDict)
    if (xobjs.isEmpty) return Seq.empty
    places.flatMap { case (nm, m) =>
      (for {
        n <- xobjs.get(nm)
        bm <- jbig2Stream(data, s, n)
          .flatMap { case (w, h, bytes) => Jbig2.decodePage(bytes, w, h) }
          .orElse(ccittBitmap(data, s, n))
      } yield {
        val (w, h) = (bm.w, bm.h)
        val (hs, vs) = Jbig2.rules(bm)
        def dev(px: Double, py: Double): (Double, Double) =
          m((px + 0.5) / w, 1.0 - (py + 0.5) / h)
        val hb = hs.map { case (x0, x1, y) =>
          val (dx0, dy0) = dev(x0, y); val (dx1, dy1) = dev(x1, y)
          Box(math.min(dx0, dx1), math.min(dy0, dy1),
            math.abs(dx1 - dx0), math.abs(dy1 - dy0))
        }
        val vb = vs.map { case (y0, y1, x) =>
          val (dx0, dy0) = dev(x, y0); val (dx1, dy1) = dev(x, y1)
          Box(math.min(dx0, dx1), math.min(dy0, dy1),
            math.abs(dx1 - dx0), math.abs(dy1 - dy0))
        }
        hb ++ vb
      }).getOrElse(Seq.empty)
    }
  }

  // ------------------------------------------------------------ public API

  private val RotateRe = """/Rotate\s+(\d+)""".r
  private val MediaBoxRe =
    """/MediaBox\s*\[\s*([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)""".r

  /** Undo a page's `/Rotate` so extraction always sees upright reading
    * coordinates: a landscape table on a /Rotate 90 portrait page is
    * drawn with vertical baselines in content space — after this
    * transform, its rules are axis-aligned and its text reads
    * left-to-right again. (`(x, y) -> (y, W - x)` maps the content
    * space onto the clockwise-displayed sheet; 180/270 analogous.)
    */
  private def normalizePage(pd: String, texts: Seq[TextFrag],
      boxes: Seq[Box]): (Seq[TextFrag], Seq[Box]) = {
    val declared = RotateRe.findFirstMatchIn(pd)
      .map(_.group(1).toInt % 360).getOrElse(0)
    // Some files draw a landscape table with rotated text matrices on a
    // page whose /Rotate is 0 (the sheet is meant to be turned by the
    // reader). Detect it from the text itself: when most runs advance
    // vertically, normalize as if the page carried the matching Rotate.
    val rot =
      if (declared != 0) declared
      else {
        val dirs = texts.filter(t => t.text.trim.nonEmpty)
        val vertical = dirs.count(t =>
          math.abs(t.yEnd - t.y) > math.abs(t.xEnd - t.x))
        if (dirs.length >= 10 && vertical * 10 > dirs.length * 6) {
          val up = dirs.count(t => t.yEnd > t.y)
          if (up * 2 >= vertical) 90 else 270
        } else 0
      }
    if (rot == 0) (texts, boxes)
    else {
      val (w, h) = MediaBoxRe.findFirstMatchIn(pd)
        .map(m => (m.group(3).toDouble - m.group(1).toDouble,
          m.group(4).toDouble - m.group(2).toDouble))
        .getOrElse((612.0, 792.0))
      def pt(x: Double, y: Double): (Double, Double) = rot match {
        case 90 => (y, w - x)
        case 180 => (w - x, h - y)
        case 270 => (h - y, x)
        case _ => (x, y)
      }
      val ts = texts.map { t =>
        val (x0, y0) = pt(t.x, t.y); val (x1, y1) = pt(t.xEnd, t.yEnd)
        TextFrag(x0, y0, x1, y1, t.text, t.ord, t.size, t.est)
      }
      val bs = boxes.map { b =>
        val (x0, y0) = pt(b.x, b.y); val (x1, y1) = pt(b.x + b.w, b.y + b.h)
        Box(math.min(x0, x1), math.min(y0, y1),
          math.abs(x1 - x0), math.abs(y1 - y0), b.shade)
      }
      (ts, bs)
    }
  }

  /** Coalesce same-baseline runs that touch (gap under ~a point) into
    * one fragment: a small-caps word renders its capital as a separate
    * larger-font run whose lone center can drift across a rule — glued
    * to its tail it lands in the right cell, and line joining stops
    * inventing a space inside the word.
    */
  private def coalesceFrags(texts: Seq[TextFrag]): Seq[TextFrag] =
    lineGroups(texts).flatMap { line =>
      // stream order, like pdfminer's char walk: glue a run onto its
      // stream-predecessor only when it also CONTINUES it in x — a
      // later run that jumps backwards (stray OCR glyph) stays its own
      // fragment so cell assignment still sees its true position
      val sorted = line.sortBy(_.ord)
      val out = new ArrayBuffer[TextFrag]
      sorted.foreach { f =>
        if (out.nonEmpty && f.xMin - out.last.xMax < 1.5 &&
          f.xMin >= out.last.xMin) {
          val p = out.last
          out(out.length - 1) = TextFrag(p.x, p.y,
            math.max(p.xMax, f.xMax), p.yEnd, p.text + f.text, p.ord,
            math.max(p.size, f.size), p.est || f.est)
        } else out += f
      }
      out
    }

  // Executor-local parse cache: several queries (cells, rad ingest,
  // abbreviation mining) walk the same corpus in one session, and the
  // extraction is a pure function of the bytes. Keyed by content hash,
  // bounded with access-stamped eviction: at the cap the LEAST
  // recently used half is dropped, so a working set one entry over the
  // cap keeps its hot entries (a wholesale clear would recompute
  // everything behind it at a million-PDF corpus). At cluster scale
  // this is a per-executor working set, not a corpus mirror.
  private val parseCache = scala.collection.concurrent.TrieMap
    .empty[(Long, Int), (Seq[PageExtract], java.util.concurrent.atomic.AtomicLong)]
  private[graft] val ParseCacheCap = 256
  private val parseTick = new java.util.concurrent.atomic.AtomicLong(0L)

  private def evictColdHalf(): Unit = {
    val entries = parseCache.toArray
    if (entries.length >= ParseCacheCap) {
      entries.sortBy(_._2._2.get()).take(entries.length / 2)
        .foreach(e => parseCache.remove(e._1))
    }
  }

  private def cacheKey(data: Array[Byte]): (Long, Int) =
    (scala.util.hashing.MurmurHash3.bytesHash(data).toLong, data.length)

  /** Test hook: is this document's extraction currently cached? */
  private[graft] def parseCacheHas(data: Array[Byte]): Boolean =
    parseCache.contains(cacheKey(data))

  /** Full per-page extraction (text fragments + detected tables) in
    * document order. Per-page and total-failure safe: a malformed page
    * or file yields nothing, never an exception (the scan must survive
    * a corrupt input).
    */
  def pages(data: Array[Byte]): Seq[PageExtract] = {
    val key = cacheKey(data)
    parseCache.get(key) match {
      case Some((hit, stamp)) =>
        stamp.set(parseTick.incrementAndGet()); hit
      case None =>
        val out = Try {
          // one latin1 materialization per DOCUMENT (2 bytes/char of
          // the whole file) — not per page; every page below regex-
          // scans this same string
          lazy val latin1Str = PdfMeta.latin1(data)
          pageDicts(data).zipWithIndex.map { case (pd, pi) =>
            Try {
              val (rawTexts, rawBoxes, places) =
                interpret(pageContent(data, pd),
                  Try(pageFonts(data, latin1Str, pd)).getOrElse(Map.empty))
              val rasterBoxes = jbig2Boxes(data, latin1Str, pd, places)
              val (normTexts, boxes) =
                normalizePage(pd, rawTexts, rawBoxes ++ rasterBoxes)
              val texts = coalesceFrags(normTexts)
              PageExtract(pi + 1, texts, detectTables(texts, boxes))
            }.getOrElse(PageExtract(pi + 1, Seq.empty, Seq.empty))
          }
        }.getOrElse(Seq.empty)
        if (parseCache.size >= ParseCacheCap) evictColdHalf()
        parseCache.putIfAbsent(key,
          (out, new java.util.concurrent.atomic.AtomicLong(
            parseTick.incrementAndGet())))
        out
    }
  }

  /** Debug hook (dev tools only): one page's normalized fragments and
    * boxes, as `detectTables` sees them. Bypasses the parse cache.
    */
  private[graft] def debugPage(data: Array[Byte], page: Int)
      : (Seq[TextFrag], Seq[Box]) = {
    lazy val latin1Str = PdfMeta.latin1(data)
    pageDicts(data).zipWithIndex.collectFirst {
      case (pd, pi) if pi + 1 == page =>
        val (rawTexts, rawBoxes, places) = interpret(pageContent(data, pd),
          Try(pageFonts(data, latin1Str, pd)).getOrElse(Map.empty))
        val rasterBoxes = jbig2Boxes(data, latin1Str, pd, places)
        val (normTexts, boxes) = normalizePage(pd, rawTexts,
          rawBoxes ++ rasterBoxes)
        (coalesceFrags(normTexts), boxes)
    }.getOrElse((Seq.empty, Seq.empty))
  }

  /** All ruled tables of one PDF:
    * (page 1-based, tableIdx top-first, cells top-first rows).
    */
  def tablesOf(data: Array[Byte]): Seq[(Int, Int, Vector[Vector[String]])] =
    pages(data).flatMap(p => p.tables.zipWithIndex.map { case (t, ti) =>
      (p.page, ti, t.cells)
    })

  /** The cell frame over a docs directory:
    * (file_name, page, table_idx, row_idx, col_idx, cell). Whole files
    * stay task-local inside mapPartitions; only cells move.
    */
  def cells(s: org.apache.spark.sql.SparkSession, docsDir: String):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_extract}
    import s.implicits._
    BinaryIngest.scan(s, docsDir)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (name, bytes) =>
        tablesOf(bytes).iterator.flatMap { case (page, ti, rows) =>
          rows.iterator.zipWithIndex.flatMap { case (r, ri) =>
            r.iterator.zipWithIndex.map { case (cell, ci) =>
              (name, page, ti, ri, ci, cell)
            }
          }
        }
      })
      .toDF("file_name", "page", "table_idx", "row_idx", "col_idx", "cell")
  }
}
