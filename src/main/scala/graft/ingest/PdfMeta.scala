package graft.ingest

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16BE}

/** PDF document-information metadata (Title / ModDate) from raw bytes —
  * the PDF-internal half of R4 (tables.py:67-76 opens each file; the
  * reference reads file-level metadata only, but a real intake wants the
  * document's own Info dictionary). No PDF library exists in the
  * container, so this is an honest minimal parser of the container
  * format itself (ISO 32000): follow the trailer's `/Info N 0 R`
  * reference to object N, reading it either as a classic uncompressed
  * body object or out of a Flate-compressed object stream (`/ObjStm`,
  * §7.5.7) via the JDK Inflater — both layouts occur in the reference's
  * own corpus. Strings decode per §7.9.2: literal `(...)` with
  * `\( \) \\` escapes or hex `<...>`, UTF-16BE when BOM-prefixed, else
  * PDFDocEncoding (mapped here as Latin-1).
  *
  * Everything is bytes-local to one file, so the Spark side runs it
  * inside `mapPartitions` over the `binaryFile` source: whole files are
  * task-local, only the extracted fields ever move.
  */
object PdfMeta {

  /** The bytes as a 1:1 char-per-byte string, so java.util.regex can
    * address binary offsets without corrupting non-ASCII bytes.
    */
  private[ingest] def latin1(data: Array[Byte]): String = new String(data, ISO_8859_1)

  /** Inflate a raw Flate stream; None on corrupt/truncated input. */
  private[ingest] def inflate(data: Array[Byte], from: Int, until: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data, from, until - from)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stuck (needs dict)
      }
      if (out.size() == 0) None else Some(out.toByteArray)
    } catch { case _: Exception => None }
    finally inf.end()
  }

  private val infoRef = """/Info\s+(\d+)\s+\d+\s+R""".r
  private val objStart = """(\d+)\s+0\s+obj\b""".r

  /** The /Info dictionary's bytes (as a latin1 string), or None. The
    * LAST `/Info` reference wins — incremental updates append, and the
    * newest trailer is the live one.
    */
  private[ingest] def infoDict(data: Array[Byte]): Option[String] = {
    val s = latin1(data)
    val refs = infoRef.findAllMatchIn(s).map(_.group(1).toInt).toSeq
    refs.lastOption.flatMap { n =>
      rawObject(s, n).orElse(objStreamObject(data, s, n))
    }
  }

  /** Classic layout: `N 0 obj ... endobj` in the raw bytes. The LAST
    * match wins: an incrementally-updated PDF appends replacement
    * objects, and taking the first would resurrect the oldest
    * generation while [[infoDict]] deliberately follows the NEWEST
    * trailer's /Info ref (last-trailer-wins must be consistent).
    */
  private[ingest] def rawObject(s: String, n: Int): Option[String] =
    ("""(?s)(?:^|[^0-9])""" + n + """\s+0\s+obj\b(.*?)endobj""").r
      .findAllMatchIn(s).toSeq.lastOption.map(_.group(1))

  /** Cross-reference-stream layout: object N lives inside a compressed
    * `/ObjStm`. Each stream's header (before `/First`) is pairs of
    * (object number, offset into the decompressed body).
    */
  private[ingest] def objStreamObject(data: Array[Byte], s: String, n: Int): Option[String] = {
    val first = """/First\s+(\d+)""".r
    objStart.findAllMatchIn(s).flatMap { m =>
      val st = s.indexOf("stream", m.end)
      if (st < 0) Iterator.empty
      else {
        val dict = s.substring(m.end, st)
        if (!dict.contains("/ObjStm")) Iterator.empty
        else first.findFirstMatchIn(dict).iterator.flatMap { fm =>
          var s0 = st + "stream".length
          if (s0 + 1 < s.length && s.charAt(s0) == '\r' && s.charAt(s0 + 1) == '\n') s0 += 2
          else if (s0 < s.length && s.charAt(s0) == '\n') s0 += 1
          val se = s.indexOf("endstream", s0)
          if (se < 0) Iterator.empty
          else inflate(data, s0, se).iterator.flatMap { blob =>
            val firstOff = fm.group(1).toInt
            val body = latin1(blob)
            val hdr = body.take(firstOff).trim.split("""\s+""").filter(_.nonEmpty)
            val pairs = hdr.grouped(2).collect {
              case Array(num, off) if num.forall(_.isDigit) && off.forall(_.isDigit) =>
                (num.toInt, off.toInt)
            }.toArray
            pairs.indices.find(i => pairs(i)._1 == n).map { i =>
              val from = firstOff + pairs(i)._2
              val until =
                if (i + 1 < pairs.length) firstOff + pairs(i + 1)._2 else body.length
              body.substring(from, math.min(until, body.length))
            }.iterator
          }
        }
      }
    }.nextOption()
  }

  /** A named string field of a dictionary: literal or hex form. */
  private[ingest] def field(dict: String, name: String): Option[String] =
    fieldRaw(dict, name).map(decode)

  /** Same, but the string's RAW bytes 1:1 as Latin-1 chars — no BOM
    * stripping, no UTF-16 decode. The consumer that must re-create a
    * Python bytes-repr of the value (PdfIngest.sourcePaperOf) needs
    * the bytes the reference's parser saw, BOM and NULs included.
    */
  private[ingest] def fieldRaw(dict: String, name: String): Option[String] = {
    val hex = ("""/""" + name + """\s*<([0-9A-Fa-f\s]+)>""").r
    // literal strings allow BALANCED unescaped parens (§7.3.4.2:
    // "Radiation (TID) Compendium" is ONE string) — a regex stopping at
    // the first ')' would truncate them, so scan with a depth counter;
    // escapes (incl. backslash-EOL continuations) pass through to
    // unescapeLiteral
    val keyRe = ("""/""" + name + """\s*\(""").r
    keyRe.findFirstMatchIn(dict).map { m =>
      val sb = new StringBuilder
      var depth = 1
      var i = m.end
      while (depth > 0 && i < dict.length) {
        val c = dict.charAt(i)
        if (c == '\\' && i + 1 < dict.length) {
          sb += c; sb += dict.charAt(i + 1); i += 2
        } else if (c == '(') { depth += 1; sb += c; i += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) sb += c; i += 1 }
        else { sb += c; i += 1 }
      }
      unescapeLiteral(sb.toString)
    }.orElse(hex.findFirstMatchIn(dict).map { m =>
      latin1(m.group(1).replaceAll("""\s""", "")
        .grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray)
    })
  }

  /** The FULL literal-string escape set of ISO 32000 §7.3.4.2 — \n \r
    * \t \b \f, \( \) \\, octal \d{1,3}, and backslash-EOL line
    * continuations; an unknown escape's character stands for itself.
    * The reference's Python parser unescapes all of these before its
    * bytes-repr, so source_paper fidelity needs the same set.
    */
  private def unescapeLiteral(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case '(' => sb += '('; i += 2
          case ')' => sb += ')'; i += 2
          case '\\' => sb += '\\'; i += 2
          case '\r' =>
            i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = i + 1
            while (k < s.length && k < i + 4 &&
              s.charAt(k) >= '0' && s.charAt(k) <= '7') {
              v = v * 8 + (s.charAt(k) - '0'); k += 1
            }
            sb += (v & 0xff).toChar; i = k
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** BOM-aware string decode: UTF-16BE behind FE FF, else Latin-1. */
  private def decode(s: String): String = {
    val b = s.getBytes(ISO_8859_1)
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, UTF_16BE)
    else s
  }

  /** (title, mod_date) of a PDF's Info dictionary; Nones when the file
    * has no Info dict or the dict lacks the field (both occur in the
    * reference corpus).
    */
  def titleModDate(data: Array[Byte]): (Option[String], Option[String]) =
    infoDict(data) match {
      case None    => (None, None)
      case Some(d) => (field(d, "Title"), field(d, "ModDate"))
    }

  /** Raw-bytes variant (Latin-1 1:1 chars, BOM kept): what a bytes-level
    * reader hands to a Python repr — see fieldRaw.
    */
  private[ingest] def titleModDateRaw(
      data: Array[Byte]): (Option[String], Option[String]) =
    infoDict(data) match {
      case None    => (None, None)
      case Some(d) => (fieldRaw(d, "Title"), fieldRaw(d, "ModDate"))
    }
}
