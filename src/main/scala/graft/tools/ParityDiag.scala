package graft.tools

import java.nio.file.{Files, Paths}

import graft.ingest.{BinaryIngest, PdfIngest, PdfLattice}

/** Diagnostic: compare q_rad_ingest output against the golden main.db
  * export pair-by-pair and dump the residual misses with extraction
  * context (the candidate part-cell values of the file in question).
  * Dev tool only — not part of the driver surface.
  */
object ParityDiag {
  def main(args: Array[String]): Unit = {
    def norm(s: String) =
      Option(s).getOrElse("").toUpperCase.replaceAll("\\s+", " ").trim
    val text = new String(Files.readAllBytes(
      Paths.get("src/test/resources/golden_rad_table.csv")), "UTF-8")
    val golden = text.split("\n").iterator.map(_.stripSuffix("\r"))
      .filter(_.nonEmpty).drop(1).map { l =>
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

    val files = golden.map(_.last).distinct.sorted
    val ours = files.flatMap { f =>
      val p = Paths.get(BinaryIngest.defaultDocsDir, f)
      if (Files.exists(p)) {
        val data = Files.readAllBytes(p)
        // .distinct mirrors the R21 dedup tail of q_rad_ingest
        PdfIngest.radRowsOf(f, data).distinct.map(r => (f, r))
      } else Nil
    }
    val ourPairs = ours.map { case (f, r) => (f, norm(r.head)) }.toSet
    val gPairs = golden.map(r => (r.last, norm(r.head))).toSet
    val missed = gPairs.toSeq.filterNot(ourPairs.contains).sorted
    println(s"== golden pairs: ${gPairs.size}, ours: ${ourPairs.size}, " +
      s"hit: ${gPairs.count(ourPairs.contains)}, missed: ${missed.size}")
    missed.foreach { case (f, part) =>
      println(s"MISS  $f :: '$part'")
      // nearest extracted parts in the same file (by common prefix)
      val cands = ours.filter(_._1 == f).map(t => norm(t._2.head))
        .filter(p => p.startsWith(part.take(4)) ||
          part.startsWith(p.take(4)))
      println(s"      near: ${cands.mkString(" | ")}")
    }
    println()
    println("== per-file row counts (ours vs golden):")
    val goldenByFile = golden.groupBy(_.last).view.mapValues(_.size).toMap
    ours.groupBy(_._1).view.mapValues(_.size).toSeq.sorted.foreach {
      case (f, n) => println(s"  $f: ours=$n golden=${goldenByFile.getOrElse(f, 0)}")
    }
    println()
    // precision side: extracted pairs not in golden
    val extra = ourPairs.toSeq.filterNot(gPairs.contains).sorted
    println(s"== extracted-but-not-golden: ${extra.size}")
    extra.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (f, xs) =>
      println(s"  $f: ${xs.map(_._2).mkString(" | ")}")
    }
    val bi = args.indexOf("--frags")
    if (bi >= 0) {
      val f = args(bi + 1)
      val pg = args(bi + 2).toInt
      val pat = args(bi + 3).toUpperCase
      val data = Files.readAllBytes(Paths.get(BinaryIngest.defaultDocsDir, f))
      PdfLattice.pages(data).filter(_.page == pg).foreach { pe =>
        pe.tables.zipWithIndex.foreach { case (t, ti) =>
          println(f"table $ti bbox x[${t.xMin}%.1f..${t.xMax}%.1f] " +
            f"y[${t.yMin}%.1f..${t.yMax}%.1f] rows=${t.cells.length}")
        }
        pe.texts.filter(t => pat == "*" || t.text.toUpperCase.contains(pat))
          .foreach(t => println(
            f"frag x=${t.x}%8.2f y=${t.y}%8.2f xe=${t.xEnd}%8.2f " +
            f"ye=${t.yEnd}%8.2f ord=${t.ord}%5d sz=${t.size}%5.1f " +
            f"est=${t.est} '${t.text}'"))
      }
    }
    val gp = args.indexOf("--g4probe")
    if (gp >= 0) {
      val f = args(gp + 1)
      val data = Files.readAllBytes(Paths.get(BinaryIngest.defaultDocsDir, f))
      val s = new String(data, "ISO-8859-1")
      val re = """(\d+)\s+0\s+obj\b""".r
      re.findAllMatchIn(s).foreach { m =>
        val st = s.indexOf("stream", m.end)
        val end = s.indexOf("endobj", m.end)
        if (st >= 0 && (end < 0 || st < end) &&
          s.substring(m.end, st).contains("/CCITTFaxDecode")) {
          val n = m.group(1).toInt
          val bm = PdfLattice.ccittBitmapDebug(data, s, n)
          bm match {
            case Some(b) =>
              var black = 0L
              b.bits.foreach(v => if (v != 0) black += 1)
              val (hs, vs) = graft.ingest.Jbig2.rules(b)
              println(f"obj $n: ${b.w}x${b.h} black=$black " +
                f"(${black * 100.0 / (b.w.toLong * b.h)}%.1f%%) " +
                s"hRules=${hs.length} vRules=${vs.length}")
            case None => println(s"obj $n: DECODE FAILED")
          }
        }
      }
    }
    val ra = args.indexOf("--raster")
    if (ra >= 0) {
      val f = args(ra + 1)
      val data = Files.readAllBytes(Paths.get(BinaryIngest.defaultDocsDir, f))
      PdfLattice.pages(data).foreach { pe =>
        println(s"page ${pe.page}: ${pe.texts.length} frags, " +
          s"${pe.tables.length} tables " +
          pe.tables.map(t => s"${t.cells.length}x${t.cells.headOption
            .fold(0)(_.length)}").mkString(" "))
      }
    }
    val co = args.indexOf("--content")
    if (co >= 0) {
      val f = args(co + 1)
      val pg = args(co + 2).toInt
      val data = Files.readAllBytes(Paths.get(BinaryIngest.defaultDocsDir, f))
      PdfLattice.pageDicts(data).zipWithIndex
        .filter(_._2 + 1 == pg).foreach { case (pd, _) =>
          System.out.write(PdfLattice.pageContentDebug(data, pd))
          System.out.flush()
        }
    }
    val fo = args.indexOf("--fonts")
    if (fo >= 0) {
      val f = args(fo + 1)
      val pg = args(fo + 2).toInt
      val probe = args(fo + 3)
      val data = Files.readAllBytes(Paths.get(BinaryIngest.defaultDocsDir, f))
      val s = new String(data, "ISO-8859-1")
      PdfLattice.pageDicts(data).zipWithIndex
        .filter(_._2 + 1 == pg).foreach { case (pd, _) =>
          PdfLattice.pageFonts(data, s, pd).toSeq.sortBy(_._1)
            .foreach { case (nm, ft) =>
              val ws = probe.map(c => f"$c=${ft.width(c.toInt)}%.0f")
                .mkString(" ")
              println(s"font /$nm first=${ft.first} " +
                s"n=${ft.widths.length} missing=${ft.missing} :: $ws")
            }
        }
    }
    val xi = args.indexOf("--boxes")
    if (xi >= 0) {
      val f = args(xi + 1)
      val pg = args(xi + 2).toInt
      val (yLo, yHi) = (args(xi + 3).toDouble, args(xi + 4).toDouble)
      val data = Files.readAllBytes(Paths.get(BinaryIngest.defaultDocsDir, f))
      val (_, boxes) = PdfLattice.debugPage(data, pg)
      boxes.filter(b => b.y + b.h >= yLo && b.y <= yHi)
        .sortBy(b => (-b.y, b.x)).foreach { b =>
          val kind =
            if (b.h <= 2 && b.w > 4) "H"
            else if (b.w <= 2 && b.h > 4) "V"
            else "?"
          println(f"$kind x=${b.x}%8.2f y=${b.y}%8.2f w=${b.w}%8.2f " +
            f"h=${b.h}%8.2f shade=${b.shade}")
        }
    }
    val ci = args.indexOf("--cells")
    if (ci >= 0) {
      val f = args(ci + 1)
      val pat = args(ci + 2).toUpperCase
      val data = Files.readAllBytes(Paths.get(BinaryIngest.defaultDocsDir, f))
      PdfLattice.pages(data).foreach { pe =>
        pe.tables.zipWithIndex.foreach { case (t, ti) =>
          t.cells.zipWithIndex.foreach { case (r, ri) =>
            if (pat == "*" || r.exists(c => norm(c).contains(pat)))
              println(s"p${pe.page} t$ti r$ri: " +
                r.map(c => "[" + c.replace("\n", "\\n") + "]").mkString)
          }
        }
      }
    }
  }
}
