package graft.functions

import scala.collection.mutable

/** Abbreviation-pair extraction (reference R19, main.py:18-43): a
  * stateful character scan over a cell's text that
  *   - splits into lines on newlines that are OUTSIDE parentheses (a
  *     newline inside `(...)` continues the current line — the
  *     parenthesis lock at main.py:27-31),
  *   - splits each line at the first `=` into (abbrev, expansion),
  *   - whitespace-normalizes both sides,
  *   - drops lines without `=` or with an empty side.
  *
  * One input cell -> many (abbrev, expansion) rows: the UDTF shape,
  * surfaced in Spark as a function returning Array[Struct] + `explode`.
  * (The reference defines but never wires this operator — main.py:83-108;
  * we implement the intended semantics.)
  */
object AbbrevPairs {

  def parse(text: String): Seq[(String, String)] = {
    if (text == null) return Nil
    val lines = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    text.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth = math.max(0, depth - 1); cur.append(')')
      case '\n' if depth == 0 => lines += cur.result(); cur.clear()
      case c => cur.append(c)
    }
    lines += cur.result()
    lines.iterator.flatMap { line =>
      val eq = line.indexOf('=')
      if (eq < 0) None
      else {
        val abbrev = FuzzyMatch.norm(line.substring(0, eq))
        val expansion = FuzzyMatch.norm(line.substring(eq + 1))
        if (abbrev.isEmpty || expansion.isEmpty) None
        else Some((abbrev, expansion))
      }
    }.toSeq
  }

  /** Intended reference R20 (abbreviation_expansion, main.py:45-50 — a
    * behavioral no-op there; implemented as meant): replace each
    * abbreviation with its expansion wherever it appears as a whole word.
    */
  def expand(text: String, pairs: Seq[(String, String)]): String = {
    if (text == null) return null
    pairs.foldLeft(text) { case (acc, (abbrev, expansion)) =>
      acc.replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(abbrev) + "\\b",
        java.util.regex.Matcher.quoteReplacement(expansion))
    }
  }
}
