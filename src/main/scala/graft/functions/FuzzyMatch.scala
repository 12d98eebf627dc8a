package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** `partial_ratio`-style fuzzy similarity (reference R15: fuzzy header →
  * schema alignment scores headers against canonical categories with
  * fuzz.partial_ratio and keeps mappings scoring >= 75 —
  * tables.py:167-203).
  *
  * Reimplemented from the published definition (difflib's
  * SequenceMatcher ratio + the sliding-window maximization popularized by
  * fuzzywuzzy/rapidfuzz): the shorter string is scored against
  * windows of the longer string anchored at each matching block, and the
  * best 2*M/T ratio (scaled to 0..100, half-up) wins. Spark's built-in
  * `levenshtein` is NOT equivalent (SURVEY.md §4.3).
  */
object FuzzyMatch {

  /** Longest matching block between a[alo,ahi) and b[blo,bhi) — the
    * classic SequenceMatcher recursion core (no junk heuristic; inputs
    * here are short header strings, below difflib's autojunk threshold).
    * Returns (bestI, bestJ, bestSize).
    */
  private def longestMatch(a: String, b: String, b2j: Map[Char, List[Int]],
      alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
    var bestI = alo
    var bestJ = blo
    var bestSize = 0
    var j2len = mutable.Map.empty[Int, Int]
    var i = alo
    while (i < ahi) {
      val newJ2len = mutable.Map.empty[Int, Int]
      b2j.getOrElse(a.charAt(i), Nil).foreach { j =>
        if (j >= blo && j < bhi) {
          val k = j2len.getOrElse(j - 1, 0) + 1
          newJ2len(j) = k
          if (k > bestSize) {
            bestI = i - k + 1; bestJ = j - k + 1; bestSize = k
          }
        }
      }
      j2len = newJ2len
      i += 1
    }
    (bestI, bestJ, bestSize)
  }

  /** Matching blocks per SequenceMatcher.get_matching_blocks (sans the
    * trailing zero-length sentinel).
    */
  def matchingBlocks(a: String, b: String): Seq[(Int, Int, Int)] = {
    val b2j = b.indices.toList.groupBy(b.charAt)
    val queue = mutable.Stack((0, a.length, 0, b.length))
    val blocks = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (bi, bj, bs) = longestMatch(a, b, b2j, alo, ahi, blo, bhi)
      if (bs > 0) {
        blocks += ((bi, bj, bs))
        if (alo < bi && blo < bj) queue.push((alo, bi, blo, bj))
        if (bi + bs < ahi && bj + bs < bhi) queue.push((bi + bs, ahi, bj + bs, bhi))
      }
    }
    blocks.sortBy(t => (t._1, t._2)).toSeq
  }

  /** difflib ratio: 2*M / (|a| + |b|), M = total matched chars. */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val m = matchingBlocks(a, b).map(_._3).sum
    2.0 * m / (a.length + b.length)
  }

  /** Best ratio of the shorter string against same-length windows of the
    * longer string, anchored at each matching block; 0..100, half-up.
    */
  def partialRatio(s1: String, s2: String): Int = {
    if (s1 == null || s2 == null) return 0
    if (s1.isEmpty || s2.isEmpty) return 0
    val (shorter, longer) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    val blocks = matchingBlocks(shorter, longer)
    var best = 0.0
    val it = blocks.iterator
    while (it.hasNext && best < 0.995) {
      val (i, j, _) = it.next()
      val start = math.max(j - i, 0)
      val end = math.min(start + shorter.length, longer.length)
      val window = longer.substring(start, end)
      val r = ratio(shorter, window)
      if (r > best) best = r
    }
    math.round(100 * best).toInt
  }

  /** 0..100 similarity of two whitespace-normalized lowercase strings —
    * the exact normalization the reference applies before scoring
    * (tables.py:178).
    */
  def normalizedPartialRatio(a: String, b: String): Int = {
    if (a == null || b == null) 0
    else partialRatio(norm(a), norm(b))
  }

  def norm(s: String): String =
    s.toLowerCase.trim.split("\\s+").mkString(" ")
}

/** Catalyst expression form: evaluated per-row without UDF serialization
  * overhead. `doGenCode` emits a direct static call, so the expression
  * participates in whole-stage codegen (no CodegenFallback row
  * materialization between the scan and the score); the string algorithm
  * itself stays in one JIT-friendly helper.
  */
case class PartialRatioExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any =
    FuzzyMatch.normalizedPartialRatio(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.FuzzyMatch.normalizedPartialRatio(" +
        s"$l.toString(), $r.toString());")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PartialRatioExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "partial_ratio"
}

object PartialRatioExpr {
  import org.apache.spark.sql.GraftShim
  /** Column-level entry point: `partial_ratio(colA, colB)` -> 0..100. */
  def partial_ratio(a: Column, b: Column): Column =
    GraftShim.column(
      PartialRatioExpr(GraftShim.expression(a), GraftShim.expression(b)))
}
