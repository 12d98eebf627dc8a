package graft

import graft.operators.BpeOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed BPE training vs a direct driver-side replay of the
  * published algorithm (Sennrich et al.) over the same word-frequency
  * dictionary: the merge lists must be IDENTICAL.
  */
class BpeSuite extends AnyFunSuite {
  import SparkFixture._

  /** Reference trainer: plain Scala, no Spark, straight from the paper —
    * count adjacent pairs over (word -> freq), merge the argmax
    * (tie-break freq desc then lexicographic), repeat.
    */
  private def referenceTrain(freqs: Map[String, Long], nMerges: Int,
      minFreq: Long): Seq[(Int, String, String, Long)] = {
    var dict: Map[Vector[String], Long] = freqs.map { case (w, f) =>
      (w.map(_.toString).toVector :+ "</w>") -> f
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _         =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (n < minFreq) done = true
        else {
          out += ((i, a, b, n))
          dict = dict.map { case (syms, f) =>
            val res = scala.collection.mutable.ArrayBuffer.empty[String]
            var prev: String = null
            syms.foreach { x =>
              if (prev == null) prev = x
              else if (prev == a && x == b) prev = a + b
              else { res += prev; prev = x }
            }
            if (prev != null) res += prev
            res.toVector -> f
          }
          i += 1
        }
      }
    }
    out.toSeq
  }

  test("distributed merges equal the published algorithm replayed on " +
      "the driver, in order, with identical frequencies") {
    val got = SparkEntry.queries("q_bpe_train")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val freqs = BpeOps.wordFreq(Tables.documents(spark, sf)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceTrain(freqs, nMerges = 16, minFreq = 2)
    assert(got == expected)
    assert(got.nonEmpty, "the corpus must yield at least one merge")
    // and a second run returns the same artifact (memo or not)
    val again = SparkEntry.queries("q_bpe_train")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(again == got)
  }

  test("distributed rounds equal the driver-local loop (path parity, " +
      "like the CC endgame)") {
    val docs = Tables.documents(spark, sf)
    val local = BpeOps.train(docs, nMerges = 6, minFreq = 2).merges
    val dist = BpeOps.train(docs, nMerges = 6, minFreq = 2,
      localDictLimit = 0).merges
    assert(dist == local)
    assert(local.size == 6)
  }

  test("distributed path survives SQL-special symbols (backslash, quote) " +
      "in winning merge pairs") {
    import spark.implicits._
    // backslash-heavy corpus: the top pair is ('\', '\'); a raw
    // interpolation would let Spark's parser eat the escapes and the
    // rewrite would silently miss (or throw) — path parity proves the
    // quoting holds
    val docs = Seq((1L, "\\\\ab \\\\ab \\\\ab 'q' 'q'"))
      .toDF("doc_id", "text")
    val local = BpeOps.train(docs, nMerges = 7, minFreq = 2).merges
    val dist = BpeOps.train(docs, nMerges = 7, minFreq = 2,
      localDictLimit = 0).merges
    assert(dist == local)
    assert(local.exists { case (_, a, b, _) => (a + b).contains("\\\\") },
      s"a backslash pair must actually win a merge here, got $local")
    assert(local.exists { case (_, a, b, _) =>
      (a + b).contains("'") }, s"and a quote pair too, got $local")
  }

  test("non-overlapping left-to-right merge: 'aaa' under (a,a) -> [aa, a]") {
    import spark.implicits._
    val t = BpeOps.train(Seq((1L, "aaa aaa")).toDF("doc_id", "text"),
      nMerges = 1, minFreq = 2)
    assert(t.merges.map(m => (m._2, m._3)) == Seq(("a", "a")))
    val syms = t.dict.select(col("syms")).head().getSeq[String](0)
    assert(syms == Seq("aa", "a", "</w>"))
  }

  test("tokenize: BPE token counts are word-consistent and bounded") {
    val rows = SparkEntry.queries("q_bpe_tokenize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "every doc tokenizes")
    rows.foreach { case (_, nWords, nToks) =>
      // >= 1 symbol per word; <= chars+marker per word is loose, but
      // merges can only SHRINK, so tokens >= words always holds
      assert(nToks >= nWords)
    }
    // merges actually compress: total tokens < total chars + markers
    val totalToks = rows.map(_._3).sum
    val naive = BpeOps.wordFreq(Tables.documents(spark, sf))
      .select(sum((length(col("word")) + lit(1)) * col("freq")))
      .head().getLong(0)
    assert(totalToks < naive,
      s"trained tokenization ($totalToks) must beat char-level ($naive)")
  }
}
