package graft

import graft.operators.{DedupOps, TrainingOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior checks for the training-corpus preparation operators. The
  * SQL-expressible ones (decontaminate/repetition/spans/shuffle/mix)
  * are DuckDB-oracled; these tests pin the SEMANTICS on constructed
  * inputs, plus the exactness/recall contract of the un-oracled
  * semantic dedup tier.
  */
class TrainingOpsSuite extends AnyFunSuite {
  import SparkFixture._

  test("decontaminate drops exactly the docs sharing a benchmark n-gram") {
    import spark.implicits._
    val bench = Seq((1000L, "the quick brown fox jumps over lazy dogs"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then the quick brown fox jumps too"), // shares 5-gram
      (2L, "quick brown fox jumps over"),                      // shares 5-gram
      (3L, "the quick brown fox sleeps all day long"),         // only 4-gram
      (4L, "completely unrelated content with no overlap here")
    ).toDF("doc_id", "text")
    val kept = TrainingOps.decontaminate(corpus, bench, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L))
  }

  test("repetition score is 0 for distinct text, high for a loop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),            // 6 trigrams, all distinct
      (2L, "x y z x y z x y z x y z")     // 10 trigrams, 3 distinct
    ).toDF("doc_id", "text")
    val rows = TrainingOps.repetitionScores(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1L) == ((6L, 6L, 0.0)))
    assert(rows(2L) == ((10L, 3L, 0.7)))
  }

  test("duplicated-span ratio: templated docs score 1, unique doc 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared template body one two three"),
      (2L, "shared template body one two three"),  // full dup of 1
      (3L, "entirely different words in this doc")
    ).toDF("doc_id", "text")
    val rows = TrainingOps
      .duplicatedSpanScores(DedupOps.shingleRowsOf(docs))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(1L) == 1.0 && rows(2L) == 1.0 && rows(3L) == 0.0)
  }

  test("global shuffle is a deterministic permutation, not id order") {
    val a = TrainingOps.globalShuffle(Tables.documents(spark, sf), "shuf42")
    val b = TrainingOps.globalShuffle(Tables.documents(spark, sf), "shuf42")
    val ra = a.orderBy(col("pos")).collect().map(r => (r.getLong(0), r.getLong(3)))
    val rb = b.orderBy(col("pos")).collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(ra.sameElements(rb), "same salt must reproduce the permutation")
    assert(ra.map(_._2).toSeq == (1L to ra.length).toSeq, "pos is 1..N dense")
    assert(ra.map(_._1).toSet.size == ra.length, "each doc appears once")
    assert(ra.map(_._1).toSeq != ra.map(_._1).sorted.toSeq,
      "hash order must differ from doc_id order")
    val other = TrainingOps.globalShuffle(Tables.documents(spark, sf), "shuf43")
      .orderBy(col("pos")).collect().map(_.getLong(0))
    assert(other.toSeq != ra.map(_._1).toSeq, "new salt => new permutation")
  }

  test("epoch mix replicates each doc exactly reps times, epochs 0..reps-1") {
    val m = TrainingOps.epochMix(Tables.documents(spark, sf))
    val byDoc = m.groupBy(col("doc_id"))
      .agg(max(col("reps")).as("reps"), count(lit(1)).as("n"),
        min(col("epoch")).as("lo"), max(col("epoch")).as("hi"))
    assert(byDoc.filter(col("n") =!= col("reps") || col("lo") =!= 0 ||
      col("hi") =!= col("reps") - 1).count() == 0)
    assert(m.select(min(col("reps")), max(col("reps"))).collect().head
      .toSeq == Seq(1L, 3L), "source-derived reps must span the 1..3 range")
  }

  test("perplexity ranks rare-token docs above common-token docs") {
    import spark.implicits._
    val docs = (
      (1 to 8).map(i => (i.toLong, "alpha beta gamma delta")) :+
        (99L, "xylo quor zynth wub")
    ).toDF("doc_id", "text")
    val scores = TrainingOps.perplexityScores(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(99L) > scores(1L),
      s"rare tokens must score higher cross-entropy: $scores")
    assert(scores.collect { case (k, v) if k != 99L => v }.toSet.size == 1,
      "identical docs score identically")
  }

  test("reference-LM perplexity floors OOV tokens instead of dropping them") {
    import spark.implicits._
    val ref = (1 to 20).map(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // fully in-vocabulary
      (2L, "qqq www eee rrr")           // fully OOV
    ).toDF("doc_id", "text")
    val s = TrainingOps.perplexityScoresAgainst(docs, ref)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(s(2L)._1 == 4L, "OOV tokens must still be counted")
    assert(s(2L)._2 > s(1L)._2,
      s"OOV text must score the smoothing floor, not vanish: $s")
  }

  test("token budget admits greedily per language up to the budget") {
    val docs = Tables.documents(spark, sf)
    val budget = 2000L
    val picked = TrainingOps.tokenBudgetSample(docs, budget, "budget7")
    assert(picked.filter(col("cum_before") >= budget).count() == 0)
    // greedy fill: per language, either the budget is reached (the last
    // admitted doc crosses it) or the whole language was admitted
    val perLang = picked.groupBy(col("lang"))
      .agg(sum(col("n_toks")).as("got"), count(lit(1)).as("n"))
      .join(docs.groupBy(col("lang")).agg(count(lit(1)).as("total")), "lang")
      .collect()
    perLang.foreach { r =>
      val (got, n, total) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(got >= budget || n == total,
        s"lang ${r.getString(0)}: admitted $got tokens of budget $budget " +
          s"with ${total - n} docs left unconsidered")
    }
  }

  test("training manifest is shard-width invariant and matches the naive pack") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("pos", "doc_id", "epoch", "n_toks", "bin")
        .collect().map(_.toSeq).toSet
    val narrow = TrainingOps.trainingManifest(docs, 2048, "man1", 100L)
    val wide = TrainingOps.trainingManifest(docs, 2048, "man1", 1000000L)
    assert(rows(narrow) == rows(wide),
      "bins must not depend on the shard decomposition")
    // naive single-window definition (test-only; one task)
    val naive = narrow.select("pos", "doc_id", "epoch", "n_toks")
      .withColumn("bin", floor((sum(col("n_toks"))
        .over(Window.orderBy(col("pos").asc)) - col("n_toks")) / lit(2048))
        .cast("bigint"))
    assert(rows(narrow) == rows(naive))
    // epochs multiply presence: every (doc, epoch) pair appears once
    val n = narrow.count()
    assert(n > docs.count(), "up-sampled manifest outgrows the corpus")
    assert(narrow.select("doc_id", "epoch").distinct().count() == n)
  }

  test("semantic dedup drops only true cosine near-dups, with recall") {
    // brute-force drop set at the same threshold/policy (v2 of each pair)
    val bruteDrops = SparkEntry.queries("q_dedup_embedding")(spark, sf)
      .select(col("v2")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(bruteDrops.nonEmpty, "corpus plants cosine>=0.35 pairs")
    val all = Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val survivors = SparkEntry.queries("q_dedup_semantic")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val semDrops = all -- survivors
    assert((semDrops -- bruteDrops).isEmpty,
      s"semantic drops must be exact-verified: ${(semDrops -- bruteDrops).take(5)}")
    val recall = (semDrops & bruteDrops).size.toDouble / bruteDrops.size
    assert(recall >= 0.5,
      s"within-cluster pass should catch most near-dups, recall=$recall")
  }

  test("perplexity/semantic-dedup construction schedules no corpus job") {
    // the round-7 review found eager localCheckpoints here: each ran a
    // corpus-sized job at query construction into non-fault-tolerant
    // executor-local blocks. Both are now LAZY persists (the
    // MultimodalOps.decodedMedia idiom) — constructing the perplexity
    // queries must schedule nothing, and semantic dedup only the
    // K-bounded k-means fit collects (1 seed + iters Lloyd steps).
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val g1 = "graft-ppl-construct-probe"
    spark.sparkContext.setJobGroup(g1, "construction must be lazy")
    try {
      TrainingOps.perplexityScores(docs)
      TrainingOps.perplexityScoresAgainst(docs, docs)
      SparkEntry.queries("q_text_perplexity")(spark, sf)
    } finally spark.sparkContext.clearJobGroup()
    val j1 = spark.sparkContext.statusTracker.getJobIdsForGroup(g1)
    assert(j1.isEmpty,
      s"perplexity construction ran ${j1.length} Spark job(s) — eager")
    // baseline: the K-bounded k-means fit plus the round-12 oracle
    // staging of its centroids — BOTH are model-sized (K rows), never
    // corpus-sized (the collects/write fan out into several AQE jobs —
    // count them, don't guess)
    val gFit = "graft-semdedup-fit-baseline"
    spark.sparkContext.setJobGroup(gFit, "the fit's own job count")
    try {
      val (_, cents) = graft.operators.IvfAnn.assign(
        Tables.embeddings(spark, sf), k = 4, iters = 2)
      graft.operators.IvfAnn.stageCentroids(spark, cents,
        s"/tmp/graft_semdedup_baseline_stage_${System.nanoTime()}")
    } finally spark.sparkContext.clearJobGroup()
    val jFit = spark.sparkContext.statusTracker.getJobIdsForGroup(gFit)
    val g2 = "graft-semdedup-construct-probe"
    spark.sparkContext.setJobGroup(g2, "only the k-means fit may run")
    try SparkEntry.queries("q_dedup_semantic")(spark, sf)
    finally spark.sparkContext.clearJobGroup()
    val j2 = spark.sparkContext.statusTracker.getJobIdsForGroup(g2)
    assert(j2.length <= jFit.length,
      s"semanticDedup construction ran ${j2.length} jobs vs ${jFit.length} " +
        "for the fit alone — a corpus-sized materialization crept back in")
  }

  test("span removal keeps an ordered subsequence and only trims copied docs") {
    val original = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("q_dedup_span_removal")(spark, sf).collect()
    assert(out.length == original.size)
    var trimmed = 0
    out.foreach { r =>
      val (id, nToks, nKept, cleaned) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))
      assert(nKept <= nToks)
      val origToks = original(id).split(" ", -1)
      assert(nToks == origToks.length)
      if (nKept < nToks) trimmed += 1
      // self-consistency + subsequence: the kept tokens appear in the
      // original, in order (removal never reorders or invents tokens)
      val keptToks = if (cleaned.isEmpty) Array.empty[String]
        else cleaned.split(" ", -1)
      assert(keptToks.length == nKept, s"doc $id: n_kept vs cleaned drift")
      var oi = 0
      keptToks.foreach { t =>
        while (oi < origToks.length && origToks(oi) != t) oi += 1
        assert(oi < origToks.length, s"doc $id: '$t' out of order vs original")
        oi += 1
      }
    }
    // the corpus plants verbatim near-dups: some docs must get trimmed,
    // and untouched docs must dominate (10-token spans are the precision
    // knob separating copying from shared phrasing)
    assert(trimmed > 0, "planted duplicate spans must be removed")
    assert(trimmed < out.length / 2, s"span removal over-triggers: $trimmed")
  }

  test("chunking tiles every document: stride-50/40 windows, 10-token overlap") {
    val (chunk, stride) = (50, 40)
    val texts = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("q_chunk_documents")(spark, sf).collect()
    val perDoc = out.groupBy(_.getLong(0))
    assert(perDoc.keySet == texts.keySet, "every document must be chunked")
    perDoc.foreach { case (id, rows) =>
      val toks = texts(id).split(" ", -1)
      val expectedChunks =
        if (toks.length <= chunk) 1
        else 1 + math.ceil((toks.length - chunk).toDouble / stride).toInt
      assert(rows.length == expectedChunks, s"doc $id: chunk count")
      rows.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i, s"doc $id: chunk_idx not dense")
        // independent recompute: chunk i is exactly tokens
        // [i*stride, i*stride + chunk)
        val expected = toks.slice(i * stride,
          math.min(i * stride + chunk, toks.length))
        assert(r.getString(2) == expected.mkString(" "),
          s"doc $id chunk $i: text drift")
        assert(r.getLong(3) == expected.length, s"doc $id chunk $i: n toks")
      }
      // coverage: the last chunk reaches the document's end
      val last = rows.maxBy(_.getLong(1))
      assert(last.getLong(1) * stride + last.getLong(3) == toks.length,
        s"doc $id: tail tokens uncovered")
    }
  }

  test("chunking boundary lengths: n at and around chunk/stride multiples") {
    import spark.implicits._
    // the corpus may not contain exact-boundary lengths, so plant them:
    // 49/50 -> one chunk; 51 -> two (second is the 11-token tail that
    // still overlaps the first by 10); 90 -> two exact windows; 91 ->
    // three (the 11-token tail)
    def doc(id: Long, n: Int) = (id, (1 to n).map(i => s"t$i").mkString(" "))
    val docs = Seq(doc(1, 49), doc(2, 50), doc(3, 51), doc(4, 90),
      doc(5, 91), doc(6, 1)).toDF("doc_id", "text")
    val out = graft.operators.TrainingOps.chunkDocs(docs, 50, 40)
      .collect().groupBy(_.getLong(0))
    val expected = Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3, 6L -> 1)
    expected.foreach { case (id, k) =>
      assert(out(id).length == k, s"doc $id: ${out(id).length} chunks, want $k")
    }
    // the 51-token doc's tail: tokens 41..51, 11 tokens, overlap 10
    val tail51 = out(3L).find(_.getLong(1) == 1L).get
    assert(tail51.getLong(3) == 11)
    assert(tail51.getString(2) == (41 to 51).map(i => s"t$i").mkString(" "))
    // a 90-token doc tiles exactly: 1..50 and 41..90
    assert(out(4L).map(_.getLong(3)).sorted.toSeq == Seq(50L, 50L))
  }
}
