package graft

import graft.operators.{EmbeddingOps, PipelineOps, SqlSurface}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the round-2 pipeline/SQL-surface/embedding
  * operators (the oracle-bearing forms are DuckDB-hash-gated; these
  * assert the semantic invariants the hashes can't articulate).
  */
class PipelineOpsSuite extends AnyFunSuite {
  import SparkFixture._

  test("connectedComponents labels every node with its component min") {
    import spark.implicits._
    // chain 1-2-3, triangle 10-11-12 (+ redundant edge), pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("d1", "d2")
    val got = PipelineOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("large-star/small-star contracts a 100-node chain in O(log n) rounds") {
    import spark.implicits._
    // a path graph is the worst case for min-label propagation (needs
    // ~diameter rounds = 99); the star contraction must do it in O(log n)
    val chain = (1L until 100L).map(i => (i, i + 1)).toDF("d1", "d2")
    val (labels, rounds) =
      PipelineOps.connectedComponentsWithRounds(chain, localFinishEdges = 0L)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 100L).map(_ -> 1L).toMap)
    assert(rounds > 0, "localFinishEdges=0 must force the distributed path")
    assert(rounds <= 10,
      s"O(log n) contraction expected, took $rounds rounds " +
        "(a diameter loop would need ~100)")
  }

  test("local union-find endgame matches the distributed star path") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xBEEF)
    val edges = Seq.fill(80)(
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }.toDF("d1", "d2")
    val (local, r0) = PipelineOps.connectedComponentsWithRounds(edges)
    val (dist, rD) = PipelineOps.connectedComponentsWithRounds(
      edges, localFinishEdges = 0L)
    assert(r0 == 0 && rD > 0)
    assert(local.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      dist.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("CC labels match a union-find reference on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC0FFEE)
    (1 to 3).foreach { trial =>
      val n = 60
      val edges = Seq.fill(50)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = PipelineOps.connectedComponents(edges.toDF("d1", "d2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: star CC diverged from union-find")
    }
  }

  test("sharded packing keeps null-lang rows (null-safe stitch join)") {
    import spark.implicits._
    val docs = Seq(
      (1L, Option("en"), "a b c d e"),
      (2L, Option.empty[String], "f g h"),
      (3L, Option("en"), "i j"),
      (4L, Option.empty[String], "k l m n"))
      .toDF("doc_id", "lang", "text")
    val got = PipelineOps.packTokensSharded(docs, binTokens = 4, shardWidth = 2L)
    assert(got.count() == 4, "null-lang rows must survive the offset join")
    // null lang packs as its own group, same as the windowed definition
    val nullBins = got.filter(col("lang").isNull)
      .orderBy(col("doc_id")).collect().map(_.getLong(3))
    assert(nullBins.toSeq == Seq(0L, 0L),
      "3 tokens then 4 tokens: second doc starts at cum=3, bin floor(3/4)=0")
  }

  test("q_dedup_clusters covers exactly the docs in near-dup pairs") {
    val pairDocs = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
      .select(col("d1").as("d")).union(
        SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
          .select(col("d2").as("d")))
      .distinct().collect().map(_.getLong(0)).toSet
    val clusters = SparkEntry.queries("q_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.keySet == pairDocs)
    // every cluster id is a member of its own cluster (the representative)
    clusters.values.toSet.foreach { c: Long => assert(clusters(c) == c) }
  }

  test("hash sampling is deterministic and bucket-bounded") {
    val a = SparkEntry.queries("q_sample_hash")(spark, sf).collect()
    val b = SparkEntry.queries("q_sample_hash")(spark, sf).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq,
      "same rows on every run — no RNG state")
    assert(a.nonEmpty)
    assert(a.forall(r => (0 until 10).contains(r.getLong(2).toInt)))
    // ~25% +- wide slack (md5 is uniform; 500 docs at sf0.001)
    val frac = a.length.toDouble /
      Tables.documents(spark, sf).count().toDouble
    assert(frac > 0.15 && frac < 0.35, s"sample fraction $frac")
  }

  test("weighted (priority) sampling: deterministic, stratified at 50, " +
      "and biased toward heavy docs; top-k plans map-side") {
    import org.apache.spark.sql.functions.{avg, col, size, split}
    val a = SparkEntry.queries("q_sample_weighted")(spark, sf).collect()
    val b = SparkEntry.queries("q_sample_weighted")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "same sample on every run — no RNG state")
    // exactly min(50, stratum size) per language, ranks 1..k
    val docs = Tables.documents(spark, sf)
    val strata = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = a.groupBy(_.getString(0))
    assert(byLang.keySet == strata.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(50L, strata(lang)).toInt)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    // weight = token count: the sampled mean must sit ABOVE the corpus
    // mean (priority w/u makes heavy docs proportionally likelier)
    val corpusMean = docs
      .select(avg(size(split(col("text"), " ")).cast("double")))
      .head().getDouble(0)
    val sampleMean = a.map(_.getLong(3).toDouble).sum / a.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus $corpusMean")
    // per-stratum top-k prunes map-side, no global sort of the corpus
    val plan = SparkEntry.queries("q_sample_weighted")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("token packing: bins are per-lang contiguous and capacity-derived") {
    val rows = SparkEntry.queries("q_pack_tokens")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_._1)
      // bin sequence is non-decreasing in doc order
      assert(inOrder.map(_._4).sliding(2).forall(
        s => s.length < 2 || s(0) <= s(1)))
      // bin index equals running-prefix-sum div capacity
      var cum = 0L
      inOrder.foreach { case (_, _, n, bin) =>
        assert(bin == cum / 2048, s"bin $bin vs cum $cum")
        cum += n
      }
    }
  }

  test("sharded packing reproduces the sequential windowed pack exactly") {
    // the 100 TB shard-and-offset form must be bit-identical to the
    // per-language sequential definition (it also shares the oracle SQL);
    // shardWidth=7 forces many shards and uneven shard sizes
    val seq = SparkEntry.queries("q_pack_tokens")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val shard = PipelineOps.packTokensSharded(
        Tables.documents(spark, sf), 2048, shardWidth = 7L)
      .orderBy(col("doc_id").asc_nulls_first)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(shard.toSeq == seq.toSeq)
  }

  test("bm25 output is rank-ordered and bounded to top 20") {
    val got = SparkEntry.queries("q_text_bm25")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length <= 20 && got.nonEmpty)
    assert(got.map(_._2).sliding(2).forall(s => s.length < 2 || s(0) >= s(1)),
      "descending bm25")
  }

  test("tfidf emits at most 3 terms per doc, idf of ubiquitous terms ~ 0") {
    val got = SparkEntry.queries("q_text_tfidf")(spark, sf).collect()
    val perDoc = got.groupBy(_.getLong(0))
    assert(perDoc.values.forall(_.length <= 3))
    assert(got.forall(_.getLong(2) >= 1))
  }

  test("pii redaction removes every planted email and phone") {
    val got = SparkEntry.queries("q_text_pii_redact")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val red = r.getString(1)
      assert(!red.contains("@mail.com"), s"email survived: $red")
      assert(!red.matches(".*\\b555-[0-9]{4}\\b.*"), s"phone survived: $red")
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]"))
      assert(r.getInt(2) >= 1)
    }
  }

  test("embedding quantization stays in int8 range for unit vectors") {
    val got = SparkEntry.queries("q_embed_quantize")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      (4 to 7).foreach { i =>
        val q = r.getInt(i)
        assert(q >= -128 && q <= 127, s"q$i=$q out of int8 range")
      }
      assert(math.abs(r.getDouble(2) - 1.0) < 0.01, "unit-norm corpus")
    }
  }

  test("centroid output is |labels| x dim and n_vecs sums to corpus size") {
    val got = SparkEntry.queries("q_embed_centroid")(spark, sf)
    val labels = Tables.embeddings(spark, sf)
      .select(countDistinct(col("label"))).head().getLong(0)
    assert(got.count() == labels * 64)
    val perLabelN = got.groupBy(col("label"))
      .agg(max(col("n_vecs")).as("n")).agg(sum(col("n"))).head().getLong(0)
    assert(perLabelN == Tables.embeddings(spark, sf).count())
  }

  test("funnel: conversions are purchase-after-signup only, hours > 0") {
    val got = SparkEntry.queries("q_funnel")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val converted = r.getBoolean(3)
      assert(converted == !r.isNullAt(2))
      if (converted) {
        assert(r.getTimestamp(2).after(r.getTimestamp(1)))
        assert(r.getDouble(4) > 0.0)
      } else assert(r.isNullAt(4))
    }
  }

  test("cohort retention: offset-0 cell counts every cohort member") {
    val got = SparkEntry.queries("q_cohort_retention")(spark, sf).collect()
    assert(got.forall(_.getInt(1) >= 0))
    val week0 = got.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    val users = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(week0 == users, "every user is active in their own first week")
  }

  test("histogram bins cover all orders exactly once") {
    val got = SparkEntry.queries("q_histogram")(spark, sf).collect()
    assert(got.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    got.foreach { r =>
      assert(r.getDouble(2) >= r.getLong(0) * 25000.0 - 1e-6)
      assert(r.getDouble(3) < (r.getLong(0) + 1) * 25000.0 + 1e-6)
    }
  }

  test("quota sampling caps each language at 30, deterministically") {
    val a = SparkEntry.queries("q_sample_quota")(spark, sf).collect()
    val b = SparkEntry.queries("q_sample_quota")(spark, sf).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    val perLang = a.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(perLang.values.forall(_ <= 30))
    assert(a.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 30))
  }

  test("interval join results are within the 24h window, keyed by user") {
    val got = SparkEntry.queries("q_interval_join")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (s, p) = (r.getTimestamp(1), r.getTimestamp(2))
      assert(p.after(s))
      assert(p.getTime - s.getTime <= 24L * 3600 * 1000)
    }
  }

  test("event transition probabilities sum to 1 per from-state") {
    val got = SparkEntry.queries("q_event_transitions")(spark, sf).collect()
    got.groupBy(_.getString(0)).foreach { case (from, rows) =>
      val total = rows.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 0.01, s"$from sums to $total")
    }
  }

  test("bigrams: at most 5 per lang, counts non-increasing in rank") {
    val got = SparkEntry.queries("q_text_bigrams")(spark, sf).collect()
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      val byRank = rows.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(byRank.sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
    }
  }

  test("date spine has no gaps and preserves the total order count") {
    val got = SparkEntry.queries("q_date_spine")(spark, sf).collect()
    val days = got.map(_.getString(0))
    assert(days.length ==
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head),
        java.time.LocalDate.parse(days.last)) + 1,
      "one row per calendar day, gap-free")
    assert(got.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
  }

  test("merge upsert grows the target by exactly the insert count") {
    val t = Tables.orders(spark, sf)
    val nIns = t.filter(col("o_orderkey") % 101 === 0).count()
    val merged = SparkEntry.queries("q_merge_upsert")(spark, sf)
    assert(merged.count() == t.count() + nIns)
    assert(merged.filter(col("status") === "N").count() == nIns)
    // updates replace in place: key count unchanged for 'U' rows
    val nUpd = t.filter(col("o_orderkey") % 97 === 0).count()
    assert(merged.filter(col("status") === "U").count() == nUpd)
  }

  test("profile emits one row per profiled column with zero nulls here") {
    val got = SparkEntry.queries("q_profile_table")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq ==
      Seq("l_discount", "l_quantity", "l_returnflag", "l_suppkey"))
    assert(got.forall(_.getLong(2) == 0L))
    assert(got.forall(r => r.getLong(3) <= r.getLong(1)))
  }

  test("text normalization output is lowercase alphanumeric single-spaced") {
    val got = SparkEntry.queries("q_text_normalize")(spark, sf).collect()
    got.foreach { r =>
      val s = r.getString(1)
      assert(s.matches("[a-z0-9 ]*") && !s.contains("  "), s)
      assert(r.getInt(2) >= 2, "at least the planted '!!' was stripped")
    }
  }

  test("exceptAll keeps multiplicity: count = max(0, a_count - b_count)") {
    val li = Tables.lineitem(spark, sf)
    val aCnt = li.groupBy(col("l_suppkey"), col("l_returnflag"))
      .count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val bCnt = li.filter(col("l_linenumber") <= 2)
      .groupBy(col("l_suppkey"), col("l_returnflag"))
      .count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = SparkEntry.queries("q_set_except_all")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    aCnt.foreach { case (k, a) =>
      val expect = math.max(0L, a - bCnt.getOrElse(k, 0L))
      assert(got.getOrElse(k, 0L) == expect, s"key $k")
    }
  }

  test("ntile quartiles partition all customers with balanced sizes") {
    val got = SparkEntry.queries("q_window_ntile")(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val sizes = got.map(_.getLong(1))
    assert(sizes.sum == Tables.customer(spark, sf).count())
    assert(sizes.max - sizes.min <= 1, "ntile balance property")
  }

  test("leakage-safe split never separates near-duplicates") {
    import graft.operators.DedupOps
    val split = SparkEntry.queries("q_split_leakage_safe")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(split.size == Tables.documents(spark, sf).count(),
      "every document must receive a split")
    assert(split.values.toSet.size >= 2, "the 80/10/10 hash must produce " +
      s"more than one split at this size, got ${split.values.toSet}")
    // THE invariant: no near-dup pair straddles splits (the per-doc hash
    // split this replaces fails this immediately)
    val pairs = DedupOps.ngramJaccardPairs(DedupOps.shingleRows(spark, sf), 0.5)
      .select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"near-dups $a (${split(a)}) and $b (${split(b)}) straddle splits")
    }
  }
}
