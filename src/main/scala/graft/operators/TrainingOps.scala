package graft.operators

import graft.Tables
import graft.functions.VectorOps.{vec_dot, vec_norm}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators — the curation steps a
  * large-scale LLM data pipeline runs AFTER the dedup tiers
  * ([[DedupOps]]) and quality scores ([[TextOps]]): benchmark
  * decontamination (GPT-3 appendix C's n-gram overlap rule),
  * intra-document repetition scoring (Gopher's repetition filters,
  * Rae et al. 2021 §A.1), cross-document duplicated-span ratio
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better"), deterministic global training-order shuffle,
  * per-source epoch up-sampling (mixture weights), and SemDeDup-style
  * semantic dedup over embeddings (Abbas et al. 2023).
  *
  * All operators are shuffle-bounded: n-gram joins are equi-joins on
  * the gram key (the benchmark side of decontamination is tiny and
  * broadcasts), scoring is partial-aggregation, epoch mixing is
  * map-only row replication, and the global shuffle reuses
  * [[ScalePatterns.withGlobalRank]] (range partition + per-partition
  * offsets — no single-partition window).
  */
object TrainingOps {

  /** Word n-gram rows (doc_id, g), duplicates KEPT — repetition scoring
    * needs multiplicity. Delegates to the engine's single shared gram
    * builder ([[DedupOps.gramRows]]) so a tokenization change can never
    * desynchronize the curation tiers from the dedup tiers.
    */
  private[operators] def ngramRows(docs: DataFrame, n: Int): DataFrame =
    DedupOps.gramRows(docs, n)

  /** Benchmark decontamination: drop any corpus document sharing at
    * least one word `n`-gram with the benchmark (eval) set — the GPT-3 /
    * PaLM containment rule (they used 13-grams on web-scale text; n is
    * a parameter here). The benchmark gram set is tiny relative to the
    * corpus — MBs of eval data vs 100 TB — so the semi-join broadcasts
    * and the whole operator is one corpus scan.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    val benchGrams = ngramRows(benchmark, n).select(col("g")).distinct()
    val contaminated = ngramRows(docs, n)
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Per-document duplicate-trigram fraction `1 − distinct/total` —
    * Gopher's in-document repetition signal (Rae et al. 2021 §A.1.1):
    * boilerplate and generation loops repeat the same n-grams. One
    * partial-aggregable groupBy per doc; count_distinct is exact
    * per-group (grams of one doc), never global.
    */
  def repetitionScores(docs: DataFrame): DataFrame =
    ngramRows(docs, 3)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("total_tris"),
        count_distinct(col("g")).as("distinct_tris"))
      .withColumn("dup_frac",
        graft.Det.r4(lit(1.0) - col("distinct_tris") / col("total_tris")))

  /** Per-document cross-corpus duplicated-span ratio: the fraction of a
    * doc's DISTINCT trigrams that occur in ≥ 2 distinct documents
    * (Lee et al. 2022's duplicated-text measure at shingle granularity).
    * Two shuffles: gram → document-frequency (partial agg), then the
    * same hot-gram equi-join shape as the exact dedup tiers to stamp
    * each doc's share. df is the OUTPUT here, so no dfCap applies.
    */
  def duplicatedSpanScores(ex: DataFrame): DataFrame = {
    val dfc = ex.groupBy(col("g"))
      .agg(count_distinct(col("doc_id")).as("df"))
    ex.join(dfc, Seq("g"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(count(when(col("df") >= 2, 1)).as("shared"))
      .withColumn("shared_frac", graft.Det.r4(col("shared") / col("sz")))
      .select(col("doc_id"), col("sz").cast("long").as("sz"),
        col("shared"), col("shared_frac"))
  }

  /** Deterministic global training-order shuffle: order = portable
    * 32-bit hash of (salt, doc_id), position materialized with
    * [[ScalePatterns.withGlobalRank]] (repartitionByRange + zipWithIndex
    * offsets — the scale-clean global row number; a bare
    * `row_number() OVER (ORDER BY …)` would single-partition 100 TB).
    * Same salt ⇒ same permutation on every run/cluster; a new epoch is
    * just a new salt.
    */
  def globalShuffle(docs: DataFrame, salt: String): DataFrame = {
    val hashed = docs.select(col("doc_id"), col("lang"),
      PipelineOps.md5Hash32(concat_ws(":", lit(salt), col("doc_id"))).as("hv"))
    ScalePatterns.withGlobalRank(hashed, "pos",
      col("hv").asc_nulls_first, col("doc_id").asc_nulls_first)
  }

  /** Per-source epoch up-sampling: each source's documents are repeated
    * `reps` times (mixture weighting by repetition, the standard way to
    * hit target domain proportions without fractional sampling). Here
    * `reps ∈ {1,2,3}` derives deterministically from the source name;
    * in production it comes from a (broadcast) weights table. Map-only
    * row replication — explode(sequence) — no shuffle at any scale.
    */
  private def epochReps: Column = PipelineOps.md5Hash32(col("source")) % 3 + 1

  def epochMix(docs: DataFrame): DataFrame = docs
    .withColumn("reps", epochReps)
    .withColumn("epoch", explode(sequence(lit(0L), col("reps") - 1)))
    .select(col("doc_id"), col("source"), col("reps"), col("epoch"))

  /** SemDeDup (Abbas et al. 2023): k-means the embedding space (reusing
    * [[IvfAnn.assign]]'s deterministic seeding + distributed Lloyd
    * steps), then compare vectors ONLY within their cluster — the
    * within-cell self-join replaces the quadratic all-pairs scan; each
    * pair is verified by exact cosine, so emitted drops are always true
    * near-dups (the approximation only MISSES cross-cell pairs).
    * Keep-min-id per pair, like the exact embedding tier. Returns the
    * surviving (vec_id, label) rows.
    */
  def semanticDedup(e0: DataFrame, k: Int, iters: Int,
      threshold: Double, stagePath: Option[String] = None): DataFrame = {
    val e = e0.withColumn("nrm", vec_norm(col("embedding")))
    val (assigned, centroids) = IvfAnn.assign(e, k, iters)
    stagePath.foreach(p =>
      IvfAnn.stageCentroids(e0.sparkSession, centroids, p))
    // both self-join sides read this frame — persisted LAZILY
    // (MEMORY_AND_DISK, recomputable from lineage) per the
    // MultimodalOps.decodedMedia idiom: a localCheckpoint here would
    // materialize a corpus-sized frame in non-fault-tolerant
    // executor-local blocks as a job AT QUERY CONSTRUCTION. The
    // CacheManager dedupes by logical plan, so repeated calls on the
    // same input share one entry.
    val cells = assigned.select(col("cell"), col("vec_id"),
      col("embedding"), col("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = cells.select(col("cell"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val b = cells.select(col("cell"), col("vec_id").as("v2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("v1") < col("v2"))
      .filter(graft.Det.r4(vec_dot(col("e1"), col("e2")) /
        (col("n1") * col("n2"))) >= threshold)
      .select(col("v2").as("vec_id")).distinct()
    e0.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label"))
  }

  /** Per-document cross-entropy under an add-one-smoothed unigram LM
    * trained on the corpus itself — the CCNet-style "perplexity against
    * a reference LM" quality filter (Wenzek et al. 2020), with the
    * reference LM made deterministic (corpus unigrams) so the score is
    * oracle-checkable. xent = avg over tokens of −ln p(w),
    * p(w) = (count(w)+1) / (N+V). The LM is vocabulary-sized (≪ corpus);
    * the token→LM equi-join is the standard hot-term join — broadcast
    * when V fits, else it shuffles on term like the TF-IDF tier.
    */
  def perplexityScores(docs: DataFrame): DataFrame = {
    // the LM aggregate, the (N, V) totals and the scoring join each
    // read the token frame — persisted LAZILY (MEMORY_AND_DISK,
    // lineage-recomputable) so it tokenizes once but schedules NO job
    // at query construction; the replaced localCheckpoint ran the full
    // corpus explosion eagerly into non-fault-tolerant executor-local
    // blocks (one lost executor at 100 TB fails the query)
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lm = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val tot = toks.agg(count(lit(1)).as("n"),
      count_distinct(col("term")).as("v"))
    toks.join(lm, Seq("term"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        graft.Det.r4(avg(-log((col("c") + 1) /
          (col("n") + col("v")).cast("double")))).as("xent"))
  }

  /** [[perplexityScores]] generalized to an external reference LM:
    * score `docs` under the add-one-smoothed unigram distribution of
    * `refDocs` (e.g. a standing corpus, or a held-out high-quality
    * slice — the actual CCNet setup). Tokens unseen in the reference
    * take the smoothing floor p = 1/(N+V) via a left join (an inner
    * join would silently DROP out-of-vocabulary tokens and score
    * gibberish as fluent). The reference tokenization is one scan; at
    * scale, fit the LM once and reuse it across batches rather than
    * recomputing per call.
    */
  def perplexityScoresAgainst(docs: DataFrame, refDocs: DataFrame): DataFrame = {
    val refToks = refDocs.select(explode(split(col("text"), " ")).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lm = refToks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val tot = refToks.agg(count(lit(1)).as("n"),
      count_distinct(col("term")).as("v"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(lm, Seq("term"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        graft.Det.r4(avg(-log((coalesce(col("c"), lit(0L)) + 1) /
          (col("n") + col("v")).cast("double")))).as("xent"))
  }

  /** Greedy per-language token-budget sampling: walk each language's
    * docs in deterministic salted-hash order, admitting while the
    * tokens consumed BEFORE the doc are under budget (so the budget may
    * overshoot by at most one doc — the greedy-fill convention). The
    * running sum is a per-language window: parallel across languages,
    * sequential within one — the same group-sequential shape as
    * `q_pack_tokens`, with the same shard-and-offset scale path
    * ([[PipelineOps]]' sharded packer) when one language outgrows a task.
    */
  def tokenBudgetSample(docs: DataFrame, budget: Long, salt: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("hv").asc_nulls_first, col("doc_id").asc_nulls_first)
    docs
      .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
      .withColumn("hv",
        PipelineOps.md5Hash32(concat_ws(":", lit(salt), col("doc_id"))))
      .withColumn("cum_before",
        (sum(col("n_toks")).over(w) - col("n_toks")).cast("long"))
      .filter(col("cum_before") < budget)
      .select(col("doc_id"), col("lang"), col("n_toks"), col("cum_before"))
  }

  /** The final training-order manifest — the capstone composition of
    * this tier: per-source epoch up-sampling ([[epochMix]]), then a
    * deterministic global shuffle of the replicated stream (salted hash
    * over (doc_id, epoch), positions via [[ScalePatterns.withGlobalRank]]),
    * then token packing of the SHUFFLED order into fixed-capacity bins.
    * The running token sum over a global order would be one task as a
    * window; it decomposes exactly like [[PipelineOps.packTokensSharded]]
    * — within-shard cumulative sums over dense-position ranges, stitched
    * by a prefix sum over the shard AGGREGATES (rows/shardWidth rows,
    * broadcast back) — so the manifest is bit-identical to the
    * sequential definition at any shard width. shardWidth must scale
    * with the corpus (~rows/cluster-cores).
    */
  def trainingManifest(docs: DataFrame, binTokens: Int, salt: String,
      shardWidth: Long): DataFrame = {
    // epoch derivation inlined (same epochReps column as epochMix)
    // rather than joining the mix back against docs for the text — the
    // replication must stay map-only; a corpus-sized shuffle join just
    // to recover n_toks would betray the operator's own scale claim
    val keyed = docs
      .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
      .withColumn("reps", epochReps)
      .withColumn("epoch", explode(sequence(lit(0L), col("reps") - 1)))
      .withColumn("hv", PipelineOps.md5Hash32(
        concat_ws(":", lit(salt), col("doc_id"), col("epoch"))))
      .select(col("doc_id"), col("epoch"), col("hv"), col("n_toks"))
    val ranked = ScalePatterns.withGlobalRank(keyed, "pos",
      col("hv").asc_nulls_first, col("doc_id").asc_nulls_first,
      col("epoch").asc_nulls_first)
    val base = ranked.withColumn("__shard",
      floor((col("pos") - 1) / shardWidth))
    val wIn = Window.partitionBy(col("__shard")).orderBy(col("pos").asc)
    val within = base.withColumn("__cum_in", sum(col("n_toks")).over(wIn))
    // the stitch window runs over shard SUMMARIES only — bounded by
    // rows/shardWidth, never the manifest itself
    val wShard = Window.orderBy(col("__shard").asc)
    val offsets = base.groupBy(col("__shard"))
      .agg(sum(col("n_toks")).as("__tot"))
      .withColumn("__off", sum(col("__tot")).over(wShard) - col("__tot"))
      .select(col("__shard"), col("__off"))
    within.join(broadcast(offsets), Seq("__shard"))
      .select(col("pos"), col("doc_id"), col("epoch"), col("n_toks"),
        floor((col("__off") + col("__cum_in") - col("n_toks")) /
          lit(binTokens)).cast("bigint").as("bin"))
  }

  /** Fixed token windows over (doc_id, text): a doc with n tokens
    * yields 1 + ceil((n - chunk) / stride) chunks (one when n <= chunk,
    * so no document disappears); the final chunk is short rather than
    * padded, and consecutive chunks overlap by chunk - stride tokens.
    * Map-only: one split + one bounded sequence explode per doc, no
    * shuffle — embarrassingly parallel at 100 TB.
    */
  def chunkDocs(docs: DataFrame, chunk: Int, stride: Int): DataFrame = {
    require(chunk > 0 && stride > 0 && stride <= chunk,
      s"need 0 < stride <= chunk, got chunk=$chunk stride=$stride")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .withColumn("n", size(col("ts")))
      .withColumn("chunk_idx", explode(sequence(lit(0),
        when(col("n") <= chunk, lit(0)).otherwise(
          ceil((col("n") - lit(chunk)) / lit(stride.toDouble)))
          .cast("int"))))
      .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        array_join(expr(s"slice(ts, chunk_idx * $stride + 1, $chunk)"),
          " ").as("chunk_text"),
        least(lit(chunk), col("n") - col("chunk_idx") * stride)
          .cast("bigint").as("n_chunk_toks"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark decontamination: eval set = doc_id % 23 == 0, 5-grams.
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      decontaminate(
        docs.filter(col("doc_id") % 23 =!= 0),
        docs.filter(col("doc_id") % 23 === 0), n = 5)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    "q_text_repetition" -> ((s, d) =>
      repetitionScores(Tables.documents(s, d))
        .orderBy(col("doc_id").asc_nulls_first)),

    "q_dedup_spans" -> ((s, d) =>
      duplicatedSpanScores(DedupOps.shingleRows(s, d))
        .orderBy(col("doc_id").asc_nulls_first)),

    // Exact duplicated-span REMOVAL (Lee et al. 2022's ExactSubstr at
    // token granularity): every token covered by a 10-token span that
    // also appears verbatim in ANOTHER document is cut, and the
    // survivors are stitched back in order. Where q_dedup_spans only
    // SCORES overlap, this emits the cleaned text — the op that
    // actually shrinks the corpus. The span length is the precision
    // knob (Lee et al. used 50 BPE tokens; 10 words separates verbatim
    // copying from shared phrasing on this corpus — trigrams would cut
    // 93% of a template-phrased corpus). Plan shape: positioned span
    // explode -> cross-doc frequency (partial-agg'd equi-join, the
    // distributed stand-in for the suffix table) -> covered-position
    // anti-join -> per-doc ordered stitch. Every join is keyed on span
    // or (doc, position); nothing is quadratic in documents.
    "q_dedup_span_removal" -> ((s, d) => {
      val n = 10
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
      val pos = toks.select(col("doc_id"), col("ts"),
          posexplode(col("ts")).as(Seq("p0", "tok")))
        .withColumn("i", (col("p0") + 1).cast("int"))
      val grams = pos.filter(col("i") <= size(col("ts")) - (n - 1))
        .select(col("doc_id"), col("i"),
          array_join(expr(s"slice(ts, i, $n)"), " ").as("g"))
      val dup = grams.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("cd"))
        .filter(col("cd") > 1).select(col("g"))
      val cov = grams.join(dup, Seq("g"))
        .select(col("doc_id"),
          explode(expr(s"sequence(i, i + ${n - 1})")).as("pos"))
        .distinct()
      val kept = pos.join(cov,
        pos("doc_id") === cov("doc_id") && pos("i") === cov("pos"), "left_anti")
      val stitched = kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("int").as("n_kept_raw"),
          array_join(expr(
            "transform(array_sort(collect_list(struct(i, tok))), x -> x.tok)"),
            " ").as("cleaned_raw"))
      toks.join(stitched, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), size(col("ts")).as("n_toks"),
          coalesce(col("n_kept_raw"), lit(0)).as("n_kept"),
          coalesce(col("cleaned_raw"), lit("")).as("cleaned"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Context-window chunking: long documents split into fixed token
    // windows (chunk=50, stride=40 -> 10-token overlap) with per-chunk
    // provenance (doc_id, chunk_idx) — the long-doc -> training-context
    // splitter every context-bounded trainer runs. See [[chunkDocs]].
    "q_chunk_documents" -> ((s, d) =>
      chunkDocs(Tables.documents(s, d), chunk = 50, stride = 40)
        .orderBy(col("doc_id").asc_nulls_first,
          col("chunk_idx").asc_nulls_first)),

    "q_shuffle_global" -> ((s, d) =>
      globalShuffle(Tables.documents(s, d), "shuf42")
        .orderBy(col("pos").asc_nulls_first)),

    "q_mix_epochs" -> ((s, d) =>
      epochMix(Tables.documents(s, d))
        .orderBy(col("doc_id").asc_nulls_first,
          col("epoch").asc_nulls_first)),

    // Temperature-based mixture weights (the multilingual-LLM data-mix
    // standard): per-language sampling weight n^tau / sum(n^tau) with
    // tau = 0.7 — temperature < 1 up-weights low-resource languages
    // relative to proportional sampling. One tiny grouped aggregate +
    // a scalar-broadcast normalization; quota = floor(weight * budget).
    // pow/r4 rounding is the same IEEE arithmetic both engines run
    // (same class as the log in q_text_entropy, hash-match-verified).
    "q_mix_temperature" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .withColumn("w_raw", pow(col("n").cast("double"), lit(0.7)))
      val total = counts.agg(sum(col("w_raw")).as("w_sum"))
      counts.crossJoin(broadcast(total))
        .withColumn("weight", graft.Det.r4(col("w_raw") / col("w_sum")))
        .withColumn("quota",
          floor(col("w_raw") / col("w_sum") * lit(1000.0)).cast("bigint"))
        .select(col("lang"), col("n"), col("weight"), col("quota"))
        .orderBy(col("lang").asc_nulls_first)
    }),

    // shardWidth 500 exercises multi-shard stitching at test scale
    "q_training_manifest" -> ((s, d) =>
      trainingManifest(Tables.documents(s, d), binTokens = 2048,
        salt = "man1", shardWidth = 500L)
        .orderBy(col("pos").asc_nulls_first)),

    "q_text_perplexity" -> ((s, d) =>
      perplexityScores(Tables.documents(s, d))
        .orderBy(col("doc_id").asc_nulls_first)),

    "q_sample_token_budget" -> ((s, d) =>
      tokenBudgetSample(Tables.documents(s, d), budget = 2000L,
        salt = "budget7")
        .orderBy(col("doc_id").asc_nulls_first)),

    // HARD ORACLE since round 12 (was: k-means-seed rows-only): the
    // fitted centroids stage to parquet and DuckDB replays assignment
    // + the within-cell r4-cosine drop set independently — the same
    // staged-boundary trick as q_sim_ann_ivf. Exactness (drops ⊆
    // brute-force cosine pairs) + recall stay unit-asserted in
    // TrainingOpsSuite. k=4 suits the 500-vector test corpus; at
    // scale pick k ~ sqrt(n) (SemDeDup used 50k cells for 5B docs) so
    // the within-cell self-join stays ~n^1.5 total work.
    "q_dedup_semantic" -> ((s, d) =>
      semanticDedup(Tables.embeddings(s, d), k = 4, iters = 2,
        threshold = 0.35, stagePath = Some(semCentroidsPath))
        .orderBy(col("vec_id").asc_nulls_first))
  )

  private val gram5 =
    """list_transform(range(1, len(ts) - 3),
      |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
      |           ts[i+3] || ' ' || ts[i+4])""".stripMargin

  /** Staged-centroids path for q_dedup_semantic — process-scoped like
    * every other oracle-read staging (see graft.StagePaths).
    */
  private def semCentroidsPath: String =
    s"${graft.StagePaths.root}/semdedup_centroids"

  val oracle: Map[String, String] = Map(
    // assignment + drop set replayed over the staged centroids: argmin
    // cell by (cn2 − 2·x·c, c), within-cell v1 < v2 pairs at
    // r4-cosine ≥ 0.35, survivors = anti-join — the engine pipeline
    // in SQL, bit-exact through the shared left-associated dot fold
    "q_dedup_semantic" ->
      s"""WITH cent AS (
         |  SELECT c, vec, cn2
         |  FROM read_parquet('$semCentroidsPath/*.parquet')),
         |dist AS (
         |  SELECT e.vec_id, cent.c,
         |    cent.cn2 - 2.0 * list_sum(list_transform(
         |      list_zip(e.embedding, cent.vec),
         |      p -> CAST(p[1] AS DOUBLE) * p[2])) AS d
         |  FROM embeddings e CROSS JOIN cent),
         |asg AS (
         |  SELECT vec_id, c AS cell FROM (
         |    SELECT vec_id, c, row_number() OVER (
         |        PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) WHERE rn = 1),
         |e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id AS v2
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  JOIN e q ON q.vec_id = a.vec_id
         |  JOIN e n ON n.vec_id = b.vec_id
         |  WHERE floor((list_sum(list_transform(
         |      list_zip(q.embedding, n.embedding),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         |      / (q.nrm * n.nrm)) * 10000 + CAST(0.5 AS DOUBLE))
         |      / CAST(10000 AS DOUBLE) >= CAST(0.35 AS DOUBLE))
         |SELECT vec_id, label FROM embeddings
         |WHERE vec_id NOT IN (SELECT v2 FROM dropped)
         |ORDER BY vec_id ASC NULLS FIRST""".stripMargin,
    "q_decontaminate" ->
      s"""WITH g5 AS (
        |  SELECT doc_id, unnest(list_distinct($gram5)) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
        |  WHERE len(ts) >= 5),
        |bench AS (SELECT DISTINCT g FROM g5 WHERE doc_id % 23 = 0),
        |cont AS (
        |  SELECT DISTINCT doc_id FROM g5
        |  WHERE doc_id % 23 <> 0 AND g IN (SELECT g FROM bench))
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id % 23 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, list_transform(range(1, len(ts) - 1),
        |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS tris
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
        |  WHERE len(ts) >= 3)
        |SELECT doc_id, len(tris) AS total_tris,
        |  len(list_distinct(tris)) AS distinct_tris,
        |  floor((1.0 - len(list_distinct(tris)) / CAST(len(tris) AS DOUBLE))
        |    * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS dup_frac
        |FROM t ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_dedup_spans" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(ts) - 1),
        |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
        |  WHERE len(ts) >= 3),
        |ex AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS g FROM sh),
        |dfc AS (SELECT g, count(DISTINCT doc_id) AS df FROM ex GROUP BY 1)
        |SELECT e.doc_id, any_value(e.sz) AS sz,
        |  count(CASE WHEN d.df >= 2 THEN 1 END) AS shared,
        |  floor((count(CASE WHEN d.df >= 2 THEN 1 END)
        |      / CAST(any_value(e.sz) AS DOUBLE))
        |    * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS shared_frac
        |FROM ex e JOIN dfc d ON e.g = d.g
        |GROUP BY e.doc_id ORDER BY e.doc_id ASC NULLS FIRST""".stripMargin,
    "q_dedup_span_removal" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |pos AS (
        |  SELECT doc_id, ts,
        |    CAST(generate_subscripts(ts, 1) AS INT) AS i,
        |    unnest(ts) AS tok
        |  FROM toks),
        |grams AS (
        |  SELECT doc_id, i, array_to_string(ts[i:i+9], ' ') AS g
        |  FROM pos WHERE i <= len(ts) - 9),
        |dup AS (
        |  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) > 1),
        |cov AS (
        |  SELECT DISTINCT grams.doc_id, grams.i + o.d AS pos
        |  FROM grams JOIN dup USING (g)
        |  CROSS JOIN UNNEST(range(0, 10)) AS o(d)),
        |kept AS (
        |  SELECT p.doc_id, p.i, p.tok
        |  FROM pos p LEFT JOIN cov
        |    ON p.doc_id = cov.doc_id AND p.i = cov.pos
        |  WHERE cov.pos IS NULL)
        |SELECT t.doc_id, CAST(len(t.ts) AS INT) AS n_toks,
        |  CAST(count(k.i) AS INT) AS n_kept,
        |  coalesce(string_agg(k.tok, ' ' ORDER BY k.i), '') AS cleaned
        |FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
        |GROUP BY t.doc_id, len(t.ts)
        |ORDER BY t.doc_id ASC NULLS FIRST""".stripMargin,
    "q_chunk_documents" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, ts, n,
        |    unnest(generate_series(0,
        |      CASE WHEN n <= 50 THEN 0
        |           ELSE CAST(ceil((n - 50) / 40.0) AS BIGINT) END)) AS chunk_idx
        |  FROM t)
        |SELECT doc_id, chunk_idx,
        |  array_to_string(ts[chunk_idx*40 + 1 : chunk_idx*40 + 50], ' ')
        |    AS chunk_text,
        |  least(50, n - chunk_idx*40) AS n_chunk_toks
        |FROM c
        |ORDER BY doc_id ASC NULLS FIRST, chunk_idx ASC NULLS FIRST""".stripMargin,
    "q_shuffle_global" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5('shuf42:' || CAST(doc_id AS VARCHAR)),
        |      1, 8)) AS BIGINT) AS hv
        |  FROM documents)
        |SELECT doc_id, lang, hv,
        |  row_number() OVER (ORDER BY hv ASC NULLS FIRST,
        |    doc_id ASC NULLS FIRST) AS pos
        |FROM h ORDER BY pos ASC NULLS FIRST""".stripMargin,
    "q_training_manifest" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(source), 1, 8)) AS BIGINT) % 3 + 1
        |      AS reps
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, unnest(generate_series(0, reps - 1)) AS epoch
        |  FROM m),
        |k AS (
        |  SELECT e.doc_id, e.epoch,
        |    CAST(('0x' || substring(md5('man1:' || CAST(e.doc_id AS VARCHAR)
        |      || ':' || CAST(e.epoch AS VARCHAR)), 1, 8)) AS BIGINT) AS hv,
        |    len(string_split(d.text, ' ')) AS n_toks
        |  FROM e JOIN documents d ON e.doc_id = d.doc_id),
        |r AS (
        |  SELECT doc_id, epoch, n_toks,
        |    row_number() OVER (ORDER BY hv ASC NULLS FIRST,
        |      doc_id ASC NULLS FIRST, epoch ASC NULLS FIRST) AS pos
        |  FROM k)
        |SELECT pos, doc_id, epoch, n_toks,
        |  CAST(floor((sum(n_toks) OVER (ORDER BY pos ASC
        |    ROWS UNBOUNDED PRECEDING) - n_toks) / 2048) AS BIGINT) AS bin
        |FROM r ORDER BY pos ASC NULLS FIRST""".stripMargin,
    "q_text_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tot AS (SELECT count(*) AS n, count(DISTINCT term) AS v FROM toks),
        |lm AS (SELECT term, count(*) AS c FROM toks GROUP BY 1)
        |SELECT t.doc_id, count(*) AS n_toks,
        |  floor(avg(-ln((l.c + 1) / CAST((SELECT n FROM tot)
        |      + (SELECT v FROM tot) AS DOUBLE)))
        |    * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS xent
        |FROM toks t JOIN lm l ON t.term = l.term
        |GROUP BY t.doc_id ORDER BY t.doc_id ASC NULLS FIRST""".stripMargin,
    "q_sample_token_budget" ->
      """WITH h AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_toks,
        |    CAST(('0x' || substring(md5('budget7:' || CAST(doc_id AS VARCHAR)),
        |      1, 8)) AS BIGINT) AS hv
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_toks,
        |    CAST(sum(n_toks) OVER (PARTITION BY lang
        |      ORDER BY hv ASC NULLS FIRST, doc_id ASC NULLS FIRST)
        |      - n_toks AS BIGINT) AS cum_before
        |  FROM h)
        |SELECT doc_id, lang, n_toks, cum_before FROM c
        |WHERE cum_before < 2000
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    // identical n^0.7 normalization; floor quota over a 1000-doc budget
    "q_mix_temperature" ->
      """WITH c AS (
        |  SELECT lang, count(1) AS n,
        |    pow(CAST(count(1) AS DOUBLE), 0.7) AS w_raw
        |  FROM documents GROUP BY lang),
        |t AS (SELECT sum(w_raw) AS w_sum FROM c)
        |SELECT lang, n,
        |  floor((w_raw / w_sum) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS weight,
        |  CAST(floor(w_raw / w_sum * 1000.0) AS BIGINT) AS quota
        |FROM c CROSS JOIN t
        |ORDER BY lang ASC NULLS FIRST""".stripMargin,
    "q_mix_epochs" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substring(md5(source), 1, 8)) AS BIGINT) % 3 + 1
        |      AS reps
        |  FROM documents)
        |SELECT doc_id, source, reps, unnest(generate_series(0, reps - 1))
        |  AS epoch
        |FROM r ORDER BY doc_id ASC NULLS FIRST, epoch ASC NULLS FIRST""".stripMargin
  )
}
