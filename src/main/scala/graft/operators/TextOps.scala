package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines over `documents`: language
  * scoring, quality features, token counting, fingerprinting, per-corpus
  * stats. All pure `functions._`/higher-order expressions — codegen'd,
  * no UDFs — so each is a single scan with map-side aggregation only
  * where grouped; at 100 TB these are embarrassingly parallel scans.
  */
object TextOps {

  private val stopwords = Seq("the", "a", "of", "and", "is", "to", "in")
  private val stopList = stopwords.map(w => s"'$w'").mkString("(", ",", ")")

  /** The winnowing fingerprint frame (doc_id, fp_pos, fp_hash) shared by
    * q_text_winnowing and q_dedup_winnow — one definition so the
    * fingerprint index and the similarity join can never drift apart.
    */
  private def winnowFingerprints(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Kgram5HashExpr.winnow_kgram5
    val P = 8589934592L // 2^33
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("pos").asc).rowsBetween(-3, 0)
    Tables.documents(s, d)
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"),
        posexplode(winnow_kgram5(col("text"))).as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        (col("h") * lit(P) + (lit(P - 1) - (col("pos0") + 1)))
          .as("key"))
      .withColumn("mk", min(col("key")).over(w))
      .filter(col("pos") >= 4)
      .select(col("doc_id"),
        (lit(P - 1) - pmod(col("mk"), lit(P))).cast("int")
          .as("fp_pos"),
        shiftright(col("mk"), 33).as("fp_hash"))
      .distinct()
  }

  /** The fingerprint pipeline as a DuckDB CTE chain ending in
    * `fp(doc_id, fp_pos, fp_hash)` — shared by the two winnow oracles.
    */
  private val winnowCte: String =
    """g AS (
      |  SELECT doc_id, unnest(list_transform(range(1, length(text) - 3),
      |    p -> {'pos': p,
      |          'h': list_reduce(
      |            list_prepend(CAST(0 AS BIGINT),
      |              list_transform(range(0, 5),
      |                j -> CAST(ascii(substr(text, CAST(p + j AS INT), 1)) AS BIGINT))),
      |            (acc, x) -> (acc * 31 + x) % 1000000007)})) AS u
      |  FROM documents WHERE length(text) >= 5),
      |k AS (
      |  SELECT doc_id, u.pos AS pos,
      |    u.h * 8589934592 + (8589934591 - u.pos) AS key
      |  FROM g),
      |m AS (
      |  SELECT doc_id, pos,
      |    min(key) OVER (PARTITION BY doc_id ORDER BY pos ASC
      |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk
      |  FROM k),
      |fp AS (
      |  SELECT DISTINCT doc_id,
      |    CAST(8589934591 - (mk % 8589934592) AS INT) AS fp_pos,
      |    mk // 8589934592 AS fp_hash
      |  FROM m WHERE pos >= 4)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Language ID (n-gram/stopword heuristic): score text against an
    // English stopword profile; emit the ratio and the call. (The corpus
    // vocabulary is language-homogeneous, so the interesting part is the
    // deterministic scoring pipeline, not the labels.)
    "q_text_langid" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_toks", size(col("toks")))
        .withColumn("n_stop",
          expr(s"size(filter(toks, t -> t IN $stopList))"))
        .withColumn("stop_ratio",
          graft.Det.r4(col("n_stop") / greatest(col("n_toks"), lit(1))))
        .withColumn("pred_lang",
          when(col("stop_ratio") >= 0.05, "en").otherwise("und"))
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          col("pred_lang"), col("stop_ratio"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Quality scoring: length/stopword/punctuation/token-shape features
    // combined into a bounded score.
    "q_text_quality" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_toks", size(col("toks")))
        .withColumn("n_stop", expr(s"size(filter(toks, t -> t IN $stopList))"))
        .withColumn("n_punct", regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")))
        .withColumn("avg_tok_len",
          graft.Det.r4((length(col("text")) - col("n_toks") + 1) /
            greatest(col("n_toks"), lit(1)).cast("double")))
        .withColumn("quality",
          graft.Det.r4(least(col("n_toks") / lit(100.0), lit(1.0)) * 0.5 +
            (lit(1.0) - least(col("n_punct") / greatest(length(col("text")), lit(1))
              .cast("double") * 10, lit(1.0))) * 0.3 +
            least(col("n_stop") / greatest(col("n_toks"), lit(1)).cast("double")
              * 5, lit(1.0)) * 0.2))
        .select(col("doc_id"), col("n_toks"), col("n_punct"),
          col("avg_tok_len"), col("quality"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Gopher-rules composite quality gate (Rae et al. 2021 §A1.1, the
    // published subset computable on single-line docs): word-count
    // bounds, mean word length in [3, 10], >= 80% words containing an
    // alphabetic char, >= 2 stopwords. Per-rule features + the combined
    // pass verdict, all higher-order expressions on one scan. The gate
    // compares the ROUNDED features (both engines), so the verdict can
    // never drift from the emitted feature columns.
    "q_text_gopher" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_words", size(col("toks")))
        .withColumn("mean_word_len", graft.Det.r4(
          expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))") /
            greatest(col("n_words"), lit(1)).cast("double")))
        .withColumn("alpha_frac", graft.Det.r4(
          expr("size(filter(toks, t -> t rlike '[a-zA-Z]'))") /
            greatest(col("n_words"), lit(1)).cast("double")))
        .withColumn("n_stop", expr(s"size(filter(toks, t -> t IN $stopList))"))
        .withColumn("passes",
          col("n_words").between(50, 100000) &&
            col("mean_word_len").between(3.0, 10.0) &&
            col("alpha_frac") >= 0.8 && col("n_stop") >= 2)
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("alpha_frac"), col("n_stop"), col("passes"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (letter runs / digit runs / single non-alphanumerics).
    "q_text_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))
            .as("bpe_tokens"),
          length(col("text")).as("n_chars_measured"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Document fingerprinting: order-sensitive polynomial rolling hash
    // over characters, mod 1e9+7 — identical fold on the DuckDB side.
    "q_text_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("""aggregate(
                 |  transform(sequence(1, length(text)), i -> ascii(substr(text, i, 1))),
                 |  CAST(0 AS BIGINT),
                 |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin)
            .as("fingerprint"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    // MOSS document-fingerprint selection): every 5-char k-gram gets the
    // same portable polynomial hash as q_text_fingerprint; each window
    // of 4 consecutive k-grams selects its RIGHTMOST minimal hash. The
    // guarantee: any shared substring of length >= 8 yields at least one
    // shared selected fingerprint, with a bounded fingerprint density —
    // the standard local dedup/plagiarism index primitive. The rightmost
    // tie-break rides inside exact integer arithmetic (key = h*2^33 +
    // (2^33-1-pos); min key = min hash, max pos — h < 2^30 so the key
    // stays inside a positive long, and the 33-bit position field
    // covers any document an executor could hold), so the whole
    // pipeline is oracle-exact. The per-gram hash is a fused codegen
    // expression (Kgram5HashExpr — the HOF formulation ran interpreted
    // per position, ~10 s at sf0.1). Per-doc windows partition by
    // doc_id.
    "q_text_winnowing" -> ((s, d) =>
      winnowFingerprints(s, d)
        .orderBy(col("doc_id").asc_nulls_first,
          col("fp_pos").asc_nulls_first)),

    // Winnow-fingerprint near-dup candidates (the MOSS similarity join
    // over q_text_winnowing's output): docs sharing >= 2 RARE selected
    // fingerprints. The document-frequency cap (df <= 10) is both the
    // published practice (stop-fingerprints carry no signal) and the
    // scale guard — it bounds every join bucket, so candidate pairs
    // grow with true overlap, never quadratically in a hot n-gram's
    // popularity. Equi-join on the fingerprint hash, group by pair.
    "q_dedup_winnow" -> ((s, d) => {
      // the fingerprint frame feeds the df-cap aggregation AND both
      // sides of the pair join — lazy persist so the winnow pipeline
      // runs once per session instead of once per consumer
      // (CacheManager dedupes repeated persists of the same plan; the
      // same session-lifetime discipline as AnalyticsOps.orderPartSets)
      val fps = winnowFingerprints(s, d)
        .select(col("doc_id"), col("fp_hash")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rare = fps.groupBy(col("fp_hash"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= 10)
        .select(col("fp_hash"))
      val kept = fps.join(rare, Seq("fp_hash"))
      kept.select(col("fp_hash"), col("doc_id").as("d1"))
        .join(kept.select(col("fp_hash"), col("doc_id").as("d2")),
          Seq("fp_hash"))
        .filter(col("d1") < col("d2"))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy(col("d1").asc_nulls_first, col("d2").asc_nulls_first)
    }),

    // Character-entropy quality signal (gibberish / mojibake detection):
    // Shannon entropy of the per-document character distribution, plus
    // alphabet size. Low entropy = repetitive filler, abnormally high =
    // random noise; a standard cheap filter feature in corpus cleaning.
    // Char explode -> two partial-agg groupBys keyed by doc.
    "q_text_entropy" -> ((s, d) => {
      val chars = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "")
      val f = chars.groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("n"))
      val t = f.groupBy(col("doc_id"))
        .agg(sum(col("n")).as("tot"), count(lit(1)).as("alphabet"))
      f.join(t, Seq("doc_id"))
        .withColumn("p", col("n") / col("tot").cast("double"))
        .groupBy(col("doc_id"), col("alphabet"))
        .agg(graft.Det.r4(-sum(col("p") * log(col("p")))).as("entropy"))
        .select(col("doc_id"), col("alphabet"), col("entropy"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Corpus stats per language: doc counts, token volume, distinct
    // vocabulary (reference R19-shape lateral + aggregation).
    "q_text_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          explode(split(col("text"), " ")).as("token"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("total_tokens"),
          countDistinct(col("token")).as("vocab"))
        .orderBy(col("lang").asc_nulls_first)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_text_langid" ->
      s"""SELECT doc_id, lang AS labeled_lang,
         |  CASE WHEN floor((len(list_filter(string_split(text, ' '),
         |      t -> t IN $stopList))
         |    / greatest(len(string_split(text, ' ')), 1)) * 10000
         |    + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) >= 0.05
         |    THEN 'en' ELSE 'und' END AS pred_lang,
         |  floor((len(list_filter(string_split(text, ' '), t -> t IN $stopList))
         |    / greatest(len(string_split(text, ' ')), 1)) * 10000
         |    + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS stop_ratio
         |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_text_quality" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' ')) AS n_toks,
         |    len(list_filter(string_split(text, ' '), t -> t IN $stopList))
         |      AS n_stop,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
         |    length(text) AS n_chars
         |  FROM documents)
         |SELECT doc_id, CAST(n_toks AS INT) AS n_toks,
         |  CAST(n_punct AS INT) AS n_punct,
         |  floor(((n_chars - n_toks + 1) / CAST(greatest(n_toks, 1) AS DOUBLE)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE)
         |    AS avg_tok_len,
         |  round(least(n_toks / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
         |      * CAST(0.5 AS DOUBLE) +
         |    (CAST(1.0 AS DOUBLE) - least(
         |      n_punct / CAST(greatest(n_chars, 1) AS DOUBLE) * 10,
         |      CAST(1.0 AS DOUBLE))) * CAST(0.3 AS DOUBLE) +
         |    least(n_stop / CAST(greatest(n_toks, 1) AS DOUBLE) * 5,
         |      CAST(1.0 AS DOUBLE)) * CAST(0.2 AS DOUBLE),
         |    4) AS quality
         |FROM f ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_text_gopher" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' ')) AS n_words,
         |    floor((list_sum(list_transform(string_split(text, ' '),
         |        t -> length(t)))
         |      / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE))
         |      * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE)
         |      AS mean_word_len,
         |    floor((len(list_filter(string_split(text, ' '),
         |        t -> regexp_matches(t, '[a-zA-Z]')))
         |      / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE))
         |      * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE)
         |      AS alpha_frac,
         |    len(list_filter(string_split(text, ' '), t -> t IN $stopList))
         |      AS n_stop
         |  FROM documents)
         |SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len,
         |  alpha_frac, CAST(n_stop AS INT) AS n_stop,
         |  (n_words BETWEEN 50 AND 100000
         |   AND mean_word_len BETWEEN 3.0 AND 10.0
         |   AND alpha_frac >= 0.8 AND n_stop >= 2) AS passes
         |FROM f ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
        |    AS INT) AS bpe_tokens,
        |  CAST(length(text) AS INT) AS n_chars_measured
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    // identical k-gram polynomial hash, window min with the rightmost
    // tie-break encoded in the same integer key
    "q_text_winnowing" ->
      s"""WITH $winnowCte
        |SELECT doc_id, fp_pos, fp_hash FROM fp
        |ORDER BY doc_id ASC NULLS FIRST, fp_pos ASC NULLS FIRST""".stripMargin,
    // the MOSS similarity join over the same fingerprint CTE
    "q_dedup_winnow" ->
      s"""WITH $winnowCte,
        |fph AS (SELECT DISTINCT doc_id, fp_hash FROM fp),
        |rare AS (SELECT fp_hash FROM fph
        |         GROUP BY fp_hash HAVING count(1) <= 10),
        |kept AS (SELECT f.doc_id, f.fp_hash
        |         FROM fph f JOIN rare USING (fp_hash))
        |SELECT a.doc_id AS d1, b.doc_id AS d2, count(1) AS n_shared
        |FROM kept a JOIN kept b
        |  ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(1) >= 2
        |ORDER BY d1 ASC NULLS FIRST, d2 ASC NULLS FIRST""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(text) + 1),
        |        i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_text_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |f AS (SELECT doc_id, ch, count(1) AS n FROM c
        |      WHERE ch <> '' GROUP BY doc_id, ch),
        |t AS (SELECT doc_id, sum(n) AS tot, count(1) AS alphabet
        |      FROM f GROUP BY doc_id)
        |SELECT f.doc_id, CAST(t.alphabet AS BIGINT) AS alphabet,
        |  floor((-sum((f.n / CAST(t.tot AS DOUBLE)) *
        |    ln(f.n / CAST(t.tot AS DOUBLE)))) * 10000
        |    + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS entropy
        |FROM f JOIN t ON f.doc_id = t.doc_id
        |GROUP BY f.doc_id, t.alphabet
        |ORDER BY f.doc_id ASC NULLS FIRST""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  count(1) AS total_tokens,
        |  CAST(count(DISTINCT token) AS BIGINT) AS vocab
        |FROM (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM documents) t
        |GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin
  )
}
