package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the
  * canonical "tokenizer built from the whole corpus" workload of an LLM
  * data pipeline (Sennrich et al., ACL'16).
  *
  * The scalable formulation: merges never cross word boundaries, so
  * training runs over the WORD-FREQUENCY DICTIONARY, not the corpus —
  * one corpus pass builds (word, freq), and every merge round after
  * that touches only the distinct-word table (vocabulary-sized, orders
  * of magnitude smaller than the corpus; at 100 TB the dict is the
  * classic heavy-hitters table). Each round is:
  *
  *   1. explode each word's adjacent symbol pairs, weighted by word
  *      freq -> groupBy(pair).sum(freq)  (one small shuffle)
  *   2. argmax pair with a deterministic tie-break (freq desc, then
  *      lexicographic) — a 1-row collect
  *   3. rewrite every word's symbol array with the merged pair via a
  *      left-to-right non-overlapping fold (`aggregate` HOF — runs on
  *      the vocabulary table only, where interpreted HOF cost is
  *      irrelevant; the corpus is never re-touched)
  *
  * Rounds are fixed (default 16) with an early stop once the best pair
  * drops below freq 2 — merging hapax pairs memorizes the corpus.
  * Everything is deterministic: no RNG, stable tie-breaks, and the
  * per-round `localCheckpoint` only truncates lineage.
  *
  * Application (`tokenize`) is a broadcast dictionary join: corpus
  * words -> trained symbol arrays — again one corpus pass, map-only.
  *
  * Reference analog: none (the reference has no tokenizer); extends
  * SURVEY.md §2.3's training-pipeline inventory.
  */
object BpeOps {

  /** (merge_idx, left, right, pair freq) plus the trained dictionary
    * (word, freq, syms).
    */
  case class Trained(merges: Seq[(Int, String, String, Long)],
      dict: DataFrame)

  // backslashes must double too: Spark's default parser treats \ in a
  // string literal as an escape, so a symbol like "\t" interpolated raw
  // would parse as TAB and the rewrite would silently miss (or a
  // trailing \ would swallow the closing quote)
  private def sqlQuote(s: String): String =
    s.replace("\\", "\\\\").replace("'", "''")

  /** Code-point split (NOT char split): `substring` in the distributed
    * path counts code points, so the local path must too or an
    * astral-plane character would diverge between the two.
    */
  private[operators] def codePointSyms(w: String): Vector[String] =
    w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toVector

  /** word -> initial symbols: its characters plus the `</w>` end-of-word
    * marker (merges can learn word-final units but never cross words).
    */
  private val initSyms: Column = concat(
    expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
    array(lit("</w>")))

  /** One merge applied to a symbol array: left-to-right, non-overlapping
    * (so 'aaa' under (a,a) becomes [aa, a], exactly like the published
    * algorithm). A fold with one-symbol lookbehind: the merged symbol
    * becomes the new pending element, so it can seed LATER merges but
    * never re-pairs with the element it just consumed.
    */
  private def mergeOnce(a: String, b: String): Column = {
    val qa = sqlQuote(a); val qb = sqlQuote(b); val qab = sqlQuote(a + b)
    expr(
      s"""aggregate(syms,
         |  named_struct('res', cast(array() as array<string>),
         |               'prev', cast(null as string)),
         |  (acc, x) -> case
         |    when acc.prev is null then named_struct('res', acc.res, 'prev', x)
         |    when acc.prev = '$qa' and x = '$qb'
         |      then named_struct('res', acc.res, 'prev', '$qab')
         |    else named_struct('res', concat(acc.res, array(acc.prev)),
         |                      'prev', x) end,
         |  acc -> concat(acc.res, array(acc.prev)))""".stripMargin)
  }

  /** The corpus word-frequency dictionary (lowercased, whitespace
    * tokenized — matching the engine's other text ops).
    */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Training entry. The corpus -> (word, freq) pass is always
    * distributed (that is the data-sized job); the merge LOOP then runs
    * in one of two equivalent places, like the connected-components
    * endgame (PipelineOps.connectedComponentsWithRounds):
    *
    *   - dictionary within `localDictLimit`: collect it and loop on the
    *     driver — the published algorithm verbatim, no per-round job
    *     scheduling (16 rounds of cluster jobs over a 3k-word table is
    *     pure overhead).
    *   - larger: the distributed rounds ([[trainDistributed]]) — pair
    *     count shuffle + 1-row argmax collect + HOF rewrite per round.
    *
    * Both paths are deterministic and BpeSuite asserts they produce
    * IDENTICAL merge lists.
    */
  def train(docs: DataFrame, nMerges: Int = 16, minFreq: Long = 2,
      localDictLimit: Long = 200000): Trained = {
    // the count() probe and the path that follows (collect OR the first
    // distributed round) both read the dict — persist so the corpus
    // aggregation runs ONCE, released as soon as the path has its copy
    val wf = wordFreq(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (wf.count() <= localDictLimit) {
        val s = docs.sparkSession
        import s.implicits._
        val freqs = wf.collect().map(r => r.getString(0) -> r.getLong(1))
        val (merges, dict) = localTrain(freqs, nMerges, minFreq)
        Trained(merges,
          dict.toSeq.toDF("word", "freq", "syms"))
      } else trainDistributed(wf, nMerges, minFreq)
    } finally { wf.unpersist(blocking = false); () }
  }

  /** The merge loop as driver code — exactly the published algorithm;
    * bounded by the collected dictionary size.
    */
  private def localTrain(freqs: Array[(String, Long)], nMerges: Int,
      minFreq: Long): (Seq[(Int, String, String, Long)],
      Array[(String, Long, Seq[String])]) = {
    var dict: Array[(String, Long, Vector[String])] = freqs.map {
      case (w, f) => (w, f, codePointSyms(w) :+ "</w>")
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (_, f, syms) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (n < minFreq) done = true
        else {
          out += ((i, a, b, n))
          dict = dict.map { case (w, f, syms) =>
            val res = scala.collection.mutable.ArrayBuffer.empty[String]
            var prev: String = null
            syms.foreach { x =>
              if (prev == null) prev = x
              else if (prev == a && x == b) prev = a + b
              else { res += prev; prev = x }
            }
            if (prev != null) res += prev
            (w, f, res.toVector)
          }
          i += 1
        }
      }
    }
    (out.toSeq, dict.map { case (w, f, s) => (w, f, s: Seq[String]) })
  }

  /** The distributed merge rounds — the 100 TB path for dictionaries too
    * large to collect (each round's shuffle is dictionary-sized, never
    * corpus-sized).
    */
  private[operators] def trainDistributed(wf: DataFrame, nMerges: Int,
      minFreq: Long): Trained = {
    var dict = wf.withColumn("syms", initSyms).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      // guard the fully-merged word: sequence(1, 0) DESCENDS in Spark,
      // so a 1-symbol array would evaluate element_at(syms, 2) and throw
      // under ANSI — emit no pairs instead
      val top = dict
        .select(col("freq"), explode(expr(
          "CASE WHEN size(syms) >= 2 THEN " +
            "transform(sequence(1, size(syms) - 1), i -> " +
            "named_struct('a', element_at(syms, i), " +
            "'b', element_at(syms, i + 1))) " +
            "ELSE array() END")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minFreq) done = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((i, a, b, n))
        dict = dict.withColumn("syms", mergeOnce(a, b)).localCheckpoint()
        i += 1
      }
    }
    Trained(merges.toSeq, dict)
  }

  /** Session-lifetime memo: training is deterministic per corpus dir, so
    * q_bpe_train and q_bpe_tokenize share one trained model per sf.
    *
    * ASSUMES the corpus under a dir is immutable for the session (the
    * testdata contract — the driver never rewrites an sf dir mid-run);
    * a corpus mutated in place under the same dir would serve a stale
    * model until the session ends. Size is bounded by the number of
    * distinct dataset dirs touched in one session (driver runs touch
    * ≤ 3 sf dirs), each entry dictionary-sized — never corpus-sized.
    */
  private val trainedCache =
    scala.collection.concurrent.TrieMap.empty[String, Trained]

  private def trainedFor(s: SparkSession, d: String): Trained =
    // keyed by app too: a cached dict DataFrame is tied to its session
    trainedCache.getOrElseUpdate(s"${s.sparkContext.applicationId}|$d",
      train(Tables.documents(s, d)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The learned merge table — the tokenizer artifact itself. Oracle:
    // the 16 merge rounds UNROLLED into one DuckDB query (see
    // [[trainRoundsSql]]); BpeSuite additionally replays the published
    // algorithm over the collected word-freq dict on the driver and
    // asserts the merge lists are IDENTICAL, plus determinism.
    "q_bpe_train" -> ((s, d) => {
      import s.implicits._
      trainedFor(s, d).merges
        .toDF("merge_idx", "left_sym", "right_sym", "pair_freq")
        .orderBy(col("merge_idx").asc_nulls_first)
    }),

    // Tokenization = broadcast dict join, one map-only corpus pass:
    // per-doc whitespace word count vs trained BPE token count (the
    // number every token-budget sampler downstream actually needs).
    "q_bpe_tokenize" -> ((s, d) => {
      val dict = trainedFor(s, d).dict
        .select(col("word"), size(col("syms")).as("n_sym"))
      val words = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
      words.join(broadcast(dict), Seq("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
        .orderBy(col("doc_id").asc_nulls_first)
    })
  )

  /** DuckDB replay of BPE training: the fixed 16 merge rounds UNROLLED
    * into one chained-CTE query, so the "iterative argmax" objection to
    * an oracle dissolves — the round count is a compile-time constant,
    * and each round is pure SQL:
    *
    *   - pair counts: explode adjacent symbol pairs weighted by word freq
    *   - argmax: ORDER BY n DESC, a, b LIMIT 1 (the engine's exact
    *     tie-break; corpus words are ASCII so DuckDB's byte collation
    *     and the JVM's UTF-16 compare agree)
    *   - non-overlapping left-to-right merge: DuckDB 1.0's list_reduce
    *     cannot thread a list accumulator, but greedy non-overlap is
    *     expressible POSITIONALLY — a run of consecutive matched pair
    *     starts only occurs when left==right, and greedy merging takes
    *     exactly the odd-ranked starts of each run (run-parity via
    *     window functions), consuming the following symbol.
    *
    * Early stop (minFreq 2) needs no control flow: once the best pair
    * drops below 2 the round's merge gate (mm.n >= 2) makes every later
    * round an identity rewrite of an unchanged dictionary, so the same
    * sub-2 argmax recurs and the final WHERE n >= 2 drops them all —
    * exactly the rounds the engine never ran.
    *
    * Every CTE is MATERIALIZED: rounds reference their predecessor
    * twice (pair counts + positions), so DuckDB's default inline-and-
    * copy planning would duplicate the whole prefix 2^16 times.
    */
  private def trainRoundsSql(nMerges: Int): String = {
    val rounds = (0 until nMerges).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS n FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(syms)),
         |      j -> {'a': syms[j], 'b': syms[j+1]})) AS pr
         |    FROM r$k) GROUP BY pr.a, pr.b),
         |m$k AS MATERIALIZED (SELECT a, b, n FROM p$k ORDER BY n DESC, a ASC, b ASC LIMIT 1),
         |mm$k AS MATERIALIZED (SELECT coalesce(max(a), '') AS a, coalesce(max(b), '') AS b,
         |  CAST(coalesce(max(n), 0) AS BIGINT) AS n FROM m$k),
         |pos$k AS MATERIALIZED (
         |  SELECT word, freq, unnest(syms) AS s,
         |         unnest(range(1, len(syms) + 1)) AS i
         |  FROM r$k),
         |fl$k AS MATERIALIZED (
         |  SELECT word, freq, s, i, mm$k.a AS ma, mm$k.b AS mb,
         |    (mm$k.n >= 2 AND s = mm$k.a AND
         |     lead(s) OVER (PARTITION BY word ORDER BY i) = mm$k.b) AS matched
         |  FROM pos$k CROSS JOIN mm$k),
         |rs$k AS MATERIALIZED (
         |  SELECT *, sum(CASE WHEN matched THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY word ORDER BY i
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM fl$k),
         |rk$k AS MATERIALIZED (
         |  SELECT *, CASE WHEN matched THEN row_number()
         |      OVER (PARTITION BY word, grp, matched ORDER BY i) ELSE 0 END AS rn
         |  FROM rs$k),
         |tk$k AS MATERIALIZED (
         |  SELECT *, (matched AND rn % 2 = 1) AS tk,
         |    lag(matched AND rn % 2 = 1, 1, false)
         |      OVER (PARTITION BY word ORDER BY i) AS consumed
         |  FROM rk$k),
         |r${k + 1} AS MATERIALIZED (
         |  SELECT word, freq, list(o ORDER BY i) FILTER (o IS NOT NULL) AS syms
         |  FROM (SELECT word, freq, i,
         |    CASE WHEN tk THEN ma || mb WHEN consumed THEN NULL ELSE s END AS o
         |    FROM tk$k)
         |  GROUP BY word, freq)""".stripMargin
    }.mkString(",\n")
    s"""WITH wf AS MATERIALIZED (
       |  SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
       |    FROM documents) WHERE length(word) > 0 GROUP BY word),
       |r0 AS MATERIALIZED (
       |  SELECT word, freq,
       |    list_append(list_transform(range(1, length(word) + 1),
       |      i -> substring(word, i, 1)), '</w>') AS syms
       |  FROM wf),
       |$rounds""".stripMargin
  }

  private val defaultMerges = 16

  val oracle: Map[String, String] = Map(
    "q_bpe_train" -> (trainRoundsSql(defaultMerges) + "\n" +
      (0 until defaultMerges).map { k =>
        s"""  SELECT CAST($k AS INT) AS merge_idx, a AS left_sym, b AS right_sym, n AS pair_freq FROM mm$k WHERE n >= 2"""
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n)") +
      " ORDER BY merge_idx ASC NULLS FIRST"),
    "q_bpe_tokenize" -> (trainRoundsSql(defaultMerges) +
      s""",
         |dict AS MATERIALIZED (SELECT word, len(syms) AS n_sym FROM r$defaultMerges),
         |w AS MATERIALIZED (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
         |      FROM documents)
         |SELECT doc_id, count(*) AS n_words, CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
         |FROM (SELECT doc_id, word FROM w WHERE length(word) > 0) x
         |JOIN dict USING (word)
         |GROUP BY doc_id ORDER BY doc_id ASC NULLS FIRST""".stripMargin))
}
