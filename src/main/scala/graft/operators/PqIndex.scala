package graft.operators

import graft.Tables
import graft.functions.PqOps.{pq_adc, pq_encode, pq_lut}
import graft.functions.VectorOps.{vec_dot, vec_norm}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN: the memory tier of the similarity-search
  * story (brute force -> LSH buckets -> IVF cells -> PQ codes).
  *
  * 64-float vectors compress to `m` = 8 one-byte codebook indices (32x),
  * so the scored scan reads 8 bytes per candidate and each score is 8
  * ADC table lookups — the shape that keeps a 100 TB corpus's candidate
  * sweep in memory-bandwidth territory. Codebooks are m subspace
  * k-means models trained on a deterministic hash-ordered sample
  * (driver-bounded, the standard faiss-style training regime); encoding
  * and scoring are native codegen expressions (PqOps). Exactness is
  * restored by re-ranking the top ADC candidates against their true
  * vectors, fetched by id via a broadcast join — so the emitted `dist`
  * is the EXACT L2 distance and only the candidate choice is
  * approximate. Composes with IvfIndex (cells prune the scan, PQ
  * compresses what's scanned -> IVFPQ) — exercised flat here to isolate
  * the PQ contract.
  *
  * Reference analog: none (the reference has no vector surface); this
  * extends SURVEY.md §2.3's LLM-pipeline inventory.
  */
object PqIndex {

  /** Per-subspace Lloyd on a driver-bounded deterministic sample:
    * `maxTrain` vectors in xxhash64(vec_id) order (hash order = an
    * unbiased deterministic shuffle; at 100 TB the same sample comes
    * from a pushed-down TABLESAMPLE). Ties and empty clusters resolve
    * deterministically (lowest index wins; empty keeps its center).
    */
  def fitCodebooks(e: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 8,
      maxTrain: Int = 2048): Array[Array[Array[Double]]] = {
    val train = e.select(col("vec_id"), col("embedding"))
      .withColumn("__h", xxhash64(col("vec_id")))
      .orderBy(col("__h").asc, col("vec_id").asc)
      .limit(maxTrain)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(train.length >= k,
      s"need at least k=$k training vectors, got ${train.length}")
    val dim = train(0).length
    require(dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val sub = dim / m
    Array.tabulate(m) { mi =>
      val xs = train.map(v =>
        java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
      lloyd(xs, k, iters)
    }
  }

  private def lloyd(xs: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    val sub = xs(0).length
    var cents = xs.take(k).map(_.clone)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(Array.ofDim[Double](sub))
      val counts = Array.ofDim[Int](k)
      xs.foreach { x =>
        var bestK = 0
        var bestD = Double.MaxValue
        var ki = 0
        while (ki < k) {
          var d = 0.0
          var j = 0
          while (j < sub) {
            val diff = x(j) - cents(ki)(j); d += diff * diff; j += 1
          }
          if (d < bestD) { bestD = d; bestK = ki }
          ki += 1
        }
        counts(bestK) += 1
        var j = 0
        while (j < sub) { sums(bestK)(j) += x(j); j += 1 }
      }
      cents = Array.tabulate(k) { ki =>
        if (counts(ki) == 0) cents(ki)
        else sums(ki).map(_ / counts(ki))
      }
      it += 1
    }
    cents
  }

  /** The compressed store: (vec_id, codes) — m bytes per vector. */
  def encode(e: DataFrame, cb: Array[Array[Array[Double]]]): DataFrame =
    e.select(col("vec_id"), pq_encode(col("embedding"), cb).as("codes"))

  /** Shared exact tier for the ADC searchers (flat PQ and IVFPQ): fetch
    * each candidate's true vector by id (broadcast — the candidate set
    * is queries x rerank, driver-bounded), score the EXACT L2 via
    * ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b (fp-cancellation tail
    * clamped at 0 before sqrt), keep the top `topK` per query.
    * `cand` must carry (qid, qe, nid, ad).
    */
  private[operators] def exactRerank(e: DataFrame, cand: DataFrame,
      topK: Int): DataFrame = {
    val fetched = e.select(col("vec_id").as("nid"), col("embedding"))
      .join(broadcast(cand), Seq("nid"))
    val wExact = Window.partitionBy(col("qid"))
      .orderBy(col("dist").asc_nulls_last, col("nid").asc_nulls_first)
    fetched
      .withColumn("dist", graft.Det.r4(sqrt(greatest(lit(0.0),
        pow(vec_norm(col("embedding")), 2) + pow(vec_norm(col("qe")), 2)
          - lit(2.0) * vec_dot(col("embedding"), col("qe"))))))
      .withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk"), col("nid"), col("dist"),
        graft.Det.r4(col("ad")).as("adist"))
      .orderBy(col("qid").asc_nulls_first, col("rnk").asc_nulls_first)
  }

  /** ADC search + exact re-rank. `queries` must carry (vec_id,
    * embedding); candidates ranked by approximate squared L2 over the
    * code scan, the top `rerank` per query re-scored exactly.
    */
  def search(e: DataFrame, enc: DataFrame, cb: Array[Array[Array[Double]]],
      queries: DataFrame, rerank: Int, topK: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("lut", pq_lut(col("qe"), cb))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("ad").asc_nulls_last, col("vec_id").asc_nulls_first)
    val cand = enc.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("ad", pq_adc(col("codes"), col("lut")))
      .withColumn("rnk0", row_number().over(wAdc))
      .filter(col("rnk0") <= rerank)
      .select(col("qid"), col("qe"), col("vec_id").as("nid"), col("ad"))
    exactRerank(e, cand, topK)
  }

  /** Stage fitted codebooks to parquet as (mi, ki, vec) rows — the
    * oracle boundary for the PQ searchers, the same staged-boundary
    * trick as IvfAnn.stageCentroids: DuckDB re-derives encode (argmin
    * subspace distance, ties to lowest index), the LUT entries and the
    * ADC sums independently from the staged model.
    */
  private[operators] def stageCodebooks(s: SparkSession,
      cb: Array[Array[Array[Double]]], path: String): Unit = {
    import s.implicits._
    cb.zipWithIndex.flatMap { case (sub, mi) =>
      sub.zipWithIndex.map { case (cw, ki) => (mi, ki, cw.toSeq) }
    }.toIndexedSeq.toDF("mi", "ki", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def pqCodebooksPath: String =
    s"${graft.StagePaths.root}/pq_codebooks"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PQ-ADC search over the full embeddings table: fit codebooks,
    // encode to the 32x-compressed code store, ADC-rank, exact re-rank
    // of the top 32, emit top-5 per query. HARD ORACLE since round 12:
    // the codebooks stage to parquet and DuckDB replays encode + ADC +
    // exact rerank — a wrong code byte, a perturbed LUT entry or a
    // dropped candidate breaks the hash. PqSuite keeps recall vs brute
    // force, exactness of the re-ranked distances, the compression
    // contract, and determinism.
    "q_pq_search" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cb = fitCodebooks(e)
      stageCodebooks(s, cb, pqCodebooksPath)
      val enc = encode(e, cb)
      search(e, enc, cb, e.filter(col("vec_id") < 8), rerank = 32, topK = 5)
    })
  )

  /** DuckDB replay of q_pq_search over the STAGED codebooks. `sd` is
    * the (vector, subspace, codeword) squared-L2 matrix — the engine's
    * per-element `(float→double − codeword)²` left-fold restated as the
    * proven in-order list fold; encode is its per-(vector, subspace)
    * argmin (ties to lowest ki, the engine's strict-< rule), the LUT is
    * the query's slice of the same matrix, and ADC sums the candidate's
    * 8 looked-up entries in subspace order (ordered list aggregate —
    * SQL SUM would be order-nondeterministic over doubles). The exact
    * tier restates `r4(sqrt(max(0, ‖n‖² + ‖q‖² − 2·n·q)))` verbatim.
    */
  private def pqOracle: String =
    s"""WITH cb AS (
       |  SELECT mi, ki, vec FROM read_parquet('$pqCodebooksPath/*.parquet')),
       |sd AS (
       |  SELECT e.vec_id, cb.mi, cb.ki,
       |    list_sum(list_transform(range(1, 9), j ->
       |      (CAST(e.embedding[cb.mi * 8 + j] AS DOUBLE) - cb.vec[j]) *
       |      (CAST(e.embedding[cb.mi * 8 + j] AS DOUBLE) - cb.vec[j]))) AS d
       |  FROM embeddings e CROSS JOIN cb),
       |codes AS (
       |  SELECT vec_id, mi, ki AS code FROM (
       |    SELECT vec_id, mi, ki, row_number() OVER (
       |        PARTITION BY vec_id, mi ORDER BY d ASC, ki ASC) AS rn
       |    FROM sd) WHERE rn = 1),
       |adc AS (
       |  SELECT q.vec_id AS qid, cd.vec_id AS nid,
       |    list_sum(list(sq.d ORDER BY cd.mi)) AS ad
       |  FROM (SELECT vec_id FROM embeddings WHERE vec_id < 8) q
       |  JOIN codes cd ON cd.vec_id <> q.vec_id
       |  JOIN sd sq ON sq.vec_id = q.vec_id AND sq.mi = cd.mi
       |    AND sq.ki = cd.code
       |  GROUP BY q.vec_id, cd.vec_id),
       |cand AS (
       |  SELECT qid, nid, ad FROM (
       |    SELECT qid, nid, ad, row_number() OVER (
       |        PARTITION BY qid ORDER BY ad ASC NULLS LAST,
       |        nid ASC NULLS FIRST) AS rnk0
       |    FROM adc) WHERE rnk0 <= 32),
       |e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |rr AS (
       |  SELECT c.qid, c.nid,
       |    floor(sqrt(greatest(CAST(0.0 AS DOUBLE),
       |      pow(n.nrm, 2) + pow(q.nrm, 2)
       |      - 2.0 * list_sum(list_transform(
       |          list_zip(n.embedding, q.embedding),
       |          z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))))
       |      * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS dist,
       |    floor(c.ad * 10000 + CAST(0.5 AS DOUBLE))
       |      / CAST(10000 AS DOUBLE) AS adist
       |  FROM cand c
       |  JOIN e q ON q.vec_id = c.qid
       |  JOIN e n ON n.vec_id = c.nid),
       |ranked AS (
       |  SELECT qid, nid, dist, adist, row_number() OVER (
       |      PARTITION BY qid ORDER BY dist ASC NULLS LAST,
       |      nid ASC NULLS FIRST) AS rnk
       |  FROM rr)
       |SELECT qid, rnk, nid, dist, adist FROM ranked WHERE rnk <= 5
       |ORDER BY qid ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin

  val oracle: Map[String, String] = Map("q_pq_search" -> pqOracle)
}
