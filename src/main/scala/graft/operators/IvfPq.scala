package graft.operators

import graft.Tables
import graft.functions.PqOps.{pq_adc, pq_encode, pq_lut}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVFPQ — the composed production ANN index (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI'11): IVF cells
  * prune WHAT is scanned (partition pruning on the cell directory
  * layout, exactly like [[IvfIndex]]), PQ codes compress WHAT each scan
  * reads (m bytes per vector instead of dim floats). Codes quantize the
  * RESIDUAL x − centroid(cell(x)) — residuals concentrate near the
  * origin, so the codebooks spend their 16 centers per subspace on a
  * tighter distribution than raw vectors (the standard faiss IVFPQ
  * layout).
  *
  * Search: probe the nProbe nearest cells; per (query, cell) build the
  * ADC table against the query's OWN residual q − centroid (one
  * `pq_lut` per probe row — probes are query-bounded); scan only the
  * probed cells' codes; exact L2 re-rank of the top candidates fetched
  * by id. The emitted distances are exact; only candidate choice is
  * approximate.
  *
  * At 100 TB: the codes store is 32× smaller than the vector store and
  * a probe reads nProbe/K of it — the raw vectors are touched only for
  * the rerank-sized id fetch.
  */
object IvfPq {

  case class Handle(centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String)

  private def centFrame(s: SparkSession,
      cents: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    cents.zipWithIndex.toIndexedSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "cent")
  }

  /** float32 residual against the row's cell centroid. */
  private def residualCol(vec: String) = expr(
    s"transform(zip_with($vec, cent, (a, b) -> a - b), v -> cast(v as float))")

  /** Build and persist: k-means cells (distributed), residual PQ
    * codebooks (driver-bounded sample), codes PARTITIONED BY cell —
    * the directory layout IS the inverted file, like [[IvfIndex]].
    */
  def fit(e: DataFrame, k: Int, iters: Int, m: Int, kSub: Int,
      path: String): Handle = {
    val s = e.sparkSession
    val (assigned, cents) = IvfAnn.assign(e, k, iters)
    // two actions read the residuals (codebook sample, codes write) and
    // their lineage re-runs the whole k-means assignment — persist once,
    // release after the write (lazy persist: recomputable on loss)
    val resid = assigned.join(broadcast(centFrame(s, cents)), Seq("cell"))
      .withColumn("residual", residualCol("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cb = PqIndex.fitCodebooks(
        resid.select(col("vec_id"), col("residual").as("embedding")), m, kSub)
      resid.select(col("cell"), col("vec_id"),
          pq_encode(col("residual"), cb).as("codes"))
        .write.mode("overwrite").partitionBy("cell").parquet(path + "/codes")
      finishFit(s, cents, cb, path)
    } finally { resid.unpersist(blocking = false); () }
  }

  private def finishFit(s: SparkSession, cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]], path: String): Handle = {
    centFrame(s, cents)
      .write.mode("overwrite").parquet(path + "/centroids")
    import s.implicits._
    Seq(graft.functions.Pq.serialize(cb)).toDF("cb")
      .write.mode("overwrite").parquet(path + "/codebooks")
    Handle(cents, cb, path)
  }

  def load(s: SparkSession, path: String): Handle = {
    val cents = s.read.parquet(path + "/centroids").orderBy(col("cell"))
      .collect().map(_.getSeq[Double](1).toArray)
    val cb = graft.functions.Pq.toNested(graft.functions.Pq.fromBytes(
      s.read.parquet(path + "/codebooks").head().getAs[Array[Byte]](0)))
    Handle(cents, cb, path)
  }

  /** ADC search over the pruned code scan + exact re-rank. `e` is the
    * raw vector store the rerank-sized candidate set is fetched from.
    */
  def search(s: SparkSession, h: Handle, queries: DataFrame, e: DataFrame,
      nProbe: Int = 4, rerank: Int = 32, topK: Int = 5): DataFrame = {
    val probes = queries
      .withColumn("__dists", IvfAnn.distStructs(h.centroids))
      .withColumn("probe_cells",
        expr(s"slice(transform(array_sort(__dists), x -> x.c), 1, $nProbe)"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(col("probe_cells")).as("cell"))
      .join(broadcast(centFrame(s, h.centroids)), Seq("cell"))
      .withColumn("lut", pq_lut(residualCol("qe"), h.codebooks))
      .select(col("cell"), col("qid"), col("qe"), col("lut"))
      // read twice (the cell-set pass and the join). Same discipline as
      // IvfIndex.search: the collect materializes the blocks; release
      // the CacheManager entry NOW (non-blocking) so repeated searches
      // don't pin one entry each — the join reuses surviving blocks or
      // recomputes this QUERY-BOUNDED frame (nQueries x nProbe rows)
      // from lineage
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.get(0))
    probes.unpersist(blocking = false)
    // literal partition filter: pruning guaranteed by the plan (the
    // probed set is bounded by K — model state, never data)
    val cands = s.read.parquet(h.path + "/codes")
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
      .select(col("cell"), col("vec_id").as("nid"), col("codes"))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("ad").asc_nulls_last, col("nid").asc_nulls_first)
    val top = cands.join(probes, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("ad", pq_adc(col("codes"), col("lut")))
      .withColumn("rnk0", row_number().over(wAdc))
      .filter(col("rnk0") <= rerank)
      .select(col("qid"), col("qe"), col("nid"), col("ad"))
    PqIndex.exactRerank(e, top, topK)
  }

  /** Session-lifetime memo of fitted+reloaded handles (same discipline
    * as BpeOps.trainedFor): fitting is deterministic per corpus dir, so
    * repeated q_ivfpq_search calls in one session reuse the persisted
    * index instead of refitting. Keyed by applicationId so the path is
    * private to this process — two concurrent processes (bench + tests)
    * on the same dataset no longer clobber each other's index mid-search.
    * Assumes the corpus under `d` is immutable for the session (the
    * testdata contract; same assumption as BpeOps.trainedCache).
    */
  private val fittedCache =
    scala.collection.concurrent.TrieMap.empty[String, Handle]

  private def fittedFor(s: SparkSession, d: String): Handle =
    fittedCache.getOrElseUpdate(s"${s.sparkContext.applicationId}|$d", {
      val path = s"/tmp/graft_ivfpq_${s.sparkContext.applicationId}_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      fit(e, k = 16, iters = 2, m = 8, kSub = 16, path)
      load(s, path)
    })

  private def ivfpqCentroidsPath: String =
    s"${graft.StagePaths.root}/ivfpq_centroids"
  private def ivfpqCodebooksPath: String =
    s"${graft.StagePaths.root}/ivfpq_codebooks"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Persisted IVFPQ round trip: fit (cells + residual codebooks +
    // cell-partitioned codes), reload from disk, search 8 queries at
    // nProbe=4. HARD ORACLE since round 12: both model layers (cell
    // centroids + residual codebooks) stage to parquet and DuckDB
    // replays assignment, float32 residuals, residual encode, the
    // per-probe residual LUT, ADC and the exact rerank — a lost code
    // file, a residual computed against the wrong centroid, or a probe
    // ordering bug all break the hash. PqSuite keeps recall vs brute
    // force, exact re-ranked distances, the pruned probe scan, and
    // determinism.
    "q_ivfpq_search" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val h = fittedFor(s, d)
      IvfAnn.stageCentroids(s, h.centroids, ivfpqCentroidsPath)
      PqIndex.stageCodebooks(s, h.codebooks, ivfpqCodebooksPath)
      search(s, h, e.filter(col("vec_id") < 8), e,
        nProbe = 4, rerank = 32, topK = 5)
    })
  )

  /** DuckDB replay of q_ivfpq_search over BOTH staged model layers:
    * cell assignment by the shared `cn2 − 2·x·c` surrogate, float32
    * residual against the assigned (candidates) / probed (query) cell
    * centroid — CAST(… AS REAL) reproduces the engine's
    * `cast(v as float)` rounding exactly — then the PQ replay
    * (subspace argmin encode, LUT slice, in-order ADC sum) and the
    * shared exact-rerank tail. Candidate and probe sides reuse one
    * residual→subspace-distance shape; (qid, nid) pairs are unique
    * because a candidate lives in exactly one cell.
    */
  private def ivfpqOracle: String =
    s"""WITH cent AS (
       |  SELECT c, vec, cn2
       |  FROM read_parquet('$ivfpqCentroidsPath/*.parquet')),
       |cb AS (
       |  SELECT mi, ki, vec
       |  FROM read_parquet('$ivfpqCodebooksPath/*.parquet')),
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
       |resid AS (
       |  SELECT a.vec_id, a.cell,
       |    list_transform(range(1, 65), j ->
       |      CAST(CAST(e.embedding[j] AS DOUBLE) - cent.vec[j] AS REAL)) AS r
       |  FROM asg a
       |  JOIN embeddings e ON e.vec_id = a.vec_id
       |  JOIN cent ON cent.c = a.cell),
       |sdc AS (
       |  SELECT r.vec_id, r.cell, cb.mi, cb.ki,
       |    list_sum(list_transform(range(1, 9), j ->
       |      (CAST(r.r[cb.mi * 8 + j] AS DOUBLE) - cb.vec[j]) *
       |      (CAST(r.r[cb.mi * 8 + j] AS DOUBLE) - cb.vec[j]))) AS d
       |  FROM resid r CROSS JOIN cb),
       |codes AS (
       |  SELECT vec_id, cell, mi, ki AS code FROM (
       |    SELECT vec_id, cell, mi, ki, row_number() OVER (
       |        PARTITION BY vec_id, mi ORDER BY d ASC, ki ASC) AS rn
       |    FROM sdc) WHERE rn = 1),
       |probe AS (
       |  SELECT vec_id AS qid, c AS cell FROM (
       |    SELECT vec_id, c, row_number() OVER (
       |        PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
       |    FROM dist WHERE vec_id < 8) WHERE rn <= 4),
       |qresid AS (
       |  SELECT p.qid, p.cell,
       |    list_transform(range(1, 65), j ->
       |      CAST(CAST(e.embedding[j] AS DOUBLE) - cent.vec[j] AS REAL)) AS r
       |  FROM probe p
       |  JOIN embeddings e ON e.vec_id = p.qid
       |  JOIN cent ON cent.c = p.cell),
       |qlut AS (
       |  SELECT q.qid, q.cell, cb.mi, cb.ki,
       |    list_sum(list_transform(range(1, 9), j ->
       |      (CAST(q.r[cb.mi * 8 + j] AS DOUBLE) - cb.vec[j]) *
       |      (CAST(q.r[cb.mi * 8 + j] AS DOUBLE) - cb.vec[j]))) AS d
       |  FROM qresid q CROSS JOIN cb),
       |adc AS (
       |  SELECT p.qid, cd.vec_id AS nid,
       |    list_sum(list(ql.d ORDER BY cd.mi)) AS ad
       |  FROM probe p
       |  JOIN codes cd ON cd.cell = p.cell AND cd.vec_id <> p.qid
       |  JOIN qlut ql ON ql.qid = p.qid AND ql.cell = p.cell
       |    AND ql.mi = cd.mi AND ql.ki = cd.code
       |  GROUP BY p.qid, cd.vec_id),
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

  val oracle: Map[String, String] = Map("q_ivfpq_search" -> ivfpqOracle)
}
