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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Persisted IVFPQ round trip: fit (cells + residual codebooks +
    // cell-partitioned codes), reload from disk, search 8 queries at
    // nProbe=4. No oracle (engine k-means at both levels); PqSuite pins
    // recall vs brute force, exact re-ranked distances, the pruned
    // probe scan, and determinism.
    "q_ivfpq_search" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val h = fittedFor(s, d)
      search(s, h, e.filter(col("vec_id") < 8), e,
        nProbe = 4, rerank = 32, topK = 5)
    })
  )

  val oracle: Map[String, String] = Map.empty // engine-side k-means layers
}
