package graft.operators

import graft.Tables
import graft.functions.VectorOps.{vec_dot, vec_dot_fd, vec_norm}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor over `embeddings`:
  * the second scale path next to the LSH variant (q_sim_ann_lsh).
  *
  * Build: K centroids via deterministic seeding (first K vectors) + a
  * few Lloyd iterations, computed distributively (assignment is a
  * per-row argmin against broadcast centroid literals; the update step
  * is a posexplode + groupBy average). Centroids are K x dim doubles —
  * driver-bounded regardless of corpus size.
  *
  * Query: probe the `nProbe` nearest cells, rank candidates by cosine,
  * keep top-k. At 100 TB the vectors stay partitioned by cell (the
  * assignment IS the partition key) and a query touches only
  * nProbe/K of the data.
  */
object IvfAnn {

  /** Per-centroid squared-distance surrogate `‖c‖² − 2·x·c`: the row term
    * `‖x‖²` is constant within a row, so argmin / nearest-cell ordering
    * over centroids is unchanged, and dropping it halves the arithmetic.
    * Each column is a single fused codegen loop (`vec_dot_fd`) against a
    * constant-folded centroid literal — no interpreted HOF lambdas, no
    * per-row intermediate arrays (the round-1 nested transform/aggregate
    * formulation ran interpreted and dominated the whole bench at 18 s).
    */
  private[operators] def distStructs(centroids: Array[Array[Double]]): Column =
    array(centroids.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      val cn2 = c.map(x => x * x).sum
      struct(
        (lit(cn2) - lit(2.0) * vec_dot_fd(col("embedding"),
          array(c.map(lit).toSeq: _*))).as("d"),
        lit(i).as("c"))
    }: _*)

  /** Argmin cell id: array_min's lexicographic (d, c) order picks
    * (min distance, min cell) — same tie-break as sorting.
    */
  private[operators] def cellCol(centroids: Array[Array[Double]]): Column =
    array_min(distStructs(centroids)).getField("c")

  /** K-means cell assignment after `iters` Lloyd iterations. Returns
    * (vectors with `cell`, final centroids). The returned assignment is
    * recomputed against the FINAL centroids — assignments from inside
    * the loop lag one update step behind, and persisting/probing a
    * lagging assignment against the final model silently costs recall
    * (a vector can sit in a cell that is no longer its nearest).
    *
    * The Lloyd FIT runs on a deterministic hash-sample of at most
    * `maxTrain` vectors (xxhash64(vec_id) order — an unbiased
    * deterministic shuffle; at 100 TB the same sample comes from a
    * pushed-down TABLESAMPLE): centroid quality needs a bounded,
    * representative sample, never the corpus, so the fit cost stops
    * growing with the table. The final ASSIGNMENT pass stays over the
    * full frame (that one is the product). Every driver collect in the
    * loop is model-bounded (k x dim), independent of maxTrain.
    */
  def assign(e: DataFrame, k: Int, iters: Int,
      maxTrain: Int = 65536): (DataFrame, Array[Array[Double]]) = {
    val train = e.select(col("vec_id"), col("embedding"))
      .withColumn("__h", xxhash64(col("vec_id")))
      .orderBy(col("__h").asc, col("vec_id").asc)
      .limit(maxTrain)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Array[Array[Double]] = e
      .filter(col("vec_id") < k).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (0 until iters).foreach { _ =>
      val upd = train.withColumn("cell", cellCol(centroids))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .collect()
      val byCell = upd.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
          case None => centroids(c) // empty cell keeps its centroid
        }
      }.toArray
    }
    train.unpersist(blocking = false)
    (e.withColumn("cell", cellCol(centroids)), centroids)
  }

  /** Stage the fitted centroids (with the engine's own ‖c‖² values) to
    * parquet — the ORACLE BOUNDARY that lets DuckDB re-derive the cell
    * assignment, probe ordering and within-cell cosine math
    * independently (the staged-boundary trick that promoted
    * q_fuzzy_header_map / q_rad_relational_full to the hard oracle).
    * cn2 is staged rather than recomputed so both engines subtract the
    * IDENTICAL double in the distance surrogate.
    */
  private[graft] def stageCentroids(s: SparkSession,
      centroids: Array[Array[Double]], path: String): Unit = {
    import s.implicits._
    centroids.zipWithIndex.toIndexedSeq
      .map { case (c, i) => (i, c.toSeq, c.map(x => x * x).sum) }
      .toDF("c", "vec", "cn2")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def ivfCentroidsPath: String =
    s"${graft.StagePaths.root}/ivf_centroids"
  private def searchCentroidsPath: String =
    s"${graft.StagePaths.root}/ivf_search_centroids"
  private def appendCentroidsPath: String =
    s"${graft.StagePaths.root}/ivf_append_centroids"
  private def takedownCentroidsPath: String =
    s"${graft.StagePaths.root}/ivf_takedown_centroids"

  /** Top-k neighbors for query vectors (vec_id < nQueries) probing the
    * nProbe nearest cells.
    */
  def query(s: SparkSession, d: String, k: Int = 16, iters: Int = 2,
      nProbe: Int = 2, topK: Int = 5, nQueries: Int = 10,
      stagePath: Option[String] = None): DataFrame = {
    val e = Tables.embeddings(s, d).withColumn("nrm", vec_norm(col("embedding")))
    val (assigned, centroids) = assign(e, k, iters)
    stagePath.foreach(p => stageCentroids(s, centroids, p))
    // probe cells per query: nProbe nearest centroids (codegen'd distance
    // structs; sort/slice run over a K-element array per query row only)
    val probes = assigned.filter(col("vec_id") < nQueries)
      .withColumn("__dists", distStructs(centroids))
      .withColumn("probe_cells",
        expr(s"slice(transform(array_sort(__dists), x -> x.c), 1, $nProbe)"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), explode(col("probe_cells")).as("cell"))
    val cands = assigned.select(col("cell"), col("vec_id").as("nid"),
      col("embedding").as("ne"), col("nrm").as("nn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc_nulls_last, col("nid").asc_nulls_first)
    probes.join(cands, Seq("cell")).filter(col("qid") =!= col("nid"))
      .withColumn("cos", graft.Det.r4(
        vec_dot(col("qe"), col("ne")) / (col("qn") * col("nn"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk"), col("nid"), col("cos"), col("cell"))
      .orderBy(col("qid").asc_nulls_first, col("rnk").asc_nulls_first)
  }

  /** Remove a scratch index root so every lifecycle run (and every
    * bench rep) measures the SAME declared fit-from-scratch cost
    * instead of coupling to a previous generation's leftover files.
    */
  private def deleteRecursively(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HARD ORACLE since round 12: the fitted centroids (+ their ‖c‖²)
    // are staged to parquet and DuckDB independently re-derives the
    // cell assignment, the probe ordering and the within-cell cosine
    // ranking — every arithmetic step is the same left-associated IEEE
    // sequence on both engines (vec_dot_fd ≡ the list_zip/list_sum
    // fold), so the argmin/probe/top-k all match bit-exactly.
    "q_sim_ann_ivf" -> ((s, d) =>
      query(s, d, stagePath = Some(ivfCentroidsPath))),

    // Persisted-index round trip: fit (k-means + cell-PARTITIONED vector
    // write — the directory structure IS the inverted file), reload
    // centroids from disk, then probe-search the first 20 vectors.
    // HARD ORACLE since round 12: the reloaded centroids stage to
    // parquet and DuckDB replays the search (the lifecycle mechanics —
    // persisted files, partition pruning — have no SQL analog, but the
    // search RESULT is a pure function of the staged model, so a fit/
    // persist/reload bug that perturbs the model breaks the hash).
    // IvfAnnSuite still asserts persisted-search parity with the
    // inline operator and recall vs brute force.
    "q_ivf_index_search" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val path = s"/tmp/graft_ivf_index_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      // clean slate: a previous generation's index at this path would
      // otherwise couple this run's cost to leftover state (stale cell
      // dirs inflate the overwrite; measured +25% across bench runs) —
      // the declared lifecycle starts at fit, so the benchmark must too
      deleteRecursively(s, path)
      val e = graft.Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      // 3 Lloyd iterations: cell balance plateaus early on smooth data and
      // each extra iteration is a full corpus pass — index QUALITY (recall,
      // persisted-vs-inline parity) is suite-asserted at iters=2 already
      IvfIndex.fit(e, k = 16, iters = 3, path)
      val h = IvfIndex.load(s, path)
      stageCentroids(s, h.centroids, searchCentroidsPath)
      IvfIndex.search(s, h, e.filter(col("vec_id") < 20), nProbe = 2, topK = 5)
    }),

    // Incremental-index round trip (the ANN analog of
    // q_dedup_incremental): fit on the standing 80% of the vectors,
    // append the held-out 20% WITHOUT re-fitting (each lands in its
    // argmin cell under the fixed centroids, standing files untouched),
    // reload, and search. HARD ORACLE since round 12: with the fit-time
    // centroids staged, the post-append index content is exactly
    // "every vector in its argmin cell under the fixed model" — a lost
    // append, a stale standing file, or an assignment drift all break
    // the hash. IvfAnnSuite additionally asserts appended vectors
    // surface as neighbors and twin-recall at cosine 1.0.
    "q_ivf_index_append" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val path = s"/tmp/graft_ivf_append_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      // clean slate: a previous generation's index at this path would
      // otherwise couple this run's cost to leftover state (stale cell
      // dirs inflate the overwrite; measured +25% across bench runs) —
      // the declared lifecycle starts at fit, so the benchmark must too
      deleteRecursively(s, path)
      val e = graft.Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      IvfIndex.fit(e.filter(col("vec_id") % 5 =!= 0), k = 16, iters = 2, path)
      val h = IvfIndex.load(s, path)
      stageCentroids(s, h.centroids, appendCentroidsPath)
      IvfIndex.append(h, e.filter(col("vec_id") % 5 === 0))
      IvfIndex.search(s, h, e.filter(col("vec_id") < 20), nProbe = 2, topK = 5)
    }),

    // Vector-takedown round trip (the ANN analog of
    // q_dedup_index_takedown; the index-maintenance face of reference
    // R24, database.py:66-71): fit, tombstone-delete every 7th vector,
    // compact — only the affected cell partitions are rewritten and the
    // bytes leave disk — then reload and search. HARD ORACLE since
    // round 12: the oracle searches the staged model over the SURVIVING
    // id set (vec_id % 7 <> 0), so a tombstone that failed to hide a
    // vector, a compaction that dropped a survivor, or a torn swap all
    // break the hash. IvfAnnSuite keeps the library-level tombstone/
    // compaction parity + crash-recovery assertions.
    "q_ivf_index_takedown" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val path = s"/tmp/graft_ivf_takedown_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      // clean slate: a previous generation's index at this path would
      // otherwise couple this run's cost to leftover state (stale cell
      // dirs inflate the overwrite; measured +25% across bench runs) —
      // the declared lifecycle starts at fit, so the benchmark must too
      deleteRecursively(s, path)
      val e = graft.Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      IvfIndex.fit(e, k = 16, iters = 2, path)
      IvfIndex.delete(s, path,
        e.filter(col("vec_id") % 7 === 0).select(col("vec_id")))
      IvfIndex.compact(s, path)
      val h = IvfIndex.load(s, path)
      stageCentroids(s, h.centroids, takedownCentroidsPath)
      IvfIndex.search(s, h, e.filter(col("vec_id") < 20), nProbe = 2, topK = 5)
    }))

  /** DuckDB derivation of an IVF probe-search over STAGED centroids:
    * the distance surrogate `cn2 − 2·x·c` (cn2 read from the stage so
    * both engines subtract the identical double), argmin by (d, c) for
    * the cell, the nProbe nearest cells as probes for rows matching
    * `queryPred`, and the r4-rounded cosine top-`topK` within the
    * probed cells over candidates matching `candPred` — the engine's
    * exact pipeline replayed in SQL. Shared by the inline operator and
    * all three persisted-index lifecycles (whose file/tombstone/
    * compaction mechanics have no SQL analog, but whose SEARCH RESULT
    * is a pure function of the staged model + the surviving id set).
    */
  private[operators] def ivfSearchOracle(centPath: String,
      queryPred: String, candPred: String, nProbe: Int = 2,
      topK: Int = 5): String =
    s"""WITH cent AS (
       |  SELECT c, vec, cn2
       |  FROM read_parquet('$centPath/*.parquet')),
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
       |    FROM dist WHERE $candPred) WHERE rn = 1),
       |probe AS (
       |  SELECT vec_id AS qid, c AS cell FROM (
       |    SELECT vec_id, c, row_number() OVER (
       |        PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
       |    FROM dist WHERE $queryPred) WHERE rn <= $nProbe),
       |e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT p.qid, a.vec_id AS nid, p.cell,
       |    floor((list_sum(list_transform(
       |      list_zip(q.embedding, n.embedding),
       |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
       |      / (q.nrm * n.nrm)) * 10000 + CAST(0.5 AS DOUBLE))
       |      / CAST(10000 AS DOUBLE) AS cos
       |  FROM probe p
       |  JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.qid
       |  JOIN e q ON q.vec_id = p.qid
       |  JOIN e n ON n.vec_id = a.vec_id),
       |ranked AS (
       |  SELECT qid, nid, cell, cos, row_number() OVER (
       |      PARTITION BY qid ORDER BY cos DESC NULLS LAST,
       |      nid ASC NULLS FIRST) AS rnk
       |  FROM scored)
       |SELECT qid, rnk, nid, cos, cell FROM ranked WHERE rnk <= $topK
       |ORDER BY qid ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_sim_ann_ivf" ->
      ivfSearchOracle(ivfCentroidsPath, "vec_id < 10", "TRUE"),
    "q_ivf_index_search" ->
      ivfSearchOracle(searchCentroidsPath, "vec_id < 20", "TRUE"),
    "q_ivf_index_append" ->
      ivfSearchOracle(appendCentroidsPath, "vec_id < 20", "TRUE"),
    "q_ivf_index_takedown" ->
      ivfSearchOracle(takedownCentroidsPath, "vec_id < 20",
        "vec_id % 7 <> 0"))
}
