package graft.operators

import graft.functions.VectorOps.{vec_dot, vec_norm}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index: build once, query many — the production shape
  * of `IvfAnn` (which derives its cells inline per query).
  *
  * Layout: `<path>/vectors` is parquet PARTITIONED BY the cell id, so a
  * probe that touches nProbe of K cells reads nProbe/K of the data via
  * partition pruning — the directory structure IS the inverted file.
  * `<path>/centroids` stores the K x dim model (driver-bounded).
  * At 100 TB the index build is one k-means pass + one partitioned
  * write; searches are small probe-side joins against a pruned scan.
  */
object IvfIndex {

  case class Handle(centroids: Array[Array[Double]], path: String)

  /** Build and persist the index from an embeddings frame
    * (vec_id, embedding).
    */
  def fit(e: DataFrame, k: Int, iters: Int, path: String): Handle = {
    val withNorm = e.withColumn("nrm", vec_norm(col("embedding")))
    val (assigned, cents) = IvfAnn.assign(withNorm, k, iters)
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(path + "/vectors")
    val s = e.sparkSession
    import s.implicits._
    cents.zipWithIndex.toIndexedSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
      .write.mode("overwrite").parquet(path + "/centroids")
    Handle(cents, path)
  }

  /** Append new vectors WITHOUT re-fitting: each is assigned to its
    * nearest EXISTING centroid, so prior cell directories stay valid and
    * the standing vectors are never rewritten — the same
    * never-recompute-the-corpus discipline as `MinHashIndex.append`.
    * Probes find appended vectors immediately (query and twin share the
    * argmin cell under the same fixed model; suite-asserted). Accepting
    * centroid drift until the next `fit` is the standard IVF
    * maintenance trade.
    */
  def append(h: Handle, e: DataFrame): Unit = {
    e.withColumn("nrm", vec_norm(col("embedding")))
      .withColumn("cell", IvfAnn.cellCol(h.centroids))
      .write.mode("append").partitionBy("cell").parquet(h.path + "/vectors")
  }

  /** Reload a persisted index (centroids only — vectors stay on disk). */
  def load(s: SparkSession, path: String): Handle = {
    val cents = s.read.parquet(path + "/centroids").orderBy(col("cell"))
      .collect().map(_.getSeq[Double](1).toArray)
    Handle(cents, path)
  }

  /** Top-k cosine neighbors for a query frame (vec_id, embedding),
    * probing the nProbe nearest cells per query against the stored,
    * cell-partitioned vectors.
    *
    * The distinct probed cell set (bounded by K — model state, never
    * data) is collected and pushed as a LITERAL partition filter on the
    * vector scan: pruning is guaranteed by the plan (asserted in
    * IvfAnnSuite), not left to dynamic-pruning heuristics — a probe that
    * touches nProbe of K cells reads only those directories.
    */
  def search(s: SparkSession, h: Handle, queries: DataFrame,
      nProbe: Int = 2, topK: Int = 5): DataFrame = {
    val probes = queries
      .withColumn("nrm", vec_norm(col("embedding")))
      .withColumn("__dists", IvfAnn.distStructs(h.centroids))
      .withColumn("probe_cells",
        expr(s"slice(transform(array_sort(__dists), x -> x.c), 1, $nProbe)"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), explode(col("probe_cells")).as("cell"))
      // read twice (the cell-set pass and the join): lazy persist, not
      // localCheckpoint — recomputable from lineage on executor loss
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.get(0))
    val cands = s.read.parquet(h.path + "/vectors")
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
      .select(col("cell"), col("vec_id").as("nid"),
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
}
