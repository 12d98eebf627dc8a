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
    * (vec_id, embedding). A fresh fit resets all deletion state of a
    * previous index generation at the same path.
    */
  def fit(e: DataFrame, k: Int, iters: Int, path: String): Handle = {
    val withNorm = e.withColumn("nrm", vec_norm(col("embedding")))
    val (assigned, cents) = IvfAnn.assign(withNorm, k, iters)
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(path + "/vectors")
    clearDeletionState(e.sparkSession, path)
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

  // ---- deletion / takedown (tombstones + pruned compaction) ------------
  //
  // The ANN analog of MinHashIndex.delete/compact (reference analog:
  // R24 delete_entry_from_table, database.py:66-71). delete() appends
  // vec_ids to <path>/tombstones; search() anti-joins them (broadcast —
  // takedown-sized) so removed vectors stop surfacing immediately;
  // compact() physically rewrites ONLY the cell partitions that contain
  // tombstoned vectors — the cell layout that prunes probes prunes the
  // rewrite too, so a takedown touches nAffectedCells/K of the data.

  private def tombstonesPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "/tombstones")

  private def compactStagePath(path: String) =
    new org.apache.hadoop.fs.Path(path + "/vectors.compact")

  private def fs(s: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def clearDeletionState(s: SparkSession, path: String): Unit =
    Seq(tombstonesPath(path), compactStagePath(path)).foreach { p =>
      val f = fs(s, p)
      if (f.exists(p)) { f.delete(p, true); () }
    }

  private def tombstoneFrame(s: SparkSession, path: String): Option[DataFrame] = {
    val p = tombstonesPath(path)
    if (fs(s, p).exists(p)) Some(s.read.parquet(p.toString)) else None
  }

  /** Remove vectors from the index: invisible to [[search]] immediately
    * (tombstone anti-join), bytes leave disk at the next [[compact]].
    * Idempotent — duplicate tombstone rows are ignored by the anti-join
    * and cleared by compaction.
    */
  def delete(s: SparkSession, path: String, vecIds: DataFrame): Unit =
    vecIds.select(col("vec_id")).distinct()
      .write.mode("append").parquet(tombstonesPath(path).toString)

  /** Fold tombstones into the files, rewriting ONLY the affected cell
    * partitions. Order: (1) stage the affected cells' surviving rows to
    * a sibling dir (durable job commit); (2) record the affected cell
    * list IN the stage (a fully-emptied cell leaves no staged rows, so
    * the list cannot be recovered from the rows alone); (3) delete the
    * affected cell directories; (4) append the staged survivors back;
    * (5) clear tombstones + stage. A crash anywhere re-runs safely:
    * compact first finishes a torn swap from the stage (steps 3-5 are
    * idempotent given the stage), then starts a fresh pass for any
    * remaining tombstones.
    */
  def compact(s: SparkSession, path: String): Unit = {
    val stage = compactStagePath(path)
    if (fs(s, stage).exists(stage)) finishCompactSwap(s, path)
    tombstoneFrame(s, path).foreach { t =>
      val ids = t.select(col("vec_id")).distinct()
      val vectors = s.read.parquet(path + "/vectors")
      val affected = vectors.join(ids, Seq("vec_id"))
        .select(col("cell")).distinct().collect().map(_.getInt(0))
      if (affected.isEmpty) {
        // every tombstoned id already left the files (replayed delete)
        clearDeletionState(s, path)
      } else {
        val remaining = vectors
          .filter(col("cell").isin(affected.toIndexedSeq: _*))
          .join(ids, Seq("vec_id"), "left_anti")
        remaining.write.mode("overwrite").parquet(stage.toString + "/rows")
        val out = fs(s, stage).create(
          new org.apache.hadoop.fs.Path(stage, "_affected_cells"), true)
        try out.write(affected.mkString("\n").getBytes("UTF-8"))
        finally out.close()
        finishCompactSwap(s, path)
      }
    }
  }

  /** Steps 3-5 of the compaction swap (stage must exist and be complete:
    * the `_affected_cells` sidecar is written last, so its presence
    * certifies the staged rows; an incomplete stage is discarded and the
    * pass re-runs from the still-present tombstones).
    */
  private def finishCompactSwap(s: SparkSession, path: String): Unit = {
    val stage = compactStagePath(path)
    val f = fs(s, stage)
    val marker = new org.apache.hadoop.fs.Path(stage, "_affected_cells")
    if (!f.exists(marker)) { f.delete(stage, true); return }
    val in = f.open(marker)
    val affected =
      try new String(in.readAllBytes(), "UTF-8").split("\n").map(_.trim)
        .filter(_.nonEmpty).map(_.toInt)
      finally in.close()
    affected.foreach { c =>
      val dir = new org.apache.hadoop.fs.Path(path + s"/vectors/cell=$c")
      if (f.exists(dir)) { f.delete(dir, true); () }
    }
    val staged = s.read.parquet(stage.toString + "/rows")
    staged.write.mode("append").partitionBy("cell").parquet(path + "/vectors")
    clearDeletionState(s, path)
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
    // the collect above materialized the blocks; release the
    // CacheManager entry NOW (non-blocking) so a long-lived session
    // issuing many searches doesn't accumulate one pinned entry per
    // call — the join below reuses whatever blocks remain or
    // recomputes the query-sized frame from lineage
    probes.unpersist(blocking = false)
    // tombstoned vectors stop surfacing immediately (pre-compaction);
    // absent tombstones leave the plan untouched
    val pruned = s.read.parquet(h.path + "/vectors")
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
    val cands = tombstoneFrame(s, h.path)
      .fold(pruned)(t => pruned.join(
        broadcast(t.select(col("vec_id")).distinct()),
        Seq("vec_id"), "left_anti"))
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
