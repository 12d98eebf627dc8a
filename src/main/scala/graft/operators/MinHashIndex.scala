package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index: sketch the standing corpus once, probe
  * each incoming batch against it — the 100 TB tier of incremental
  * near-dup detection (`q_dedup_incremental` is the exact/oracle tier).
  *
  * Layout: `<path>/bands` holds the corpus's 16 LSH band keys per doc
  * (the join side of every future probe) and `<path>/sets` its distinct
  * shingle sets (for exact verification of candidates). Both are plain
  * parquet: a probe is one equi-join on the band key — the batch side
  * shuffles 16 rows per doc, the corpus side is read, never recomputed —
  * followed by exact Jaccard verification of the (few) collisions, so
  * emitted pairs have precision 1.0 and the corpus text is never
  * re-shingled. Band keys are deterministic (fixed-seed permutations,
  * `DedupOps.bandRows`), which is what makes cross-run probing sound.
  *
  * At 100 TB, write `bands` BUCKETED by band key
  * (`ScalePatterns.writeBucketed` shape) so each probe shuffles only the
  * batch side against the pre-bucketed corpus, and let the candidate
  * join's runtime bloom filter (plan-asserted in ScalePatternsSuite)
  * prune the `sets` lookup to matched docs.
  *
  * Generalizes the reference's ingest-skip invariant (main.py:90,
  * database.py:19 — "don't re-admit what's already in the DB") from
  * exact file identity to near-duplicate content identity.
  */
object MinHashIndex {

  /** Sketch `shRows` (a `DedupOps.shingleRows` frame) into `path`. */
  def fit(shRows0: DataFrame, path: String): Unit =
    write(shRows0, path, "overwrite")

  /** Distinct doc_ids present in the index — the membership view
    * consistency checks (e.g. CorpusPipeline.reconcile) compare against,
    * kept here so the on-disk layout stays this object's private
    * knowledge.
    */
  def indexedIds(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path + "/bands").select(col("doc_id")).distinct()

  /** Add new (already-admitted) docs' sketches to an existing index —
    * the incremental-ingest publish step. Callers guarantee the doc_ids
    * are new; the index itself never dedups.
    */
  def append(shRows0: DataFrame, path: String): Unit =
    write(shRows0, path, "append")

  private def write(shRows0: DataFrame, path: String, mode: String): Unit = {
    val shRows = shRows0.select(col("doc_id"), col("sz"), col("g"))
      .localCheckpoint()  // bands and sets both read it
    DedupOps.bandRows(shRows)
      .write.mode(mode).parquet(path + "/bands")
    DedupOps.shingleSets(shRows)
      .write.mode(mode).parquet(path + "/sets")
  }

  /** Probe an incoming batch (as a `shingleRows` frame) against the
    * index: returns (d1 = indexed doc, d2 = incoming doc, jaccard) for
    * every verified near-dup pair at `threshold`. Recall vs the exact
    * cross join is the LSH band recall (suite-asserted >= 80%);
    * precision is 1.0 (every candidate is exactly verified).
    */
  def probe(s: SparkSession, path: String, shRows0: DataFrame,
      threshold: Double): DataFrame = {
    val shRows = shRows0.select(col("doc_id"), col("sz"), col("g"))
      .localCheckpoint()  // band pass + verification sets
    val incBands = DedupOps.bandRows(shRows)
      .select(col("band"), col("doc_id").as("d2"))
    val idxBands = s.read.parquet(path + "/bands")
      .select(col("band"), col("doc_id").as("d1"))
    val cand = idxBands.join(incBands, Seq("band"))
      .filter(col("d1") =!= col("d2"))
      .select(col("d1"), col("d2")).distinct()
    val idxSets = s.read.parquet(path + "/sets")
      .select(col("doc_id").as("d1"), col("sh").as("a_sh"))
    val incSets = DedupOps.shingleSets(shRows)
      .select(col("doc_id").as("d2"), col("sh").as("b_sh"))
    cand.join(idxSets, Seq("d1")).join(incSets, Seq("d2"))
      .withColumn("jaccard", DedupOps.pairJaccard)
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }
}
