package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index: sketch the standing corpus once, probe
  * each incoming batch against it — the 100 TB tier of incremental
  * near-dup detection (`q_dedup_incremental` is the exact/oracle tier).
  *
  * Layout: ONE parquet table at `<path>/data`, partitioned by `kind` —
  * `kind=b` rows hold the 16 LSH band keys per doc (the join side of
  * every future probe), `kind=s` rows the distinct shingle set per doc
  * (for exact verification of candidates). Both halves are written by a
  * SINGLE job commit, so a crash can never publish one without the
  * other (the round-5 review found the previous two-directory layout
  * left a bands-without-sets window that silently dropped candidate
  * verification forever). A probe is one equi-join on the band key —
  * the batch side shuffles 16 rows per doc, the corpus side is read
  * with `kind` partition pruning, never recomputed — followed by exact
  * Jaccard verification of the (few) collisions, so emitted pairs have
  * precision 1.0 and the corpus text is never re-shingled. Band keys
  * are deterministic (fixed-seed permutations, `DedupOps.bandRows`),
  * which is what makes cross-run probing sound.
  *
  * At 100 TB, write the `kind=b` half BUCKETED by band key
  * (`ScalePatterns.writeBucketed` shape) so each probe shuffles only the
  * batch side against the pre-bucketed corpus, and let the candidate
  * join's runtime bloom filter (plan-asserted in ScalePatternsSuite)
  * prune the `kind=s` lookup to matched docs.
  *
  * Generalizes the reference's ingest-skip invariant (main.py:90,
  * database.py:19 — "don't re-admit what's already in the DB") from
  * exact file identity to near-duplicate content identity.
  */
object MinHashIndex {

  /** Sketch `shRows` (a `DedupOps.shingleRows` frame) into `path`. */
  def fit(shRows0: DataFrame, path: String): Unit =
    write(shRows0, path, "overwrite")

  /** Distinct doc_ids FULLY present in the index (both halves) — the
    * membership view consistency checks (e.g. CorpusPipeline.reconcile)
    * compare against, kept here so the on-disk layout stays this
    * object's private knowledge. Requiring both halves means a doc torn
    * by a mid-commit crash reads as missing and gets re-sketched; the
    * re-append then duplicates its surviving half's rows, which is
    * harmless — duplicate candidates collapse in probe's distinct, and
    * duplicate verification rows re-verify the same pair.
    */
  def indexedIds(s: SparkSession, path: String): DataFrame = {
    val d = s.read.parquet(path + "/data")
    d.filter(col("kind") === "b").select(col("doc_id")).distinct()
      .join(d.filter(col("kind") === "s").select(col("doc_id")).distinct(),
        Seq("doc_id"))
  }

  /** Add new (already-admitted) docs' sketches to an existing index —
    * the incremental-ingest publish step. Callers guarantee the doc_ids
    * are new; the index itself never dedups.
    */
  def append(shRows0: DataFrame, path: String): Unit =
    write(shRows0, path, "append")

  private def write(shRows0: DataFrame, path: String, mode: String): Unit = {
    val shRows = shRows0.select(col("doc_id"), col("sz"), col("g"))
      .localCheckpoint()  // bands and sets both read it
    val bands = DedupOps.bandRows(shRows).select(
      col("doc_id"), col("band"),
      lit(null).cast("array<string>").as("sh"), lit("b").as("kind"))
    val sets = DedupOps.shingleSets(shRows).select(
      col("doc_id"), lit(null).cast("string").as("band"),
      col("sh"), lit("s").as("kind"))
    bands.unionByName(sets)
      .write.mode(mode).partitionBy("kind").parquet(path + "/data")
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
    val idx = s.read.parquet(path + "/data")
    val incBands = DedupOps.bandRows(shRows)
      .select(col("band"), col("doc_id").as("d2"))
    val idxBands = idx.filter(col("kind") === "b")
      .select(col("band"), col("doc_id").as("d1"))
    val cand = idxBands.join(incBands, Seq("band"))
      .filter(col("d1") =!= col("d2"))
      .select(col("d1"), col("d2")).distinct()
    val idxSets = idx.filter(col("kind") === "s")
      .select(col("doc_id").as("d1"), col("sh").as("a_sh"))
    val incSets = DedupOps.shingleSets(shRows)
      .select(col("doc_id").as("d2"), col("sh").as("b_sh"))
    cand.join(idxSets, Seq("d1")).join(incSets, Seq("d2"))
      .withColumn("jaccard", DedupOps.pairJaccard)
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }
}
