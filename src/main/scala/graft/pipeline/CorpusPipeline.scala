package graft.pipeline

import graft.Tables
import graft.operators.{DedupOps, PipelineOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus preprocessing pipeline, composed from
  * the engine's own operators:
  *
  *   normalize -> quality gate -> exact dedup -> near-dup cluster
  *   resolve (MinHash-free exact tier at test scale; swap the pair
  *   source for the LSH tier at 100 TB) -> per-language quota ->
  *   fixed-capacity sequence packing -> partitioned parquet write.
  *
  * Every stage is a declarative DataFrame transform; nothing collects to
  * the driver. The stage ordering is the cost-aware one: cheap map-only
  * gates (normalize, quality) run first to shrink the corpus before the
  * shuffling stages (dedup joins, windows), and the near-dup stage
  * receives only quality survivors. Counts come back in a report struct
  * via one aggregation per stage boundary — the same observability the
  * reference gets from its per-stage prints (main.py:93-107), without
  * row-at-a-time work.
  */
object CorpusPipeline {

  case class Report(input: Long, afterQuality: Long, afterExact: Long,
      afterNearDup: Long, afterQuota: Long, nBins: Long)

  /** Run the full pipeline; writes the packed corpus partitioned by lang
    * under `outDir` and returns per-stage counts.
    *
    * `pairSource` selects the near-dup pair tier: the default is the
    * exact n-gram Jaccard join (right for test scale / the oracle tier);
    * pass [[DedupOps.minhashLshPairs]] for the 100 TB sketch tier — both
    * take (shingleFrame, threshold) and emit verified (d1, d2, score)
    * pairs, and the CC + keep rule downstream are unchanged.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      minTokens: Int = 10, jaccardThreshold: Double = 0.5,
      quotaPerLang: Int = 200, binTokens: Int = 2048,
      pairSource: (DataFrame, Double) => DataFrame =
        DedupOps.ngramJaccardPairs(_, _, None)): Report = {
    val docs = Tables.documents(spark, sfDir)
    val input = docs.count()

    // 1. normalize (map-only): whitespace collapse + trim; keep original
    //    casing — tokens are the dedup unit and the corpus is cased.
    val normalized = docs
      .withColumn("text", trim(regexp_replace(col("text"), " +", " ")))

    // 2. quality gate (map-only): token floor. Each stage boundary is
    //    localCheckpoint'ed: the report fires one action per stage and
    //    the write a final one — without materialization the exact-dedup
    //    shuffle would re-execute for every downstream action.
    val quality = normalized
      .withColumn("n_toks", size(split(col("text"), " ")))
      .filter(col("n_toks") >= minTokens)
      .localCheckpoint()
    val afterQuality = quality.count()

    // 3. exact dedup: one survivor per exact text (content-hash key, not
    //    the raw text, so the shuffle moves 16-byte digests).
    val exact = quality
      .withColumn("__h", md5(col("text")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__h")).orderBy(col("doc_id").asc)))
      .filter(col("__rn") === 1).drop("__h", "__rn")
      .localCheckpoint()
    val afterExact = exact.count()

    // 4. near-dup resolution: pair graph -> connected components -> keep
    //    each cluster's min doc_id. Shingles are built from the SURVIVING
    //    NORMALIZED text (stage-1 output) — shingling a fresh table scan
    //    would score raw whitespace variants differently and miss exactly
    //    the pairs normalization exists to catch. The pair tier is the
    //    caller's `pairSource` (exact jaccard by default, MinHash-LSH at
    //    100 TB) — the CC and the keep rule are unchanged either way.
    val sh = DedupOps.shingleRowsOf(exact.select(col("doc_id"), col("text")))
    val pairs = pairSource(sh, jaccardThreshold)
      .select(col("d1"), col("d2"))
    val clusters = PipelineOps.connectedComponents(pairs)
    val victims = clusters.filter(col("node") =!= col("cluster"))
      .select(col("node").as("doc_id"))
    val nearDeduped = exact.join(victims, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val afterNearDup = nearDeduped.count()

    // 5. per-language quota by portable hash order (reproducible mix).
    val quota = nearDeduped
      .withColumn("__hk", md5(col("doc_id").cast("string")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("__hk").asc, col("doc_id").asc)))
      .filter(col("__rk") <= quotaPerLang).drop("__hk", "__rk")
      .localCheckpoint()
    val afterQuota = quota.count()

    // 6. sequence packing into fixed-capacity bins per language.
    val packed = quota
      .withColumn("__cum", sum(col("n_toks")).over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)))
      .withColumn("bin",
        floor((col("__cum") - col("n_toks")) / lit(binTokens)).cast("bigint"))
      .drop("__cum")

    packed.write.mode("overwrite").partitionBy("lang").parquet(outDir)
    val nBins = spark.read.parquet(outDir)
      .select(col("lang"), col("bin")).distinct().count()
    Report(input, afterQuality, afterExact, afterNearDup, afterQuota, nBins)
  }
}
