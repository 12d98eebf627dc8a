package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module inventories (SURVEY.md §2.2); each
  * oracle-bearing query has matching column names + a total ORDER BY on
  * both the Spark and DuckDB side.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (RelationalCore.queries, RelationalCore.oracle),
    (Aggregates.queries, Aggregates.oracle),
    (Joins.queries, Joins.oracle),
    (Windows.queries, Windows.oracle),
    (Scalars.queries, Scalars.oracle),
    (graft.streaming.StreamOps.queries, graft.streaming.StreamOps.oracle),
    (CustomOps.queries, CustomOps.oracle),
    (TextOps.queries, TextOps.oracle),
    (DedupOps.queries, DedupOps.oracle),
    (SimilarityOps.queries, SimilarityOps.oracle),
    (MultimodalOps.queries, MultimodalOps.oracle),
    (Extras.queries, Extras.oracle),
    (IvfAnn.queries, IvfAnn.oracle),
    (PqIndex.queries, PqIndex.oracle),
    (BpeOps.queries, BpeOps.oracle),
    (IvfPq.queries, IvfPq.oracle),
    (TypedApi.queries, TypedApi.oracle),
    (graft.ingest.BinaryIngest.queries, graft.ingest.BinaryIngest.oracle),
    (graft.sources.SnapshotTable.queries, graft.sources.SnapshotTable.oracle),
    (SqlSurface.queries, SqlSurface.oracle),
    (PipelineOps.queries, PipelineOps.oracle),
    (EmbeddingOps.queries, EmbeddingOps.oracle),
    (QualityOps.queries, QualityOps.oracle),
    (AnalyticsOps.queries, AnalyticsOps.oracle),
    (TrainingOps.queries, TrainingOps.oracle),
    (TemporalOps.queries, TemporalOps.oracle),
    (Flagship.queries, Flagship.oracle)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1 shape: parquet scan -> pushed filter -> hash agg -> sort.
    */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.queries("q_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
