package graft.tools

import graft.Tables
import graft.operators.TrainingOps
import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** End-to-end training-corpus walkthrough through the public APIs:
  * full pipeline run with curation gates -> seed a standing corpus ->
  * stream one landed batch through incremental admission -> consistency
  * check -> final training manifest. Prints each stage's report;
  * doubles as the usage example for the TrainingOps/CorpusPipeline
  * tier. Runs on sf0.001 in a few seconds.
  */
object TrainingDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = Files.createTempDirectory("graft_training_demo").toString

    // 1. full historical cleaning with every curation gate enabled
    val bench = Tables.documents(spark, sf)
      .filter(col("doc_id") % 37 === 0).select("doc_id", "text")
    val report = CorpusPipeline.run(spark, sf, s"$work/clean",
      benchmark = Some(bench), maxRepetition = Some(0.5),
      maxXent = Some(10.0))
    println(s"== full pipeline ==\n$report")

    // 2. standing corpus + index, then one streamed batch
    val docs = Tables.documents(spark, sf)
    CorpusPipeline.seedCorpus(spark,
      docs.filter(col("doc_id") % 3 =!= 0), s"$work/corpus", s"$work/idx")
    docs.filter(col("doc_id") % 3 === 0)
      .write.parquet(s"$work/landing/batch0")
    val q = CorpusPipeline.streamIncremental(spark, s"$work/landing/*",
      s"$work/corpus", s"$work/idx", s"$work/ckpt", Trigger.AvailableNow(),
      benchmark = Some(bench))
    q.awaitTermination(120000)
    println(s"== streamed admission ==")
    println(s"corpus size: ${spark.read.parquet(s"$work/corpus").count()}")
    println(s"reconcile repairs needed: " +
      CorpusPipeline.reconcile(spark, s"$work/corpus", s"$work/idx"))

    // 3. score the admitted corpus against its own LM, then emit the
    //    final shuffled, epoch-mixed, token-packed manifest
    val corpus = spark.read.parquet(s"$work/corpus")
    TrainingOps.perplexityScoresAgainst(corpus, corpus)
      .orderBy(col("xent").desc).limit(5).show(false)
    val manifest = TrainingOps.trainingManifest(
      Tables.documents(spark, sf), binTokens = 2048, salt = "demo",
      shardWidth = 500L)
    println(s"== manifest ==")
    manifest.orderBy(col("pos")).show(8, truncate = false)
    println(s"rows: ${manifest.count()}, bins: " +
      manifest.select(countDistinct(col("bin"))).head().getLong(0))
    spark.stop()
  }
}
