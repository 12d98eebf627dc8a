package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink breadth beyond the oracled parquet/csv/json/binary
  * queries: ORC round-trip, text-lines source, permissive JSON with
  * corrupt-record capture, and job-piggybacked metrics via the
  * Observation API (no extra pass over the data).
  */
class SourcesSuite extends AnyFunSuite {
  import SparkFixture._

  test("ORC round-trip preserves rows and schema") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/t"
    val docs = Tables.documents(spark, sf)
    docs.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.agg(sum(col("doc_id"))).head().getLong(0) ==
      docs.agg(sum(col("doc_id"))).head().getLong(0))
  }

  test("text source reads raw lines; lineSep and wholetext stay intact") {
    val dir = Files.createTempDirectory("graft_text").toString + "/t"
    Tables.documents(spark, sf).select(col("text"))
      .write.text(dir)
    val lines = spark.read.text(dir)
    assert(lines.columns.toSeq == Seq("value"))
    assert(lines.count() == Tables.documents(spark, sf).count())
  }

  test("permissive JSON captures corrupt records instead of failing") {
    val dir = Files.createTempDirectory("graft_json").toString
    val f = java.nio.file.Paths.get(dir, "mixed.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"id": 1, "name": "ok"}""",
      """{"id": 2, "name": "also ok"}""",
      """{"id": 3, "name": BROKEN""",
      """{"id": 4, "name": "fine"}"""))
    val got = spark.read
      .schema("id INT, name STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-record column requires a materialized referent
    try {
      assert(got.count() == 4)
      assert(got.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(got.filter(col("_corrupt_record").isNull).count() == 3)
    } finally { got.unpersist(); () }
  }

  test("mergeSchema unions evolving parquet schemas with null backfill") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v1").write.parquet(dir + "/gen=1")
    Seq((3L, "c", 30), (4L, "d", 40)).toDF("id", "v1", "v2")
      .write.parquet(dir + "/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "gen"))
    assert(merged.count() == 4)
    // old-generation rows surface the new column as null, not an error
    assert(merged.filter(col("gen") === 1 && col("v2").isNull).count() == 2)
    assert(merged.filter(col("gen") === 2 && col("v2").isNotNull).count() == 2)
  }

  test("Observation collects pipeline metrics without a second pass") {
    val obs = new org.apache.spark.sql.Observation("ingest_metrics")
    val out = Tables.documents(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        count(when(col("lang").isNull, lit(1))).as("null_lang"),
        sum(length(col("text"))).as("bytes_text"))
      .filter(col("n_chars") > 0)
    out.count() // one action drives both the query and the metrics
    val m = obs.get
    assert(m("rows_seen") == Tables.documents(spark, sf).count())
    assert(m("null_lang") == 0L)
    assert(m("bytes_text").asInstanceOf[Long] > 0L)
  }
}
