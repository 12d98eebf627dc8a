package graft

import graft.operators.ScalePatterns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level and equivalence checks for the 100 TB patterns: bucketed
  * joins must not shuffle; salted joins must be result-identical to
  * plain joins.
  */
class ScalePatternsSuite extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkFixture._

  test("bucketed co-located join plans no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ScalePatterns.writeBucketed(spark,
        Tables.orders(spark, sf), Tables.lineitem(spark, sf)
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        key = "o_orderkey", buckets = 4,
        leftName = "graft_bkt_orders", rightName = "graft_bkt_lineitem")
      val joined = ScalePatterns.bucketedJoin(spark,
        "graft_bkt_orders", "graft_bkt_lineitem", "o_orderkey")
      joined.collect() // materialize so AQE finalizes the plan
      val exec = joined.queryExecution.executedPlan
      val shuffles = collectWithSubqueries(exec) {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be shuffle-free, found: $shuffles")
      // and it is still a correct join
      val expected = Tables.orders(spark, sf).join(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }

  test("partitionBy write enables partition pruning at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.documents(spark, sf)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("lang") === "de")
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("lang"), s"expected pruned scan, got:\n$scan")
    // only the lang=de directory is read
    val expected = Tables.documents(spark, sf)
      .filter(col("lang") === "de").count()
    assert(q.count() == expected)
  }

  test("salted join returns exactly the plain join result") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("o_orderkey"))
    val salted = ScalePatterns.saltedJoin(li, o, "o_orderkey", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}
