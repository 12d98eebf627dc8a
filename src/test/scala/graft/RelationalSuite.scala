package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Smoke + targeted correctness for the relational core at sf0.001.
  * The DuckDB differential oracle (driver t2 / tools/local_verify.py) is
  * the primary correctness gate; these specs catch regressions fast.
  */
class RelationalSuite extends AnyFunSuite {
  import SparkFixture._

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("all queries execute and are non-empty at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("q_agg_hash group counts sum to the filtered lineitem count") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
    val got = SparkEntry.queries("q_agg_hash")(spark, sf)
    val total = got.agg(sum("count_order")).head().getLong(0)
    assert(total == li.count())
  }

  test("q_topk_per_group emits at most 3 per customer") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_topk_per_group")(spark, sf)
    val maxPer = got.groupBy("o_custkey").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPer <= 3)
  }

  test("q_join_anti + semi partition the customers with such orders") {
    val semi = SparkEntry.queries("q_join_semi")(spark, sf).count()
    val c = Tables.customer(spark, sf).count()
    assert(semi <= c)
  }

  test("approx_percentile lands within accuracy bounds of the exact value") {
    import org.apache.spark.sql.functions._
    val r = Tables.lineitem(spark, sf).agg(
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"),
      expr("percentile(l_extendedprice, 0.5)").as("exact")).head
    val (a, e) = (r.getDouble(0), r.getDouble(1))
    // accuracy=1000 bounds rank error at n/1000; translate to a loose
    // relative value-error band for this distribution
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }

  test("q_agg_approx_percentile quartiles track the exact tier per group") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q_agg_approx_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
        .as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, qs) <- exact; (e, a) <- qs.zip(approx(k)))
      assert(math.abs(a - e) / e < 0.05,
        s"group $k: approx=$a exact=$e beyond the rank-error band")
  }

  test("q_agg_approx_distinct stays within HLL error bounds of exact") {
    import org.apache.spark.sql.functions._
    // rsd = 0.02 is a standard-deviation bound; 5 sigma (10% relative
    // error) is a deterministic-in-practice acceptance band per group
    val approx = SparkEntry.queries("q_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val relErr = math.abs(approx(k) - n).toDouble / n
      assert(relErr <= 0.10, s"group $k: approx=${approx(k)} exact=$n relErr=$relErr")
    }
  }
}
