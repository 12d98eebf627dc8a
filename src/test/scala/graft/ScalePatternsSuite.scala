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

  test("withGlobalRank equals row_number over the total order on unique keys") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val got = ScalePatterns.withGlobalRank(df, "rk", col("o_orderkey").asc)
      .select(col("o_orderkey"), col("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = df.withColumn("rk",
        row_number().over(Window.orderBy(col("o_orderkey").asc)))
      .select(col("o_orderkey"), col("rk"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == expected,
      "parallel range+zipWithIndex ranks must equal the global window's")
    // and the plan must NOT contain the single-partition window
    val plan = ScalePatterns.withGlobalRank(df, "rk", col("o_orderkey").asc)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window expected, got:\n$plan")
  }

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

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // one hot key dominating the left side; thresholds lowered so the
    // test corpus trips the same skew machinery a 100 TB job would
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val skewed = (1 to 200000).map(i =>
        (if (i % 10 == 0) i.toLong % 7 else 0L, s"payload_$i")).toDF("k", "p")
      val dim = (0L to 6L).map(k => (k, s"dim_$k")).toDF("k", "d")
      val joined = skewed.join(dim.hint("MERGE"), Seq("k"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot partition as skewed:\n$plan")
    } finally {
      Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold")
        .foreach(spark.conf.unset)
    }
  }

  test("dynamic partition pruning injects a runtime filter into the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.documents(spark, sf)
      .write.mode("overwrite").partitionBy("lang").parquet(dir + "/fact")
    // the dim must be a file relation with a REAL selective filter: a
    // local Seq constant-folds the filter away and DPP never fires
    Tables.documents(spark, sf).select(col("lang")).distinct()
      .withColumn("grp", when(col("lang") === "de", 1).otherwise(2))
      .write.mode("overwrite").parquet(dir + "/dim")
    val dim = spark.read.parquet(dir + "/dim").filter(col("grp") === 1)
    val fact = spark.read.parquet(dir + "/fact")
    val joined = fact.join(dim, Seq("lang"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter in the scan:\n$plan")
    assert(joined.count() ==
      Tables.documents(spark, sf).filter(col("lang") === "de").count())
  }

  test("runtime bloom filter prunes the big side of a selective join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    // both sides must be file relations: the filter creation side seeds
    // the bloom from a real scan, and the application side must be big
    // enough (thresholds lowered below) for the rewrite to pay off
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").parquet(dir + "/fact")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(dir + "/dim")
    val old = (
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      // force a shuffle join: a broadcast join gets no bloom rewrite
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = spark.read.parquet(dir + "/dim")
        .filter(col("o_orderpriority") === "1-URGENT")
      val fact = spark.read.parquet(dir + "/fact")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"expected a runtime bloom filter on the fact scan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", old._1)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", old._2)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old._3)
    }
  }

  test("footer aggregate pushes COUNT/MIN/MAX into the parquet scan " +
      "and matches the row-scanned result") {
    val path = s"$sf/lineitem.parquet"
    val cols = Seq("l_orderkey", "l_quantity")
    // the scoped wrapper must answer from footer stats...
    val pushed = ScalePatterns.footerAgg(spark, path, cols).collect()(0)
    // ...and equal the ordinary v1 row-scan aggregate
    val scanned = ScalePatterns.footerAggFrame(spark, path, cols).collect()(0)
    assert(pushed == scanned, s"pushed=$pushed scanned=$scanned")
    // plan proof: under the v2 confs the scan carries PushedAggregation
    val v1Key = "spark.sql.sources.useV1SourceList"
    val pushKey = "spark.sql.parquet.aggregatePushdown"
    val (prevV1, prevPush) = (spark.conf.get(v1Key), spark.conf.get(pushKey))
    spark.conf.set(v1Key, prevV1.split(",").map(_.trim)
      .filter(s => s.nonEmpty && s != "parquet").mkString(","))
    spark.conf.set(pushKey, "true")
    try {
      val df = ScalePatterns.footerAggFrame(spark, path, cols)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)"),
        s"expected footer-stats pushdown in the scan, got:\n$plan")
      assert(plan.contains("MIN(l_orderkey)") && plan.contains("MAX(l_quantity)"),
        s"expected MIN/MAX in PushedAggregation, got:\n$plan")
    } finally {
      spark.conf.set(v1Key, prevV1)
      spark.conf.set(pushKey, prevPush)
    }
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

  test("day-bucketed interval join equals the naive range join on " +
      "MID-DAY intervals (8-calendar-day span)") {
    // shift both sides off midnight: a 7-day window starting 13:00
    // spans 8 calendar days, and points at 05:00 land on that 8th day
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 13 HOURS")).as("w_start"))
      .withColumn("w_end", col("w_start") + expr("INTERVAL 7 DAYS"))
    val p = Tables.lineitem(spark, sf).select(col("l_orderkey"),
      (col("l_shipdate") + expr("INTERVAL 5 HOURS")).as("pts"))
    val bucketed = ScalePatterns.dayBucketedIntervalJoin(
      p, "pts", o, "w_start", "w_end").count()
    val naive = p.join(o,
      col("pts") >= col("w_start") && col("pts") < col("w_end")).count()
    assert(naive > 0, "fixture must produce matches")
    assert(bucketed == naive, s"bucketed=$bucketed naive=$naive")
  }

  /** Rows the parquet reader actually surfaced for a box predicate —
    * after row-group min/max pruning — vs the full table. */
  private def scanRowsFor(path: String, pred: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val q = spark.read.parquet(path).filter(pred)
    q.collect()
    collectWithSubqueries(q.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f.metrics("numOutputRows").value
    }.sum
  }

  test("z-order layout prunes row groups on BOTH dimensions") {
    // sf0.01: enough rows that 32 files have meaningful min/max spread
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val total = li.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // z-clustered layout vs a layout with no helpful order
    ScalePatterns.zorderWrite(li, Seq("l_partkey", "l_suppkey"), 32,
      dir + "/zorder")
    li.repartition(32).write.mode("overwrite").parquet(dir + "/random")
    // slab predicates, each selective in ONE dimension: a single-column
    // sort could serve one of them; the z-curve must serve both
    val partSlab = col("l_partkey") <= 100      // ~5% of the key range
    val suppSlab = col("l_suppkey") <= 5        // ~5% of the key range
    for (pred <- Seq(partSlab, suppSlab)) {
      val zRows = scanRowsFor(dir + "/zorder", pred)
      val rRows = scanRowsFor(dir + "/random", pred)
      assert(rRows >= (total * 0.95).toLong,
        s"random layout should read ~everything, read $rRows of $total")
      assert(zRows <= total / 2,
        s"z-order should skip most row groups, read $zRows of $total for $pred")
    }
    // and the clustered file set is the same data
    assert(spark.read.parquet(dir + "/zorder").count() == total)
  }

  test("bloom-pre-filtered join equals the plain join and drops the " +
      "non-matching fact volume before the shuffle") {
    import graft.functions.BloomMightContainExpr
    val dim = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 450000)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val fact = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val got = ScalePatterns.bloomPrefilterJoin(fact, "l_orderkey",
      dim, "o_orderkey", expectedItems = 1L << 16, fpp = 0.01)
    val plain = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
    // bloom false positives must be invisible: identical multiset out
    val proj = Seq("l_orderkey", "l_extendedprice", "o_orderpriority")
    val gotRows = got.select(proj.map(col): _*).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plainRows = plain.select(proj.map(col): _*).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(gotRows == plainRows)
    // the pre-filter keeps every true match and at most fpp-ish extra
    val bf = dim.stat.bloomFilter("o_orderkey", 1L << 16, 0.01)
    val factN = fact.count()
    val trueN = fact.join(dim.select(col("o_orderkey")),
      fact("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val keptN = fact.filter(
      BloomMightContainExpr.might_contain(col("l_orderkey"), bf)).count()
    assert(keptN >= trueN, "a bloom filter can never false-negative")
    assert(keptN <= trueN + (factN * 0.05).toLong + 8,
      s"pre-filter kept $keptN of $factN; true matches $trueN — " +
        "the shuffled volume should collapse to selectivity + fpp")
    assert(trueN < factN / 2,
      "test setup: the dim must actually be selective on the fact")
    // the probe is a codegen'd catalyst expression, not a UDF
    val plan = fact.filter(
        BloomMightContainExpr.might_contain(col("l_orderkey"), bf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
    // null keys are dropped by the pre-filter, matching inner-join nulls
    import spark.implicits._
    val nullKeyed = Seq(Option(1L), Option.empty[Long])
      .toDF("l_orderkey")
    assert(nullKeyed.filter(
      BloomMightContainExpr.might_contain(col("l_orderkey"), bf))
      .count() <= 1)
  }

  test("withZValue tolerates NaN and NULL dims (ANSI floor-cast guard)") {
    import spark.implicits._
    val df = Seq(
      (1L, 1.0, 10.0), (2L, Double.NaN, 20.0), (3L, 9.0, 30.0))
      .toDF("id", "x", "y")
      .union(Seq((4L, Option.empty[Double], Option(40.0)))
        .toDF("id", "x", "y"))
    val z = ScalePatterns.withZValue(df, Seq("x", "y"), bits = 8)
      .select(col("id"), col("__z")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(z.size == 4, "no row may be dropped or nulled out")
    // NaN/NULL x pins to the dimension min: same x-cell as id=1, and the
    // y ordering still separates them on the curve
    assert(z.values.forall(_ >= 0L))
    // a fully-null dimension degrades to cell 0 instead of throwing
    val allNull = Seq((1L, Option.empty[Double], Option(1.0)),
      (2L, Option.empty[Double], Option(2.0))).toDF("id", "x", "y")
    assert(ScalePatterns.withZValue(allNull, Seq("x", "y"), bits = 8)
      .select(col("__z")).collect().forall(!_.isNullAt(0)))
  }
}
