package graft.tools

import graft.Tables
import graft.operators.{IvfAnn, ScalePatterns}
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.SessionEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-pattern walkthrough through the public API: bucketed
  * shuffle-free join, salted skew join, IVF ANN, stateful sessionizer
  * (batch mode — flatMapGroupsWithState also runs on static Datasets).
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-scale-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // bucketed co-located join: shuffle-free plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ScalePatterns.writeBucketed(spark,
      Tables.orders(spark, sf),
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "o_orderkey", 4, "demo_bkt_orders", "demo_bkt_lineitem")
    val bj = ScalePatterns.bucketedJoin(spark,
      "demo_bkt_orders", "demo_bkt_lineitem", "o_orderkey")
    bj.collect()
    val plan = bj.queryExecution.executedPlan.toString
    println("BUCKETED-JOIN shuffle exchanges in plan: " +
      "Exchange hashpartitioning".r.findAllIn(plan).size +
      s", rows = ${bj.count()}")

    // salted skew join vs plain join
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("o_orderkey")).count()
    val salted = ScalePatterns.saltedJoin(li, o, "o_orderkey", 8).count()
    println(s"SALTED-JOIN rows = $salted, plain = $plain, equal = ${salted == plain}")

    // IVF ANN
    val ivf = IvfAnn.query(spark, sf)
    println("IVF-ANN sample:")
    ivf.show(6, false)

    // file-source streaming: events parquet as an unbounded stream
    import org.apache.spark.sql.streaming.Trigger
    val sq = graft.streaming.StreamOps.tumblingStream(spark, sf)
      .writeStream.format("memory").queryName("demo_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination(120000)
    println("FILE-STREAM windows: " + spark.table("demo_stream").count() +
      " (batch form: " +
      graft.streaming.StreamOps.tumbling(spark, sf).count() + ")")

    // stateful sessionizer in batch mode over a tiny inline dataset
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val evs = Seq(
      SessionEvent(1L, t("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1L, t("2024-01-01 10:05:00"), 2.0),
      SessionEvent(1L, t("2024-01-01 10:30:00"), 5.0)).toDS()
    println("STATEFUL sessions (batch mode):")
    StatefulSessions.sessionize(evs).show(false)
    spark.stop()
  }
}
