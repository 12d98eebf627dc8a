package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Result inspector: prints the full output of the named queries at
  * sf0.001 (override with SPARK_GRAFT_SF_DIR) — the quick look used when
  * pinning golden tests or eyeballing a new operator.
  */
object Show {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Show <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).show(1000, truncate = false)
    }
    spark.stop()
  }
}
