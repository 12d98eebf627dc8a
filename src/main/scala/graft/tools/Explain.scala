package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan for the named
  * queries (or a default scale-critical set) at sf0.001. Used to keep the
  * plans honest: pushed filters, pruned schemas, broadcast choices,
  * window-group limits.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_scan_parquet", "q_join_broadcast", "q_topk_per_group",
        "q_sort_limit", "q_agg_hash", "q_dedup_ngram_jaccard")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
