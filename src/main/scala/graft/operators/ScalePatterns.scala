package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns that only pay off beyond the test corpus but are part
  * of the engine's 100 TB posture:
  *
  *   - **bucketed co-located joins**: both fact tables written bucketed
  *     on the join key -> repeated joins run shuffle-free (no Exchange
  *     in the plan); the once-per-dataset shuffle happens at write time.
  *   - **salted joins**: a hot key would send its whole volume to one
  *     reducer; salting splits each hot left key across `saltFactor`
  *     sub-keys and replicates the matching right rows, so the skewed
  *     key's work spreads over `saltFactor` tasks. (AQE skew-join
  *     handles moderate skew automatically; salting is the explicit
  *     contract for pathological keys.)
  */
object ScalePatterns {

  /** Write both sides bucketed by the join key into the session catalog
    * (requires a warehouse dir), returning the bucketed table names.
    */
  def writeBucketed(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, buckets: Int, leftName: String, rightName: String): Unit = {
    left.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(leftName)
    right.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(rightName)
  }

  /** Join two bucketed tables on their bucket key: with matching bucket
    * counts Spark plans a SortMergeJoin with NO shuffle exchange.
    */
  def bucketedJoin(spark: SparkSession, leftName: String, rightName: String,
      key: String): DataFrame =
    spark.table(leftName).join(spark.table(rightName), key)

  /** Global sequential ranks (1..n in `order`) WITHOUT a single-task
    * window: range-repartition on the sort key, sort within partitions,
    * then zipWithIndex — the per-partition offsets come from one count
    * job over the partition sizes (the classic prefix-sum-of-partition-
    * counts pattern), so every partition numbers its rows in parallel.
    * Equals `row_number().over(Window.orderBy(order))` whenever the sort
    * key is unique (with ties the rank among tied rows is arbitrary in
    * BOTH formulations — range boundaries here, partition order there).
    *
    * EAGER: the sorted input is localCheckpoint'ed (one materializing
    * job at call time) because zipWithIndex computes its offsets in a
    * job of its own — without the checkpoint the whole sort pipeline
    * would execute twice. The rank stitch itself runs as RDD[Row]
    * (outside codegen): right for a bounded side (a merge delta), not
    * for a hot inner loop.
    */
  def withGlobalRank(df: DataFrame, idCol: String,
      order: org.apache.spark.sql.Column*): DataFrame = {
    val s = df.sparkSession
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint()
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        idCol, org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    s.createDataFrame(ranked, schema)
  }

  /** Skew-safe equi-join: left rows get a deterministic salt in
    * [0, saltFactor); right rows are replicated once per salt value; the
    * join key becomes (key, salt). Result set is identical to the plain
    * join — every left row still meets every matching right row exactly
    * once — but a hot key's rows now hash to `saltFactor` partitions.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(saltFactor))
        .cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
