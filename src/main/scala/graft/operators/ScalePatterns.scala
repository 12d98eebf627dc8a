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

  /** Unkeyed point-in-interval join as a day-bucket EQUI-join (the
    * 100 TB alternative to a broadcast nested loop): every interval
    * explodes into each calendar day it can touch — to_date(start)
    * through to_date(end), which covers the span+1-day case of a
    * mid-day start — each point maps to its one day, and the residual
    * range filter restores exact semantics (a midnight-start interval
    * just carries one empty trailing bucket). A point's day matches at
    * most one exploded row per interval, so no pair-dedup is needed.
    * Intervals are [start, end) half-open. Library-API hygiene: the
    * inputs must not share column names (the join would leave ambiguous
    * references) and must not already use the internal bucket column —
    * both rejected eagerly with a clear error instead of a downstream
    * AnalysisException or silent clobber.
    */
  def dayBucketedIntervalJoin(points: DataFrame, pointTs: String,
      windows: DataFrame, wStart: String, wEnd: String): DataFrame = {
    val bucket = "__graft_day_bucket"
    require(!points.columns.contains(bucket) &&
      !windows.columns.contains(bucket),
      s"inputs must not carry the internal column $bucket")
    val shared = points.columns.toSet.intersect(windows.columns.toSet)
    require(shared.isEmpty,
      s"points and windows must not share column names: ${shared.mkString(", ")}")
    val wd = windows.withColumn(bucket,
      explode(sequence(to_date(col(wStart)), to_date(col(wEnd)))))
    val pd = points.withColumn(bucket, to_date(col(pointTs)))
    pd.join(wd, Seq(bucket))
      .filter(col(pointTs) >= col(wStart) && col(pointTs) < col(wEnd))
      .drop(bucket)
  }

  /** Z-value (Morton code) of `dims` numeric columns: each dimension is
    * min-max scaled to a `bits`-wide integer grid cell and the cell
    * coordinates' bits are interleaved. Rows close on the z-curve are
    * close in EVERY dimension, so sorting a table by z before writing
    * gives parquet row groups tight min/max ranges on ALL the z'd
    * columns at once — the multi-dimensional data-skipping layout
    * (single-column sort layouts prune only their own column).
    *
    * The interleave is a flat shift/and/or expression tree — fully
    * whole-stage-codegen, no UDF. `ndims * bits` must fit in a long
    * (<= 63). The min/max scan is one scalar aggregate broadcast back;
    * at 100 TB those bounds come from table stats instead (same
    * expression, constant inputs).
    */
  def withZValue(df: DataFrame, dims: Seq[String], bits: Int = 16,
      zCol: String = "__z"): DataFrame = {
    require(dims.nonEmpty && dims.size * bits <= 63,
      s"${dims.size} dims x $bits bits must fit in a long")
    val cells = lit((1L << bits) - 1)
    // NaN would poison min/max (NaN sorts greatest) and then make
    // floor(NaN).cast(long) throw under ANSI — scrub it to NULL for the
    // stats and pin NaN/NULL rows to the dimension's min (cell 0), a
    // deterministic placement instead of an arbitrary range partition
    def clean(c: String) = {
      val x = col(c).cast("double")
      when(isnan(x), lit(null)).otherwise(x)
    }
    val statAggs = dims.flatMap(c =>
      Seq(min(clean(c)).as(s"__mn_$c"), max(clean(c)).as(s"__mx_$c")))
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    val scaled = dims.zipWithIndex.map { case (c, i) =>
      // cell = floor((x - mn) / (mx - mn) * 2^bits), clamped into range;
      // a degenerate dimension (mn == mx, or all-null -> null span)
      // lands every row in cell 0
      val span = col(s"__mx_$c") - col(s"__mn_$c")
      val x = coalesce(clean(c), col(s"__mn_$c"))
      val cell = when(span === 0d || span.isNull, lit(0L)).otherwise(
        least(cells, floor((x - col(s"__mn_$c")) /
          span * pow(lit(2d), lit(bits))).cast("long")))
      cell.as(s"__cell_$i")
    }
    val interleaved = (0 until bits).flatMap { b =>
      dims.indices.map { i =>
        shiftleft(shiftright(col(s"__cell_$i").bitwiseAND(lit(1L << b)), b),
          b * dims.size + i)
      }
    }.reduce(_.bitwiseOR(_))
    df.crossJoin(broadcast(stats))
      .select(df.columns.toIndexedSeq.map(col) ++ scaled: _*)
      .withColumn(zCol, interleaved)
      .drop(dims.indices.map(i => s"__cell_$i"): _*)
  }

  /** Write `df` z-order-clustered on `dims` into `nFiles` range-sliced,
    * internally z-sorted parquet files. Every file (= row group at this
    * size) then carries tight min/max bounds on every dimension, so a
    * pushed-down predicate on ANY of them skips most row groups at scan
    * time — vanilla parquet + filter pushdown, no table format needed.
    */
  def zorderWrite(df: DataFrame, dims: Seq[String], nFiles: Int,
      path: String, bits: Int = 16): Unit = {
    withZValue(df, dims, bits)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Bloom-pre-filtered shuffle equi-join (runtime-filter pattern): the
    * dim keys compress into a bloom filter (MBs where the dim itself is
    * GBs — too big to broadcast as rows, cheap to ship as bits); the
    * fact side is filtered by `might_contain` BEFORE its shuffle, so the
    * exchanged fact volume drops to (join selectivity + fpp) of the
    * input. The equi-join that follows restores exact semantics — bloom
    * false positives simply find no partner — so results are identical
    * to the plain join. `expectedItems` sizes the filter and comes from
    * table stats at scale (an overestimate just widens the filter); fpp
    * is the shuffled-false-positive budget.
    *
    * Keys are probed as longs (`putLong`/`mightContainLong` — the same
    * encoding `DataFrameStatFunctions.bloomFilter` uses for integral
    * columns), so both keys must be integral.
    */
  def bloomPrefilterJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, math.max(expectedItems, 1L), fpp)
    val pre = fact.filter(
      graft.functions.BloomMightContainExpr.might_contain(col(factKey), bf))
    pre.join(dim, pre(factKey) === dim(dimKey))
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

  /** Filterless, ungrouped COUNT/MIN/MAX over a parquet table, built so
    * Spark's v2 aggregate pushdown can answer it from row-group footer
    * statistics alone — `PushedAggregation: [COUNT(*), MIN(..), ..]` in
    * the scan, one footer read per file instead of a full-table scan. At
    * 100 TB this is the difference between a directory-listing-sized
    * metadata job and reading every row. Pushdown holds only for min/max
    * on boolean/integral/float/double/date columns (Spark's
    * AggregatePushDownUtils); strings/timestamps would silently fall back
    * to a real scan, so callers pick footer-typed columns.
    *
    * Caller must have the v2 parquet source active
    * (`spark.sql.sources.useV1SourceList` without "parquet") and
    * `spark.sql.parquet.aggregatePushdown=true`; use [[footerAgg]] for
    * the conf-scoped form.
    */
  def footerAggFrame(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path).agg(aggs.head, aggs.tail: _*)
  }

  /** Conf-scoped wrapper around [[footerAggFrame]]: flips the session to
    * the v2 parquet source with aggregate pushdown, materializes the one
    * result row (a bounded scalar collect — the pushed plan must execute
    * while the confs hold, Spark plans v2 scans at action time), restores
    * the confs, and returns the row as a local relation so nothing
    * downstream depends on the scoped settings.
    */
  def footerAgg(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val conf = spark.conf
    val v1Key = "spark.sql.sources.useV1SourceList"
    val pushKey = "spark.sql.parquet.aggregatePushdown"
    val prevV1 = conf.get(v1Key)
    val prevPush = conf.get(pushKey)
    conf.set(v1Key, prevV1.split(",").map(_.trim)
      .filter(s => s.nonEmpty && s != "parquet").mkString(","))
    conf.set(pushKey, "true")
    try {
      val df = footerAggFrame(spark, path, cols)
      spark.createDataFrame(df.collect().toIndexedSeq.asJava, df.schema)
    } finally {
      conf.set(v1Key, prevV1)
      conf.set(pushKey, prevPush)
    }
  }
}
