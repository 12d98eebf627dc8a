package graft.operators

import graft.Tables
import graft.Det.r4
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage extensions: full outer join, pivot, range-frame windows,
  * exact percentiles — rounding out the relational surface beyond
  * SURVEY.md §2.2 (recorded in §2.3).
  */
object Extras {

  /** Per-application staging root for the sink round-trip queries
    * (q_scan_orc / q_scan_text). Registering the app's root for
    * delete-on-JVM-exit keeps repeated Bench/Verify runs from
    * accumulating one staged lineitem/documents copy per run in /tmp
    * (the files must outlive the QUERY — the read side scans them at
    * action time — so cleanup hangs off JVM shutdown, not the query).
    */
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def stageDir(s: SparkSession, leaf: String): String = {
    val appId = s.sparkContext.applicationId
    val root = s"/tmp/graft_stage_$appId"
    if (cleanupRegistered.add(appId)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(root))
      }))
    }
    s"$root/$leaf"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full outer join with null extension on both sides.
    "q_join_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_mktsegment"))
      val o = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(r4(sum(col("o_totalprice"))).as("spend"))
        .filter(col("spend") > 500000)
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("k"),
          col("c_mktsegment"), col("spend"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // Pivot: order priorities spread into columns per status
    // (RelationalGroupedDataset.pivot with explicit values).
    "q_pivot_priority" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(r4(sum(col("o_totalprice"))))
        .toDF("o_orderstatus", "p_urgent", "p_high", "p_medium",
          "p_notspec", "p_low")
        .orderBy(col("o_orderstatus").asc_nulls_first)
    }),

    // RANGE frame: running spend over a value window (all orders within
    // 10000 below the current price, per customer).
    "q_window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").asc_nulls_first)
        .rangeBetween(-10000L, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          r4(col("o_totalprice")).as("price"),
          count(lit(1)).over(w).as("n_near"),
          r4(sum(col("o_totalprice")).over(w)).as("near_spend"))
        .orderBy(col("o_custkey").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)
    }),

    // Statistical aggregates (Welford-style accumulators in both
    // engines; r4 absorbs accumulation-order noise).
    "q_agg_stats" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(r4(stddev_samp(col("o_totalprice"))).as("sd"),
          r4(var_samp(col("o_totalprice"))).as("variance"),
          r4(corr(col("o_totalprice"), col("o_custkey"))).as("price_cust_corr"),
          r4(covar_samp(col("o_totalprice"), col("o_custkey"))).as("cv"))
        .orderBy(col("o_orderstatus").asc_nulls_first)
    }),

    // Closed-form OLS regression per group from raw power sums — NOT the
    // built-in regr_* aggregates, whose sample-vs-population corrections
    // differ between engines; the explicit formula (slope = (nΣxy −
    // ΣxΣy)/(nΣx² − (Σx)²)) is exact-ops-only and therefore
    // hash-portable. One partial-aggregated groupBy: the five sums are
    // the mergeable state, the derivation is post-agg arithmetic —
    // the textbook "regression at scale is just sufficient statistics"
    // shape.
    "q_agg_regression" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("l_quantity").cast("double")).as("sx"),
          sum(col("l_extendedprice")).as("sy"),
          sum(col("l_quantity").cast("double") * col("l_quantity")).as("sxx"),
          sum(col("l_quantity").cast("double") * col("l_extendedprice"))
            .as("sxy"))
        .withColumn("slope", r4((col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("sxx") - col("sx") * col("sx"))))
        .withColumn("intercept", r4((col("sy")
          - ((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx"))
          / col("n")))
        .select(col("l_returnflag"), col("n").cast("bigint").as("n_rows"),
          col("slope"), col("intercept"))
        .orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // Higher central moments (skewness/kurtosis) from raw power sums —
    // again NOT the built-ins (Spark and DuckDB disagree on bias
    // corrections): m_k derived from Σx..Σx⁴, skew = m3/(m2·√m2) (sqrt
    // is IEEE-exact, no pow), kurtosis excess = m4/m2² − 3. Mergeable
    // power sums -> post-agg arithmetic, same scale shape as above.
    "q_agg_moments" -> ((s, d) => {
      val x = col("o_totalprice")
      val agged = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).cast("double").as("n"), sum(x).as("s1"),
          sum(x * x).as("s2"), sum(x * x * x).as("s3"),
          sum(x * x * x * x).as("s4"))
        .withColumn("mean", col("s1") / col("n"))
      val m2 = col("s2") / col("n") - col("mean") * col("mean")
      val m3 = (col("s3") / col("n")
        - lit(3.0) * col("mean") * (col("s2") / col("n"))
        + lit(2.0) * col("mean") * col("mean") * col("mean"))
      val m4 = (col("s4") / col("n")
        - lit(4.0) * col("mean") * (col("s3") / col("n"))
        + lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n"))
        - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
      agged
        .withColumn("skew", r4(m3 / (m2 * sqrt(m2))))
        .withColumn("kurt_excess", r4(m4 / (m2 * m2) - lit(3.0)))
        .select(col("o_orderstatus"), col("n").cast("bigint").as("n_rows"),
          r4(col("mean")).as("mean"), col("skew"), col("kurt_excess"))
        .orderBy(col("o_orderstatus").asc_nulls_first)
    }),

    // Frequency-weighted mean/variance per group (the "avg price
    // weighted by quantity" family): wmean = Σwx/Σw, wvar = Σwx²/Σw −
    // wmean² — exact-ops sufficient statistics, one partial-agg groupBy
    // like the regression/moments queries above.
    "q_agg_weighted_stats" -> ((s, d) => {
      val w = col("l_quantity").cast("double")
      val x = col("l_extendedprice")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(sum(w).as("sw"), sum(w * x).as("swx"),
          sum(w * x * x).as("swxx"), count(lit(1)).as("n_rows"))
        .withColumn("wmean", r4(col("swx") / col("sw")))
        .withColumn("wvar", r4(col("swxx") / col("sw")
          - (col("swx") / col("sw")) * (col("swx") / col("sw"))))
        .select(col("l_returnflag"), col("n_rows"),
          r4(col("sw")).as("total_weight"), col("wmean"), col("wvar"))
        .orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // Scalar subquery: compare each row against a whole-table aggregate.
    "q_scalar_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_ssq")
      s.sql(
        """SELECT o_orderkey,
          |  floor((o_totalprice) * 10000 + CAST(0.5 AS DOUBLE))
          |    / CAST(10000 AS DOUBLE) AS price
          |FROM graft_orders_ssq
          |WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice)
          |                            FROM graft_orders_ssq)
          |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)
    }),

    // JSON source round-trip (complements the CSV source): stage a
    // bounded dim to JSON-lines, read back with an explicit schema.
    "q_scan_json" -> ((s, d) => {
      val stage = s"${graft.StagePaths.root}/nation_json"
      Tables.nation(s, d).orderBy("n_nationkey").coalesce(1)
        .write.mode("overwrite").json(stage)
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .json(stage)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey").asc_nulls_first)
    }),

    // Spark 4 collations: UTF8_LCASE comparison semantics carried by the
    // TYPE, so grouping/equality/joins are case-insensitive without
    // lower() rewrites at every use site. Mixed-case input synthesized
    // deterministically (every even part uppercased); the counts prove
    // the collated distinct collapses case variants that the binary
    // collation keeps apart. The oracle states the same semantics the
    // portable way (lower()).
    "q_collation" -> ((s, d) => {
      val mixed = Tables.part(s, d)
        .withColumn("mixed", when(col("p_partkey") % 2 === 0,
          upper(col("p_name"))).otherwise(col("p_name")))
      mixed.agg(
        countDistinct(collate(col("mixed"), "UTF8_LCASE")).as("n_ci"),
        countDistinct(col("mixed")).as("n_cs"),
        count(lit(1)).as("n_rows"))
    }),

    // ORC round trip: the third columnar format next to parquet/CSV —
    // written, re-read, and aggregated. DuckDB cannot read ORC, so the
    // oracle states the same aggregate over the ORIGINAL table: a hash
    // match proves the ORC sink+source is lossless, not just runnable.
    "q_scan_orc" -> ((s, d) => {
      // per-run stage dir (deleted on JVM exit): two concurrent Bench/
      // Verify runs on one host must not clobber each other's staged
      // files mid-read (q_scan_json alone keeps a fixed path — its
      // DuckDB oracle reads that path)
      val stage = stageDir(s, "lineitem_orc")
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice"), col("l_quantity"))
        .write.mode("overwrite").orc(stage)
      s.read.orc(stage)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(graft.Det.r4(sum(col("l_extendedprice"))).as("revenue"),
          graft.Det.r4(sum(col("l_quantity"))).as("qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Text-source round trip: one line per document through the text
    // sink and back (docs are single-line by construction), then a
    // token top-20. Same lossless-round-trip oracle trick as q_scan_orc.
    "q_scan_text" -> ((s, d) => {
      val stage = stageDir(s, "documents_text")
      Tables.documents(s, d).select(col("text"))
        .write.mode("overwrite").text(stage)
      s.read.text(stage)
        .select(explode(split(col("value"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc_nulls_first)
        .limit(20)
    }),

    // Spark 4 VARIANT for semi-structured columns: parse once into the
    // binary variant encoding, extract typed fields lazily — the
    // schema-on-read path for ragged JSON at lake scale (no per-query
    // string re-parsing, pushdown-friendly shredding). Oracled against
    // DuckDB's json_extract of the same field.
    "q_scan_variant" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "bigint").as("k_val"))
        .orderBy(col("event_id").asc_nulls_first)
    }),

    // Deterministic collect/string-agg: sorted value list per group
    // (sort_array makes the collect order-independent).
    "q_agg_collect" -> ((s, d) => {
      Tables.supplier(s, d)
        .groupBy(col("s_nationkey"))
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",")
            .as("suppliers"),
          count(lit(1)).as("n"))
        .orderBy(col("s_nationkey").asc_nulls_first)
    }),

    // Exact percentiles (linear interpolation) per group.
    "q_agg_percentile" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(r4(expr("percentile(c_acctbal, 0.5)")).as("p50"),
          r4(expr("percentile(c_acctbal, 0.25)")).as("p25"),
          r4(expr("percentile(c_acctbal, 0.95)")).as("p95"))
        .orderBy(col("c_mktsegment").asc_nulls_first)
    }),

    // Small-file compaction round trip (lakehouse maintenance, reference
    // R22's write path at scale): fragment `documents` into 16 files,
    // compact to a 1 GiB target, and emit the audited counts. The oracle
    // pins the expected file counts and that no rows were lost —
    // compaction is a rewrite, not a transform. The 1 GiB target keeps
    // files_after=1 for any sf whose documents parquet stays under it
    // (sf0.1 is ~20 MB), so the pinned oracle isn't a scale-knob trap.
    "q_compact_files" -> ((s, d) => {
      import s.implicits._
      val path = s"/tmp/graft_compact_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      Tables.documents(s, d).repartition(16)
        .write.mode("overwrite").parquet(path)
      val (before, after) = graft.ingest.Ingest.compact(s, path, targetMB = 1024)
      val n = s.read.parquet(path).count()
      Seq((before, after, n)).toDF("files_before", "files_after", "n_rows")
    }),

    // Z-order (Morton) layout audit: interleave l_partkey × l_suppkey
    // into a z-value (ScalePatterns.withZValue — a flat shift/and/or
    // expression tree, fully codegen) and report per-z-bucket row counts
    // and min/max bounds of BOTH dimensions. Sorting a 100 TB table by
    // this key before writing gives every file tight min/max ranges on
    // all z'd columns at once — multi-dimensional data skipping from
    // vanilla parquet zone maps (single-column sorts prune only their
    // own column; ScalePatternsSuite measures the actual per-file span
    // shrink on a zorderWrite). The oracle re-states the identical
    // scale-floor-interleave arithmetic in SQL — deterministic IEEE
    // double ops and integer bit ops, so it hash-matches exactly.
    "q_layout_zorder" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))
      ScalePatterns.withZValue(li, Seq("l_partkey", "l_suppkey"), bits = 16)
        .withColumn("z_bucket", shiftright(col("__z"), 22))
        .groupBy(col("z_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
          min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
        .orderBy(col("z_bucket").asc_nulls_first)
    })
  )

  private def R(e: String) =
    s"floor(($e) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE)"

  val oracle: Map[String, String] = Map(
    "q_join_full_outer" ->
      s"""SELECT coalesce(c_custkey, o_custkey) AS k, c_mktsegment, spend
         |FROM (SELECT c_custkey, c_mktsegment FROM customer
         |      WHERE c_acctbal > 9000) c
         |FULL JOIN (
         |  SELECT o_custkey, spend FROM (
         |    SELECT o_custkey, ${R("sum(o_totalprice)")} AS spend
         |    FROM orders GROUP BY o_custkey) t
         |  WHERE spend > 500000) o
         |ON c_custkey = o_custkey
         |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q_pivot_priority" ->
      s"""SELECT o_orderstatus,
         |  ${R("sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END)")} AS p_urgent,
         |  ${R("sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END)")} AS p_high,
         |  ${R("sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END)")} AS p_medium,
         |  ${R("sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END)")} AS p_notspec,
         |  ${R("sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END)")} AS p_low
         |FROM orders GROUP BY o_orderstatus
         |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q_window_range_frame" ->
      s"""SELECT o_custkey, o_orderkey, ${R("o_totalprice")} AS price,
         |  count(1) OVER w AS n_near,
         |  ${R("sum(o_totalprice) OVER w")} AS near_spend
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey
         |  ORDER BY o_totalprice ASC NULLS FIRST
         |  RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    // same explicit power-sum formulas; CAST orders match the engine's
    "q_agg_regression" ->
      s"""WITH a AS (
         |  SELECT l_returnflag,
         |    CAST(count(1) AS DOUBLE) AS n,
         |    sum(CAST(l_quantity AS DOUBLE)) AS sx,
         |    sum(l_extendedprice) AS sy,
         |    sum(CAST(l_quantity AS DOUBLE) * l_quantity) AS sxx,
         |    sum(CAST(l_quantity AS DOUBLE) * l_extendedprice) AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
         |  ${R("(n * sxy - sx * sy) / (n * sxx - sx * sx)")} AS slope,
         |  ${R("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n")} AS intercept
         |FROM a ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_agg_moments" ->
      s"""WITH a AS (
         |  SELECT o_orderstatus, CAST(count(1) AS DOUBLE) AS n,
         |    sum(o_totalprice) AS s1,
         |    sum(o_totalprice * o_totalprice) AS s2,
         |    sum(o_totalprice * o_totalprice * o_totalprice) AS s3,
         |    sum(o_totalprice * o_totalprice * o_totalprice * o_totalprice) AS s4
         |  FROM orders GROUP BY o_orderstatus),
         |b AS (SELECT *, s1 / n AS mean FROM a),
         |c AS (SELECT *,
         |    s2 / n - mean * mean AS m2,
         |    s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean AS m3,
         |    s4 / n - 4.0 * mean * (s3 / n)
         |      + 6.0 * mean * mean * (s2 / n)
         |      - 3.0 * mean * mean * mean * mean AS m4
         |  FROM b)
         |SELECT o_orderstatus, CAST(n AS BIGINT) AS n_rows,
         |  ${R("mean")} AS mean,
         |  ${R("m3 / (m2 * sqrt(m2))")} AS skew,
         |  ${R("m4 / (m2 * m2) - 3.0")} AS kurt_excess
         |FROM c ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q_agg_weighted_stats" ->
      s"""WITH a AS (
         |  SELECT l_returnflag,
         |    sum(CAST(l_quantity AS DOUBLE)) AS sw,
         |    sum(CAST(l_quantity AS DOUBLE) * l_extendedprice) AS swx,
         |    sum(CAST(l_quantity AS DOUBLE) * l_extendedprice * l_extendedprice) AS swxx,
         |    count(1) AS n_rows
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n_rows,
         |  ${R("sw")} AS total_weight,
         |  ${R("swx / sw")} AS wmean,
         |  ${R("swxx / sw - (swx / sw) * (swx / sw)")} AS wvar
         |FROM a ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_agg_stats" ->
      s"""SELECT o_orderstatus,
         |  ${R("stddev_samp(o_totalprice)")} AS sd,
         |  ${R("var_samp(o_totalprice)")} AS variance,
         |  ${R("corr(o_totalprice, o_custkey)")} AS price_cust_corr,
         |  ${R("covar_samp(o_totalprice, o_custkey)")} AS cv
         |FROM orders GROUP BY o_orderstatus
         |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q_scalar_subquery" ->
      s"""SELECT o_orderkey, ${R("o_totalprice")} AS price
         |FROM orders
         |WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
         |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_collation" ->
      """SELECT count(DISTINCT lower(mixed)) AS n_ci,
        |  count(DISTINCT mixed) AS n_cs,
        |  count(1) AS n_rows
        |FROM (SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
        |    ELSE p_name END AS mixed FROM part)""".stripMargin,
    // stated over the ORIGINAL lineitem: hash match <=> lossless ORC trip
    "q_scan_orc" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_extendedprice)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS revenue,
        |  floor((sum(l_quantity)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS qty,
        |  count(1) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_scan_text" ->
      """SELECT token, count(1) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token
        |ORDER BY n DESC, token ASC NULLS FIRST
        |LIMIT 20""".stripMargin,
    "q_scan_json" ->
      s"""SELECT n_nationkey, n_name, n_regionkey
        |FROM read_json('${graft.StagePaths.root}/nation_json/*.json',
        |  columns={'n_nationkey':'INT','n_name':'VARCHAR','n_regionkey':'INT'},
        |  format='newline_delimited')
        |ORDER BY n_nationkey ASC NULLS FIRST""".stripMargin,
    "q_scan_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_agg_collect" ->
      """SELECT s_nationkey,
        |  array_to_string(list_sort(list(s_name)), ',') AS suppliers,
        |  count(1) AS n
        |FROM supplier GROUP BY s_nationkey
        |ORDER BY s_nationkey ASC NULLS FIRST""".stripMargin,
    "q_agg_percentile" ->
      s"""SELECT c_mktsegment,
         |  ${R("quantile_cont(c_acctbal, 0.5)")} AS p50,
         |  ${R("quantile_cont(c_acctbal, 0.25)")} AS p25,
         |  ${R("quantile_cont(c_acctbal, 0.95)")} AS p95
         |FROM customer GROUP BY c_mktsegment
         |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin,
    // expected post-conditions of the compaction rewrite: 16 fragments in,
    // ceil(bytes/128MB)=1 file out at verify/bench scale, zero row loss
    "q_compact_files" ->
      """SELECT CAST(16 AS BIGINT) AS files_before,
        |  CAST(1 AS BIGINT) AS files_after,
        |  (SELECT count(1) FROM documents) AS n_rows""".stripMargin,
    // identical scale-floor-interleave arithmetic as withZValue(bits=16):
    // cell = least(65535, floor((x - mn) / span * 65536.0)), then bit b
    // of cell_i lands at z-bit b*2+i; bucket = top 10 of the 32 z bits
    "q_layout_zorder" -> {
      val inter = (0 until 16).flatMap(b => Seq(0, 1).map(i =>
        s"(((c$i & ${1L << b}) >> $b) << ${b * 2 + i})")).mkString(" | ")
      s"""WITH st AS (
         |  SELECT min(CAST(l_partkey AS DOUBLE)) AS mn0,
         |         max(CAST(l_partkey AS DOUBLE)) AS mx0,
         |         min(CAST(l_suppkey AS DOUBLE)) AS mn1,
         |         max(CAST(l_suppkey AS DOUBLE)) AS mx1
         |  FROM lineitem),
         |c AS (
         |  SELECT l_partkey, l_suppkey,
         |    CASE WHEN mx0 - mn0 = 0 OR mx0 - mn0 IS NULL THEN CAST(0 AS BIGINT)
         |      ELSE least(65535, CAST(floor((CAST(l_partkey AS DOUBLE) - mn0) / (mx0 - mn0) * 65536.0) AS BIGINT)) END AS c0,
         |    CASE WHEN mx1 - mn1 = 0 OR mx1 - mn1 IS NULL THEN CAST(0 AS BIGINT)
         |      ELSE least(65535, CAST(floor((CAST(l_suppkey AS DOUBLE) - mn1) / (mx1 - mn1) * 65536.0) AS BIGINT)) END AS c1
         |  FROM lineitem CROSS JOIN st),
         |z AS (SELECT l_partkey, l_suppkey, ($inter) AS zv FROM c)
         |SELECT zv >> 22 AS z_bucket, count(1) AS n,
         |  min(l_partkey) AS p_min, max(l_partkey) AS p_max,
         |  min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
         |FROM z GROUP BY z_bucket ORDER BY z_bucket ASC NULLS FIRST""".stripMargin
    }
  )
}
