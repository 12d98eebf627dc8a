package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation surface: hash aggregate, distinct, approximate distinct,
  * argmax (reference R15/R26's per-category max-score selection,
  * tables.py:190-202 → `max_by`), rollup/cube/grouping sets.
  *
  * All of these ride Spark's partial (map-side) aggregation + shuffle
  * on the group keys; at 100 TB the partial agg collapses cardinality
  * before the exchange, which is the scalable shape. `max_by` is the
  * declarative argmax (Spark >= 3.3), no UDAF needed.
  */
object Aggregates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape — the flagship: scan -> filter -> hash agg -> sort.
    "q_agg_hash" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          graft.Det.r4(sum(col("l_quantity"))).as("sum_qty"),
          graft.Det.r4(sum(col("l_extendedprice"))).as("sum_base_price"),
          graft.Det.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price"),
          graft.Det.r4(avg(col("l_quantity"))).as("avg_qty"),
          graft.Det.r4(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Exact distinct aggregation (expands to a two-phase agg under AQE).
    "q_agg_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // HLL approximate distinct — no oracle (approx != hash-match); the
    // 100 TB story: one pass, bounded memory, no exact-distinct expansion.
    "q_agg_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // Approximate percentiles (Greenwald-Khanna sketch) — no oracle
    // (sketch internals differ from DuckDB's t-digest); the error bound
    // vs the exact tier is asserted in RelationalSuite. The 100 TB
    // story: one pass, bounded mergeable per-group state, no sort —
    // the exact interpolated form (q_agg_percentile) needs the whole
    // group's values.
    "q_agg_approx_percentile" -> ((s, d) => {
      // One sketch per group, quartiles projected to scalar columns so
      // downstream harnesses (and the driver's rows-only compare) never
      // have to sort an array cell.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(1000))
          .as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("q25"),
          col("qs").getItem(1).as("q50"),
          col("qs").getItem(2).as("q75"))
        .orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // Ratio-to-report (percent of total): per-nation revenue share. The
    // naive form is `sum(x) over ()` — a single-partition window over
    // every row; this plan computes the grand total from the ALREADY
    // AGGREGATED per-nation frame (25 rows) and broadcasts it back, so
    // nothing ever concentrates. Group sums are integral-cent-scale
    // doubles summed once — the ratio is then a single well-conditioned
    // division per group.
    "q_percent_of_total" -> ((s, d) => {
      val per = Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(sum(col("o_totalprice")).as("rev"), count(lit(1)).as("n_orders"))
      val total = per.agg(sum(col("rev")).as("tot"))
      per.crossJoin(broadcast(total))
        .select(col("c_nationkey"),
          graft.Det.r4(col("rev")).as("revenue"),
          col("n_orders"),
          graft.Det.r4(col("rev") / col("tot")).as("share"))
        .orderBy(col("c_nationkey").asc_nulls_first)
    }),

    // Bitmap-based EXACT distinct — the mergeable alternative to both
    // count(DISTINCT) (one big shuffle of raw keys) and HLL (approx):
    // keys fold into fixed-size per-bucket bitmaps map-side, the
    // shuffle moves bitmaps instead of keys, and bit-counts sum to the
    // exact answer. Re-aggregable like a sketch (bitmap_or_agg merges
    // levels) but exact for integer keys — the right tool for
    // high-cardinality distincts at 100 TB. Oracle: plain
    // count(DISTINCT) — the hash match proves exactness.
    "q_agg_bitmap" -> ((s, d) => {
      Tables.lineitem(s, d)
        .selectExpr("l_returnflag",
          "bitmap_bucket_number(l_partkey) AS b",
          "bitmap_bit_position(l_partkey) AS p")
        .groupBy(col("l_returnflag"), col("b"))
        .agg(expr("bitmap_count(bitmap_construct_agg(p))").as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("cnt")).as("n_parts"))
        .orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // approx_top_k (frequent-items sketch) over document tokens: the
    // heavy-hitters primitive for vocabulary/spam monitoring — one
    // pass, bounded mergeable state, no full token groupBy at read
    // time. No oracle (tie order and counts are sketch-specific);
    // RelationalSuite asserts the reported counts against the exact
    // aggregation.
    "q_agg_approx_topk" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .agg(expr("approx_top_k(token, 10)").as("top"))
        .select(posexplode(col("top")).as(Seq("rank", "entry")))
        .select(col("rank"), col("entry.item").as("token"),
          col("entry.count").as("approx_count"))
    }),

    // Apache DataSketches HLL — the re-aggregable distinct sketch: the
    // per-group binary sketches are materialized state that can be
    // persisted, shipped, and merged (hll_union_agg) WITHOUT the raw
    // data, which is what a 100 TB rollup actually needs (the plain
    // approx_count_distinct estimate is a dead end — it can't be
    // re-aggregated upward). Output: per-flag estimates plus the merged
    // ALL row union'd from the group sketches, proving the two-level
    // merge. No oracle (sketch estimates are engine-specific); the
    // estimate-vs-exact error bound is asserted in RelationalSuite.
    "q_agg_hll_sketch" -> ((s, d) => {
      // materialized: the per-group branch and the union branch are two
      // consumers, and without this the fact scan + sketch build (the
      // expensive stage) runs once per branch
      val sk = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk"))
        .localCheckpoint()
      val per = sk.select(col("l_returnflag").as("flag"),
        expr("hll_sketch_estimate(sk)").as("est_orders"))
      val all = sk.agg(expr("hll_sketch_estimate(hll_union_agg(sk))")
          .as("est_orders"))
        .select(lit("ALL").as("flag"), col("est_orders"))
      per.unionByName(all).orderBy(col("flag").asc_nulls_first)
    }),

    // Count-min frequency sketch (built-in count_min_sketch aggregate,
    // Cormode-Muthukrishnan 2005): like the HLL row, the sketch is
    // mergeable partial state — bounded memory (d x w counters)
    // regardless of token cardinality, map-side partials merged by
    // elementwise add. Probing deserializes the ONE result row's sketch
    // against a fixed token set (a 6-row broadcast cross join; the udf
    // runs 6 times, never per-document). No oracle (byte layout and
    // estimates are engine constants); est >= exact and
    // est <= exact + eps*N at 99% confidence asserted in RelationalSuite.
    "q_agg_countmin" -> ((s, d) => {
      import s.implicits._
      val sk = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .agg(expr("count_min_sketch(token, 0.001d, 0.99d, 42)").as("sk"))
      val est = udf((bytes: Array[Byte], t: String) =>
        org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(bytes))
          .estimateCount(t))
      Seq("scan", "column", "window", "join", "sort", "nosuchtoken")
        .toDF("token")
        .crossJoin(broadcast(sk))
        .select(col("token"), est(col("sk"), col("token")).as("est_count"))
        .orderBy(col("token").asc_nulls_first)
    }),

    // Argmax via max_by (reference R15/R26: per-category argmax over the
    // header-score matrix, tables.py:190-202). Prices tie across parts, so
    // the ordering key is a fixed-width (price, name) string — totally
    // ordered and identical on the DuckDB side (plain numeric/struct
    // argmax would be tie-nondeterministic / unsupported there).
    "q_agg_argmax" -> ((s, d) => {
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(max_by(col("p_name"),
            concat(format_string("%09.4f", col("p_retailprice")),
              lit("|"), col("p_name"))).as("top_part"),
          graft.Det.r4(max(col("p_retailprice"))).as("top_price"))
        .orderBy(col("p_brand").asc_nulls_first)
    }),

    // Hierarchical subtotals.
    "q_agg_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(graft.Det.r4(sum(col("o_totalprice"))).as("total"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // All grouping combinations.
    "q_agg_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(graft.Det.r4(sum(col("o_totalprice"))).as("total"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // Explicit grouping sets (via SQL — the Dataset API has no direct
    // groupingSets until 4.0's groupingSets; SQL keeps it portable).
    "q_agg_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  floor((sum(o_totalprice)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS total, count(1) AS n
          |FROM graft_orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST,
          |  o_orderpriority ASC NULLS FIRST""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    // exactness is the claim: the bitmap plan must hash-match the
    // straightforward distinct
    "q_agg_bitmap" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_percent_of_total" ->
      """WITH per AS (
        |  SELECT c_nationkey, sum(o_totalprice) AS rev, count(1) AS n_orders
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_nationkey),
        |t AS (SELECT sum(rev) AS tot FROM per)
        |SELECT c_nationkey,
        |  floor((rev) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS revenue,
        |  n_orders,
        |  floor((rev / tot) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS share
        |FROM per CROSS JOIN t
        |ORDER BY c_nationkey ASC NULLS FIRST""".stripMargin,
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_quantity)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS sum_qty,
        |  floor((sum(l_extendedprice)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS sum_base_price,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS sum_disc_price,
        |  floor((avg(l_quantity)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS avg_qty,
        |  floor((avg(l_discount)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS avg_disc,
        |  count(1) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_agg_argmax" ->
      """SELECT p_brand,
        |  arg_max(p_name, printf('%09.4f', p_retailprice) || '|' || p_name)
        |    AS top_part,
        |  floor((max(p_retailprice)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS top_price
        |FROM part GROUP BY p_brand
        |ORDER BY p_brand ASC NULLS FIRST""".stripMargin,
    "q_agg_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  floor((sum(o_totalprice)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS total, count(1) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  floor((sum(o_totalprice)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS total, count(1) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  floor((sum(o_totalprice)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS total, count(1) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin
  )
}
