package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining relational-surface operators a user of a general engine
  * reaches for weekly: unpivot/melt, ntile bucketing, positional
  * explode, deterministic mode + exact median, regexp extract-all, and
  * date-spine gap filling. All declarative `functions._` plans —
  * Catalyst prunes/pushes and codegens every one of them; scale notes
  * per query where the shape has a 100 TB caveat.
  */
object SqlSurface {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Unpivot/melt: wide per-measure aggregate -> long (measure, total)
    // form — the inverse of q_pivot_priority. Aggregates first (25 rows),
    // so the melt is a driver-size reshape of an already-reduced frame;
    // at 100 TB the only heavy stage is the partial-agg groupBy.
    "q_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(Det.r4(avg(col("l_quantity"))).as("quantity"),
          Det.r4(avg(col("l_extendedprice"))).as("extendedprice"),
          Det.r4(avg(col("l_discount"))).as("discount"),
          Det.r4(avg(col("l_tax"))).as("tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("quantity"), col("extendedprice"), col("discount"),
            col("tax")),
          "measure", "avg_value")
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("measure").asc_nulls_first)
    }),

    // ntile quartiles over account balance. A global ntile is a total
    // order by construction (single-task sort at scale) — acceptable for
    // cardinalities like "customers"; for 100 TB facts use
    // approxQuantile cut-points + a broadcast range join instead.
    "q_window_ntile" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("tile", ntile(4).over(
          Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n_cust"),
          Det.r4(min(col("c_acctbal"))).as("lo"),
          Det.r4(max(col("c_acctbal"))).as("hi"))
        .orderBy(col("tile").asc_nulls_first)
    }),

    // The 100 TB bucketing q_window_ntile's scaladoc promises: exact
    // quartile CUT-POINTS from one scalar aggregate, broadcast back, and
    // a when-chain assigns buckets map-side — no global sort, no
    // single-task window, works at any fact size. (Buckets are
    // value-boundary quartiles: ties land in one bucket, so counts can
    // differ from ntile's forced-equal split — semantics stated by the
    // oracle.)
    "q_range_bucket" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val cuts = c.agg(expr(
        "percentile(c_acctbal, array(0.25D, 0.5D, 0.75D))").as("q"))
      c.crossJoin(broadcast(cuts))
        .withColumn("bucket",
          when(col("c_acctbal") <= col("q")(0), 1)
            .when(col("c_acctbal") <= col("q")(1), 2)
            .when(col("c_acctbal") <= col("q")(2), 3)
            .otherwise(4))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_cust"),
          Det.r4(min(col("c_acctbal"))).as("lo"),
          Det.r4(max(col("c_acctbal"))).as("hi"))
        .orderBy(col("bucket").asc_nulls_first)
    }),

    // Positional explode (lateral with ordinality): token + 0-based
    // position. Output bounded to doc_id < 50; map-only explode scan.
    "q_posexplode" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .orderBy(col("doc_id").asc_nulls_first, col("pos").asc_nulls_first)
    }),

    // Deterministic mode (count + explicit tie-break on the value — the
    // builtin `mode()` is tie-nondeterministic) + exact interpolated
    // median per segment. Mode = two-level aggregation: the first
    // groupBy is partial-agg'd map-side, so a hot segment never
    // concentrates raw rows.
    "q_agg_mode_median" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val mode = c.groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("c_mktsegment"))
            .orderBy(col("cnt").desc, col("c_nationkey").asc)))
        .filter(col("rn") === 1)
        .select(col("c_mktsegment"), col("c_nationkey").as("mode_nation"))
      c.groupBy(col("c_mktsegment"))
        .agg(Det.r4(expr("percentile(c_acctbal, 0.5)")).as("median_acctbal"),
          count(lit(1)).as("n_cust"))
        .join(mode, Seq("c_mktsegment"))
        .orderBy(col("c_mktsegment").asc_nulls_first)
    }),

    // regexp_extract_all: all digit runs in the JSON props payload,
    // re-joined to a scalar so downstream harnesses see no arrays.
    "q_regexp_extract_all" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          array_join(expr("regexp_extract_all(props, '[0-9]+', 0)"), ";")
            .as("nums"))
        .orderBy(col("event_id").asc_nulls_first)
    }),

    // Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL keep duplicate
    // multiplicity (the distinct forms are q_set_except/intersect).
    // Spark plans both as aggregated counts + generate — no sort.
    "q_set_except_all" -> ((s, d) => {
      val a = Tables.lineitem(s, d).select(col("l_suppkey"), col("l_returnflag"))
      val b = Tables.lineitem(s, d).filter(col("l_linenumber") <= 2)
        .select(col("l_suppkey"), col("l_returnflag"))
      a.exceptAll(b)
        .groupBy(col("l_suppkey"), col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_suppkey").asc_nulls_first,
          col("l_returnflag").asc_nulls_first)
    }),
    "q_set_intersect_all" -> ((s, d) => {
      val a = Tables.lineitem(s, d).select(col("l_suppkey"), col("l_returnflag"))
      val b = Tables.lineitem(s, d).filter(col("l_linenumber") >= 2)
        .select(col("l_suppkey"), col("l_returnflag"))
      a.intersectAll(b)
        .groupBy(col("l_suppkey"), col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_suppkey").asc_nulls_first,
          col("l_returnflag").asc_nulls_first)
    }),

    // Null semantics: null-safe equality (<=>), nullif/nvl round-trips,
    // and null-aware counting — the comparisons that silently drop rows
    // when written with bare `=`.
    "q_null_semantics" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("maybe", nullif(col("o_orderstatus"), lit("F")))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("maybe")).as("n_nonnull"),
          count(when(col("maybe") <=> lit(null), lit(1))).as("n_null_safe_eq"),
          count(when(col("maybe") <=> col("o_orderstatus"), lit(1)))
            .as("n_unchanged"))
        .orderBy(col("o_orderpriority").asc_nulls_first)
    }),

    // Conditional aggregation (FILTER-clause form): per-flag measures in
    // one pass instead of one scan per condition.
    "q_conditional_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          expr("count_if(l_quantity > 25)").as("n_bulk"),
          Det.r4(expr("avg(l_extendedprice) FILTER (WHERE l_discount > 0.05)"))
            .as("avg_discounted"),
          expr("count_if(l_returnflag = 'R')").as("n_returned"))
        .orderBy(col("l_linestatus").asc_nulls_first)
    }),

    // Decimal-typed aggregation: exact fixed-point sums (no float
    // drift), surfaced as doubles only at the boundary for the
    // cross-engine comparison.
    "q_decimal_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("dec_price", col("l_extendedprice").cast("decimal(18,4)"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("dec_price")).cast("double").as("exact_sum"),
          count(lit(1)).as("n"))
        .withColumn("exact_sum", Det.r4(col("exact_sum")))
        .orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // Null-preserving explode (explode_outer): rows with an empty array
    // survive as a single null row instead of vanishing — the lateral
    // semantics that keep "documents with zero matches" visible to
    // downstream aggregation. Oracle emulates via LEFT JOIN LATERAL.
    "q_explode_outer" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("longs",
          expr("filter(split(text, ' '), t -> length(t) > 6)"))
        .select(col("doc_id"), explode_outer(col("longs")).as("long_tok"))
        .orderBy(col("doc_id").asc_nulls_first,
          col("long_tok").asc_nulls_first)
    }),

    // Boolean aggregates: every/some (bool_and/bool_or) per group — the
    // "all rows satisfy / any row satisfies" invariant checks data-
    // quality gates are written with.
    "q_agg_bool" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("every(o_totalprice > 0)").as("all_positive"),
          expr("some(o_orderstatus = 'F')").as("any_finished"),
          expr("every(o_orderdate >= TIMESTAMP '1995-01-01')").as("all_in_era"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority").asc_nulls_first)
    }),

    // Multiple exact COUNT(DISTINCT ...) in one aggregation: Catalyst
    // rewrites this through an Expand node (one duplicate of each row
    // per distinct-column group) — a distinct plan shape from the
    // single-distinct queries, and the one that surprises users with a
    // 3x shuffle volume. Scale note: for wide dashboards prefer one
    // approx_count_distinct per column (no Expand).
    "q_multi_count_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("d_parts"),
          countDistinct(col("l_suppkey")).as("d_supps"),
          countDistinct(col("l_orderkey")).as("d_orders"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // Pure-SQL recursive CTE (Spark 4.x WITH RECURSIVE): walk each
    // user's first four events in time order, accumulating the path —
    // linked-list traversal the optimizer cannot unroll statically.
    // Identical SQL runs on the DuckDB side, so the recursion semantics
    // themselves are oracle-gated. Recursion depth is bounded by the
    // rn <= 4 predicate, not engine limits.
    "q_sql_recursive" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("v_events")
      s.sql("""
        WITH RECURSIVE seq AS (
          SELECT user_id, event_type,
            row_number() OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC) AS rn
          FROM v_events),
        walk AS (
          SELECT user_id, rn, CAST(event_type AS STRING) AS path
          FROM seq WHERE rn = 1
          UNION ALL
          SELECT s.user_id, s.rn, w.path || '>' || s.event_type
          FROM walk w JOIN seq s
            ON s.user_id = w.user_id AND s.rn = w.rn + 1
          WHERE s.rn <= 4)
        SELECT user_id, max(rn) AS depth, max_by(path, rn) AS path
        FROM walk GROUP BY user_id
        ORDER BY user_id ASC NULLS FIRST""")
    }),

    // Pure-SQL entry point: LATERAL correlated subquery (top order per
    // customer) through spark.sql over registered views — the same
    // Catalyst plan surface the DataFrame queries use, exercised the way
    // a SQL-first user would drive the engine. Catalyst decorrelates the
    // lateral into a ranked join, not a per-row re-execution.
    "q_sql_lateral" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT c.c_custkey, c.c_mktsegment,
               t.o_orderkey AS top_order, t.o_totalprice AS top_price
        FROM v_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM v_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
        ) t
        ORDER BY c.c_custkey ASC NULLS FIRST""")
        .withColumn("top_price", Det.r4(col("top_price")))
    }),

    // Spark 4 SQL pipe syntax (`|>`): the linear FROM -> WHERE ->
    // AGGREGATE -> ORDER BY dataflow form, parsed by the same Catalyst
    // front end into the same optimized plan as the classic query —
    // exercised because a SQL-first user of a 4.x engine will reach for
    // it. The oracle states the identical classic-SQL semantics.
    "q_sql_pipe" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        FROM v_lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
        |> AGGREGATE
             floor(sum(l_quantity) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS sum_qty,
             floor(avg(l_discount) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS avg_disc,
             count(*) AS n
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }),

    // Correlated aggregate subquery (TPC-H Q17 shape): lineitems below
    // half their part's average quantity. Catalyst DECORRELATES the
    // per-row subquery into one aggregate-over-lineitem + an equi-join
    // (RewriteCorrelatedScalarSubquery) — per-row re-execution, the
    // naive reading, never happens; the plan is two shuffles on
    // l_partkey. l_quantity is integral, so avg = exact-sum/count is
    // bit-identical across engines and the `<` boundary cannot flip.
    "q_correlated_agg" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      Tables.part(s, d).createOrReplaceTempView("v_part")
      s.sql("""
        SELECT p_brand, count(*) AS n_small,
          floor(sum(l_extendedprice) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS revenue
        FROM v_lineitem l1 JOIN v_part p ON p.p_partkey = l1.l_partkey
        WHERE l1.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM v_lineitem l2
          WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY p_brand
        ORDER BY p_brand ASC NULLS FIRST""")
    }),

    // TPC-H Q18 shape: IN over an aggregated-HAVING subquery. Catalyst
    // rewrites the IN into a semi-join against the aggregate — the
    // subquery runs ONCE as a grouped aggregation, never per probe row.
    "q_having_in" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT c_custkey, c_name, o_orderkey,
          floor(o_totalprice * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS price
        FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM v_lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 160)
        ORDER BY o_orderkey ASC NULLS FIRST""")
    }),

    // TPC-H Q21 shape: one EXISTS + one NOT EXISTS against the same
    // fact, both correlated — suppliers whose shipment was strictly the
    // latest in a multi-supplier order. Catalyst decorrelates the pair
    // into a semi-join plus an anti-join on l_orderkey; the fact table
    // is NOT re-scanned per row.
    "q_multi_exists" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l1.l_suppkey, count(*) AS n_led
        FROM v_lineitem l1
        WHERE EXISTS (
            SELECT 1 FROM v_lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM v_lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY l1.l_suppkey
        ORDER BY l1.l_suppkey ASC NULLS FIRST""")
    }),

    // Null-aware NOT IN: a NULL probe value is neither in nor not-in
    // the set, so those rows vanish — three-valued logic the rewrite to
    // a plain anti-join would get WRONG. Customers with negative
    // balances get a NULL probe and drop out; Spark plans the
    // null-aware anti-join variant. Subquery-side nulls would empty the
    // whole result (correctly) — kept non-null here so the query stays
    // non-degenerate.
    "q_null_aware_anti" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT c_custkey, c_name FROM v_customer
        WHERE (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END)
          NOT IN (SELECT o_custkey FROM v_orders WHERE o_totalprice > 400000)
        ORDER BY c_custkey ASC NULLS FIRST""")
    }),

    // Date-spine gap fill: generate every day between min and max order
    // date, left-join daily counts, zero-fill gaps. The spine explodes
    // from a 1-row aggregate (bounded by calendar span, not data volume)
    // and broadcast-joins the aggregated counts.
    "q_date_spine" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("day", to_date(col("o_orderdate")))
      val spine = o.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val cnt = o.groupBy(col("day")).agg(count(lit(1)).as("cnt"))
      spine.join(cnt, Seq("day"), "left_outer")
        // emit the day as a yyyy-MM-dd string: pandas-side DATE handling
        // differs between engines in the comparison harness
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("cnt"), lit(0L)).as("n_orders"))
        .orderBy(col("day").asc_nulls_first)
    })
  )

  private val r4open = "floor(("
  private def r4close(alias: String) =
    s") * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS $alias"

  val oracle: Map[String, String] = Map(
    "q_unpivot" ->
      s"""WITH a AS (
         |  SELECT l_returnflag,
         |    ${r4open}avg(l_quantity)${r4close("quantity")},
         |    ${r4open}avg(l_extendedprice)${r4close("extendedprice")},
         |    ${r4open}avg(l_discount)${r4close("discount")},
         |    ${r4open}avg(l_tax)${r4close("tax")}
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, measure, avg_value FROM a
         |UNPIVOT (avg_value FOR measure IN (quantity, extendedprice, discount, tax))
         |ORDER BY l_returnflag ASC NULLS FIRST, measure ASC NULLS FIRST""".stripMargin,
    "q_window_ntile" ->
      s"""WITH t AS (
         |  SELECT c_acctbal,
         |    ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS tile
         |  FROM customer)
         |SELECT tile, count(1) AS n_cust,
         |  ${r4open}min(c_acctbal)${r4close("lo")},
         |  ${r4open}max(c_acctbal)${r4close("hi")}
         |FROM t GROUP BY tile ORDER BY tile ASC NULLS FIRST""".stripMargin,
    "q_posexplode" ->
      """SELECT doc_id,
        |  CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
        |  unnest(string_split(text, ' ')) AS token
        |FROM documents WHERE doc_id < 50
        |ORDER BY doc_id ASC NULLS FIRST, pos ASC NULLS FIRST""".stripMargin,
    "q_agg_mode_median" ->
      s"""WITH m AS (
         |  SELECT c_mktsegment, c_nationkey,
         |    row_number() OVER (PARTITION BY c_mktsegment
         |      ORDER BY count(1) DESC, c_nationkey ASC) AS rn
         |  FROM customer GROUP BY c_mktsegment, c_nationkey),
         |a AS (
         |  SELECT c_mktsegment,
         |    ${r4open}median(c_acctbal)${r4close("median_acctbal")},
         |    count(1) AS n_cust
         |  FROM customer GROUP BY c_mktsegment)
         |SELECT a.c_mktsegment, a.median_acctbal, a.n_cust,
         |  m.c_nationkey AS mode_nation
         |FROM a JOIN m ON a.c_mktsegment = m.c_mktsegment AND m.rn = 1
         |ORDER BY a.c_mktsegment ASC NULLS FIRST""".stripMargin,
    "q_regexp_extract_all" ->
      """SELECT event_id, event_type,
        |  array_to_string(regexp_extract_all(props, '[0-9]+'), ';') AS nums
        |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_set_except_all" ->
      """WITH a AS (SELECT l_suppkey, l_returnflag FROM lineitem),
        |b AS (SELECT l_suppkey, l_returnflag FROM lineitem
        |      WHERE l_linenumber <= 2),
        |x AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |SELECT l_suppkey, l_returnflag, count(1) AS n FROM x
        |GROUP BY l_suppkey, l_returnflag
        |ORDER BY l_suppkey ASC NULLS FIRST,
        |  l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_set_intersect_all" ->
      """WITH a AS (SELECT l_suppkey, l_returnflag FROM lineitem),
        |b AS (SELECT l_suppkey, l_returnflag FROM lineitem
        |      WHERE l_linenumber >= 2),
        |x AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |SELECT l_suppkey, l_returnflag, count(1) AS n FROM x
        |GROUP BY l_suppkey, l_returnflag
        |ORDER BY l_suppkey ASC NULLS FIRST,
        |  l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_null_semantics" ->
      """WITH t AS (
        |  SELECT o_orderpriority, o_orderstatus,
        |    nullif(o_orderstatus, 'F') AS maybe
        |  FROM orders)
        |SELECT o_orderpriority,
        |  count(1) AS n_rows,
        |  count(maybe) AS n_nonnull,
        |  count(CASE WHEN maybe IS NOT DISTINCT FROM NULL THEN 1 END)
        |    AS n_null_safe_eq,
        |  count(CASE WHEN maybe IS NOT DISTINCT FROM o_orderstatus THEN 1 END)
        |    AS n_unchanged
        |FROM t GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_conditional_agg" ->
      s"""SELECT l_linestatus,
         |  count(1) FILTER (WHERE l_quantity > 25) AS n_bulk,
         |  ${r4open}avg(l_extendedprice) FILTER (WHERE l_discount > 0.05)${r4close("avg_discounted")},
         |  count(1) FILTER (WHERE l_returnflag = 'R') AS n_returned
         |FROM lineitem GROUP BY l_linestatus
         |ORDER BY l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_decimal_agg" ->
      s"""SELECT l_returnflag,
         |  ${r4open}CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)${r4close("exact_sum")},
         |  count(1) AS n
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_explode_outer" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> length(x) > 6) AS longs
        |  FROM documents)
        |SELECT t.doc_id, u.long_tok
        |FROM t LEFT JOIN LATERAL (SELECT unnest(t.longs) AS long_tok) u
        |  ON TRUE
        |ORDER BY doc_id ASC NULLS FIRST, long_tok ASC NULLS FIRST""".stripMargin,
    "q_agg_bool" ->
      """SELECT o_orderpriority,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_or(o_orderstatus = 'F') AS any_finished,
        |  bool_and(o_orderdate >= TIMESTAMP '1995-01-01') AS all_in_era,
        |  count(1) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_multi_count_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS d_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS d_supps,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS d_orders,
        |  count(1) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_sql_recursive" ->
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events),
        |walk AS (
        |  SELECT user_id, rn, CAST(event_type AS VARCHAR) AS path
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn, w.path || '>' || s.event_type
        |  FROM walk w JOIN seq s
        |    ON s.user_id = w.user_id AND s.rn = w.rn + 1
        |  WHERE s.rn <= 4)
        |SELECT user_id, max(rn) AS depth, arg_max(path, rn) AS path
        |FROM walk GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "q_sql_lateral" ->
      s"""SELECT c.c_custkey, c.c_mktsegment,
         |  t.o_orderkey AS top_order,
         |  ${r4open}t.o_totalprice${r4close("top_price")}
         |FROM customer c,
         |LATERAL (
         |  SELECT o_orderkey, o_totalprice FROM orders o
         |  WHERE o.o_custkey = c.c_custkey
         |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
         |) t
         |ORDER BY c.c_custkey ASC NULLS FIRST""".stripMargin,
    "q_date_spine" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day FROM orders),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM o),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |    AS day FROM b),
        |cnt AS (SELECT day, count(1) AS cnt FROM o GROUP BY day)
        |SELECT strftime(spine.day, '%Y-%m-%d') AS day,
        |  coalesce(cnt.cnt, 0) AS n_orders
        |FROM spine LEFT JOIN cnt ON spine.day = cnt.day
        |ORDER BY day ASC NULLS FIRST""".stripMargin,
    // classic-SQL statement of the pipe query's semantics
    "q_sql_pipe" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor(sum(l_quantity) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS sum_qty,
        |  floor(avg(l_discount) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS avg_disc,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    // quantile_cont interpolates a + g*(b-a) exactly like Spark's
    // percentile; a cut can only equal a data value when g = 0, so the
    // <= boundaries cannot flip between engines
    "q_range_bucket" ->
      """WITH cuts AS (
        |  SELECT quantile_cont(c_acctbal, [0.25, 0.5, 0.75]) AS q
        |  FROM customer)
        |SELECT CASE WHEN c_acctbal <= q[1] THEN 1
        |    WHEN c_acctbal <= q[2] THEN 2
        |    WHEN c_acctbal <= q[3] THEN 3 ELSE 4 END AS bucket,
        |  count(1) AS n_cust,
        |  floor((min(c_acctbal)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS lo,
        |  floor((max(c_acctbal)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS hi
        |FROM customer CROSS JOIN cuts
        |GROUP BY 1
        |ORDER BY bucket ASC NULLS FIRST""".stripMargin,
    "q_correlated_agg" ->
      """SELECT p_brand, count(*) AS n_small,
        |  floor(sum(l_extendedprice) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS revenue
        |FROM lineitem l1 JOIN part p ON p.p_partkey = l1.l_partkey
        |WHERE l1.l_quantity < (
        |  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand ASC NULLS FIRST""".stripMargin,
    "q_having_in" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  floor(o_totalprice * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 160)
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_multi_exists" ->
      """SELECT l1.l_suppkey, count(*) AS n_led
        |FROM lineitem l1
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY l1.l_suppkey
        |ORDER BY l1.l_suppkey ASC NULLS FIRST""".stripMargin,
    "q_null_aware_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END)
        |  NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin
  )
}
