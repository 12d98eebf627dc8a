package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join surface. Strategy choices are made the Spark-first way: small
  * dimensions are `broadcast()` (no shuffle of the fact side), large-large
  * equi-joins go sort-merge on shuffled keys, and the reference's
  * existence/dedup probes (reference database.py:43-61 `check_if_exists`,
  * main.py:90 paper skip) become semi/anti joins that Catalyst turns into
  * hash-join early-outs — O(1) per probe instead of the reference's one
  * SELECT round-trip per row.
  *
  * At 100 TB: the broadcast side stays bounded (dims), the shuffled joins
  * partition on the join key, and AQE re-plans skew at runtime.
  */
object Joins {


  /** PassJoin (tau = 2) edit-distance self-join over a one-column
    * ("a") distinct-name frame — the candidate machinery behind
    * q_join_edit_distance, exposed so suites can drive it with crafted
    * vocabularies (short strings included).
    */
  private[graft] def editDistanceSelfJoin(names: DataFrame): DataFrame = {
    val tau = 2
    val idx = names
      .select(col("a"), explode(expr(
        """transform(sequence(0, 2), i -> named_struct(
          |'i', cast(i as int),
          |'seg', substring(a, cast(floor(i * length(a) / 3) as int) + 1,
          |  cast(floor((i + 1) * length(a) / 3)
          |    - floor(i * length(a) / 3) as int)),
          |'la', length(a)))""".stripMargin)).as("k"))
      .select(col("a"), col("k.i").as("i"), col("k.seg").as("seg"),
        col("k.la").as("la"))
    // EMPTY segments are kept deliberately: a string shorter than
    // tau+1=3 cannot fill 3 non-empty segments, and dropping its empty
    // ones would break the pigeonhole (2 edits CAN touch both remaining
    // segments -> true short-short pairs silently lost). An empty
    // segment occurs trivially in any probe, so it acts as the
    // degenerate candidate key — only strings shorter than 3 carry one,
    // so the key stays bounded by the short sub-vocabulary.
    val probe = names.select(col("a").as("b"))
      .select(col("b"), explode(expr(
        s"""flatten(flatten(
           |transform(sequence(length(b) - $tau, length(b) + $tau), L ->
           |  transform(sequence(0, 2), i ->
           |    filter(transform(
           |      sequence(cast(floor(i * L / 3) as int) - $tau,
           |               cast(floor(i * L / 3) as int) + $tau), p ->
           |      named_struct(
           |        'i', cast(i as int),
           |        'la', cast(L as int),
           |        'seg', IF(p >= 0 AND
           |          p + cast(floor((i + 1) * L / 3)
           |            - floor(i * L / 3) as int) <= length(b),
           |          substring(b, p + 1,
           |            cast(floor((i + 1) * L / 3)
           |              - floor(i * L / 3) as int)),
           |          cast(null as string)))),
           |      x -> x.seg IS NOT NULL)))))
           |""".stripMargin)).as("k"))
      .select(col("b"), col("k.i").as("i"), col("k.seg").as("seg"),
        col("k.la").as("la"))
    idx.join(probe, Seq("i", "seg", "la"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= tau)
      .orderBy(col("a").asc_nulls_first, col("b").asc_nulls_first)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Broadcast hash equi-join: fact × small dim, zero fact shuffle.
    "q_join_broadcast" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(graft.Det.r4(sum(col("l_extendedprice"))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand").asc_nulls_first)
    }),

    // Shuffled hash join (hint overrides the SMJ default).
    "q_join_shuffle_hash" -> ((s, d) => {
      val o = Tables.orders(s, d).hint("SHUFFLE_HASH")
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
          graft.Det.r4(col("o_totalprice")).as("price"))
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Sort-merge join: large × large on the shuffled key.
    "q_join_sort_merge" -> ((s, d) => {
      val li = Tables.lineitem(s, d).hint("MERGE")
      val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority"))
        .agg(graft.Det.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority").asc_nulls_first)
    }),

    // Left outer: customers with no orders keep a null extension.
    "q_join_left_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(graft.Det.r4(sum(col("o_totalprice"))).as("spend"),
          count(lit(1)).as("n_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("c_mktsegment"),
          col("spend"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("c_custkey").asc_nulls_first)
    }),

    // Existence semi-join (reference R21 check_if_exists as a set op).
    "q_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey").asc_nulls_first)
    }),

    // Dedup / not-exists anti-join (reference R3 paper-skip: only ingest
    // sources not already present — main.py:90-92).
    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey").asc_nulls_first)
    }),

    // Non-equi theta/range join (bounded sides -> broadcast nested loop).
    "q_join_theta_range" -> ((s, d) => {
      val sp = Tables.supplier(s, d)
      val c = Tables.customer(s, d)
      sp.join(broadcast(c),
          sp("s_nationkey") === c("c_nationkey") &&
          sp("s_acctbal") < c("c_acctbal"))
        .select(col("s_suppkey"), col("c_custkey"),
          graft.Det.r4(col("c_acctbal") - col("s_acctbal")).as("gap"))
        .orderBy(col("s_suppkey").asc_nulls_first,
          col("c_custkey").asc_nulls_first)
    }),

    // As-of join: latest order at-or-before each event's timestamp for the
    // matching user (generalizes reference R6's nearest-neighbor title
    // join, tables.py:28-49 — "closest preceding" instead of "closest
    // above"). Runs the scalable union+window AsOfJoin (one shuffle per
    // side, no range-join pair blowup); the DuckDB oracle states the
    // same semantics as range join + argmax, and AsOfJoinSuite proves
    // the two forms agree.
    "q_join_asof" -> ((s, d) => {
      AsOfJoin.asOf(Tables.events(s, d), Tables.orders(s, d),
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("o_orderkey", "o_orderdate"),
          rightTiebreak = "o_orderkey")
        .filter(col("o_orderkey").isNotNull)
        .select(col("event_id"), col("o_orderkey").as("last_orderkey"),
          col("o_orderdate").as("last_orderdate"))
        .orderBy(col("event_id").asc_nulls_first)
    }),

    // Forward as-of with a tolerance bound (pandas merge_asof parity):
    // each order's customer's NEXT order on a later day, within 365
    // days — repeat-purchase latency. Same sorted-pass plan as the
    // backward form, frame and tie order mirrored; probing from
    // `date + 1 day` makes the semantics strictly-later-day (and
    // excludes the row's self-match in the self as-of).
    "q_join_asof_forward" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val probe = o.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"))
        .withColumn("after", col("o_orderdate") + expr("INTERVAL 1 DAY"))
      val build = o.select(col("o_custkey").as("c2"),
        col("o_orderdate").as("n_date"), col("o_orderkey").as("n_key"))
      AsOfJoin.asOf(probe, build,
          leftKey = "o_custkey", rightKey = "c2",
          leftTime = "after", rightTime = "n_date",
          payload = Seq("n_key", "n_date"),
          rightTiebreak = "n_key", direction = "forward",
          tolerance = Some((l, r) => r <= l + expr("INTERVAL 364 DAYS")))
        .filter(col("n_key").isNotNull)
        .select(col("o_orderkey"), col("n_key").as("next_orderkey"),
          col("n_date").as("next_orderdate"))
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Nearest as-of (merge_asof direction=nearest): the lineitem whose
    // ship date is closest in time to its order's date — the synthetic
    // ship dates fall on BOTH sides of the order date, so both
    // directional carries are genuinely exercised.
    "q_join_asof_nearest" -> ((s, d) => {
      val probe = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"))
      val build = Tables.lineitem(s, d).select(col("l_orderkey").as("k2"),
        col("l_shipdate"), col("l_linenumber"))
      AsOfJoin.asOfNearest(probe, build,
          leftKey = "o_orderkey", rightKey = "k2",
          leftTime = "o_orderdate", rightTime = "l_shipdate",
          payload = Seq("l_linenumber", "l_shipdate"),
          rightTiebreak = "l_linenumber")
        .filter(col("l_linenumber").isNotNull)
        .select(col("o_orderkey"), col("l_linenumber").as("near_line"),
          col("l_shipdate").as("near_shipdate"))
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Bucketed (binned) interval join — the 100 TB form of an UNKEYED
    // point-in-interval join. The naive plan is a broadcast nested loop
    // (every point × every interval); instead each interval explodes
    // into every DAY bucket it can touch — to_date(w_start) through
    // to_date(w_end): a 7-day half-open window starting mid-day spans 8
    // calendar days, and the midnight-start case just yields one empty
    // bucket the residual filter drops. Each point maps to its one
    // bucket, turning the range predicate into an EQUI-join on the
    // bucket plus a residual range filter.
    // Work scales as sum-over-buckets(points_b × intervals_b) — the
    // true overlap density — instead of |points| × |intervals|, and the
    // shuffle partitions by bucket like any other key. A point's bucket
    // matches exactly one exploded row per covering interval, so no
    // pair-dedup is needed. PlanAuditSuite asserts no nested loop
    // survives in the physical plan.
    "q_join_range_bucketed" -> ((s, d) => {
      val windows = Tables.orders(s, d)
        .filter(col("o_totalprice") > 490000)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate").as("w_start"))
        .withColumn("w_end", col("w_start") + expr("INTERVAL 7 DAYS"))
      val points = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_shipdate"))
      ScalePatterns.dayBucketedIntervalJoin(points, "l_shipdate",
          windows, "w_start", "w_end")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("o_orderkey")).as("n_windows"),
          graft.Det.r4(sum(col("l_extendedprice"))).as("revenue"))
        .orderBy(col("o_orderpriority").asc_nulls_first)
    }),

    // Explicit skew-salted join (ScalePatterns.saltedJoin) on the
    // profiled hot key — l_suppkey, the subject of q_skew_profile: each
    // fact row gets a deterministic salt in [0,8) and the supplier side
    // is replicated 8×, so one pathological supplier's volume spreads
    // over 8 reducers instead of melting one. The MERGE hint keeps the
    // join a shuffle (at test scale the 8× dim would broadcast and mask
    // the salting); PlanAuditSuite asserts the SMJ keys on (key, salt).
    // The oracle states plain-join semantics — salting must be invisible
    // in the result.
    "q_join_skew_salted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        .hint("MERGE")
      ScalePatterns.saltedJoin(li, sup, "l_suppkey", saltFactor = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          graft.Det.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue"))
        .orderBy(col("s_nationkey").asc_nulls_first)
    }),

    // Bloom-pre-filtered shuffle join (runtime-filter pattern): the
    // selective dim (high-value orders) becomes a bloom filter probed by
    // a codegen'd `bloom_might_contain` on the fact side BEFORE the
    // shuffle — the exchanged lineitem volume drops to selectivity+fpp.
    // The MERGE hint keeps the join a shuffle (at test scale the dim
    // would broadcast and mask the pattern); the join restores exact
    // semantics, so the oracle states the plain join. expectedItems
    // stands in for the table-stats cardinality a 100 TB deployment
    // would use; ScalePatternsSuite asserts the pre-filter actually
    // drops the non-matching volume and that results equal the plain
    // join.
    "q_join_bloom" -> ((s, d) => {
      val dim = Tables.orders(s, d)
        .filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .hint("MERGE")
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      ScalePatterns.bloomPrefilterJoin(fact, "l_orderkey", dim, "o_orderkey",
          expectedItems = 1L << 16, fpp = 0.01)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          graft.Det.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue"))
        .orderBy(col("o_orderpriority").asc_nulls_first)
    }),

    // Edit-distance similarity self-join WITHOUT the cross product —
    // the PassJoin/Ed-Join pigeonhole (Li et al., ICDE'11; Xiao et al.):
    // if ed(a,b) <= 2, then splitting a into 3 contiguous segments, at
    // least one segment occurs EXACTLY in b at a position shifted by at
    // most 2 (2 edits cannot touch all 3 segments). Candidates are an
    // EQUI-join on (segment index, indexed length, segment text) between
    // a's 3 segments and b's ~75 exploded substrings (5 candidate
    // lengths x 3 segments x <=5 shifts), then the codegen'd
    // `levenshtein` verifies exactly — work scales with true near-pair
    // density, never |names|². The generalization of reference R15's
    // fuzzy matching from scoring to JOINING (tables.py:167-203).
    // The oracle states the naive quadratic semantics over the DISTINCT
    // name vocabulary; DedupSimilaritySuite asserts the candidate plan
    // has no cartesian/nested-loop and equals the naive pair set.
    "q_join_edit_distance" -> ((s, d) =>
      editDistanceSelfJoin(
        Tables.part(s, d).select(col("p_name").as("a")).distinct())),

    // Bounded cartesian product (reference R15's header × category score
    // matrix shape, tables.py:181-189).
    "q_join_cross" -> ((s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      r.crossJoin(n)
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"),
          col("n_name"))
        .orderBy(col("r_regionkey").asc_nulls_first,
          col("n_nationkey").asc_nulls_first)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_join_broadcast" ->
      """SELECT p_brand, floor((sum(l_extendedprice)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS revenue, count(1) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand ASC NULLS FIRST""".stripMargin,
    "q_join_shuffle_hash" ->
      """SELECT o_orderkey, c_name, c_mktsegment, floor((o_totalprice) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_sort_merge" ->
      """SELECT o_orderpriority,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS revenue,
        |  count(1) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_join_left_outer" ->
      """SELECT c_custkey, c_mktsegment, spend,
        |  coalesce(n_orders, 0) AS n_orders
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, floor((sum(o_totalprice)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS spend,
        |    count(1) AS n_orders
        |  FROM orders GROUP BY o_custkey) AS agg ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "q_join_theta_range" ->
      """SELECT s_suppkey, c_custkey, floor((c_acctbal - s_acctbal) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS gap
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
        |ORDER BY s_suppkey ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,
    "q_join_asof" ->
      """SELECT event_id,
        |  arg_max(o_orderkey,
        |    strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' ||
        |    lpad(CAST(o_orderkey AS VARCHAR), 20, '0')) AS last_orderkey,
        |  max(o_orderdate) AS last_orderdate
        |FROM events JOIN orders
        |  ON user_id = o_custkey AND o_orderdate <= ts
        |GROUP BY event_id ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    // forward pick = earliest date, max orderkey among equal dates: the
    // inverted zero-padded key makes arg_min's composite order (date
    // asc, orderkey desc)
    "q_join_asof_forward" ->
      """SELECT o1.o_orderkey,
        |  arg_min(o2.o_orderkey,
        |    strftime(o2.o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' ||
        |    lpad(CAST(1000000000000 - o2.o_orderkey AS VARCHAR), 20, '0'))
        |    AS next_orderkey,
        |  min(o2.o_orderdate) AS next_orderdate
        |FROM orders o1 JOIN orders o2
        |  ON o1.o_custkey = o2.o_custkey
        |    AND o2.o_orderdate >= o1.o_orderdate + INTERVAL 1 DAY
        |    AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 365 DAY
        |GROUP BY o1.o_orderkey ORDER BY o1.o_orderkey ASC NULLS FIRST""".stripMargin,
    // composite minimizes (|distance|, backward-first, max linenumber):
    // exactly asOfNearest's pick order
    "q_join_asof_nearest" ->
      """WITH j AS (
        |  SELECT o_orderkey, l_linenumber, l_shipdate,
        |    lpad(CAST(abs(CAST(epoch_us(l_shipdate) AS BIGINT)
        |        - CAST(epoch_us(o_orderdate) AS BIGINT)) AS VARCHAR), 20, '0')
        |      || (CASE WHEN l_shipdate <= o_orderdate THEN '0' ELSE '1' END)
        |      || lpad(CAST(100000000 - l_linenumber AS VARCHAR), 9, '0')
        |      AS rankkey
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT o_orderkey, arg_min(l_linenumber, rankkey) AS near_line,
        |  arg_min(l_shipdate, rankkey) AS near_shipdate
        |FROM j GROUP BY o_orderkey ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // the oracle states the SEMANTICS (plain range join) — the bucketed
    // plan must reproduce it exactly
    "q_join_range_bucketed" ->
      """SELECT o_orderpriority, count(1) AS n_pairs,
        |  count(DISTINCT o_orderkey) AS n_windows,
        |  floor((sum(l_extendedprice)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders
        |  ON o_totalprice > 490000
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 7 DAY
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    // plain-join semantics: the salt must be invisible in the result
    "q_join_skew_salted" ->
      """SELECT s_nationkey, count(1) AS n,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey ASC NULLS FIRST""".stripMargin,
    // naive quadratic semantics over the distinct vocabulary — the
    // pigeonhole candidate generation must be invisible in the result
    "q_join_edit_distance" ->
      """WITH names AS (SELECT DISTINCT p_name AS a FROM part)
        |SELECT x.a AS a, y.a AS b,
        |  CAST(levenshtein(x.a, y.a) AS INT) AS dist
        |FROM names x JOIN names y
        |  ON x.a < y.a AND levenshtein(x.a, y.a) <= 2
        |ORDER BY a ASC NULLS FIRST, b ASC NULLS FIRST""".stripMargin,
    // plain-join semantics: the bloom pre-filter must be invisible
    "q_join_bloom" ->
      """SELECT o_orderpriority, count(1) AS n,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 450000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey ASC NULLS FIRST, n_nationkey ASC NULLS FIRST""".stripMargin
  )
}
