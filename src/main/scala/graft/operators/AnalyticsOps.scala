package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event/corpus analytics: funnel conversion, cohort retention, value
  * histograms, and per-group quota sampling. These are the shapes a
  * product-analytics or training-mix pipeline runs daily; each is a
  * one-or-two-shuffle declarative plan whose output is bounded by
  * groups (users/weeks/bins), not input rows.
  */
object AnalyticsOps {

  /** Per-order distinct part sets — ONE shuffle (by order) feeds both
    * pair expansion and marginals as map-side explodes. Persisted LAZILY
    * (not localCheckpoint: that runs a job at query CONSTRUCTION and its
    * blocks don't survive executor loss — MEMORY_AND_DISK recomputes
    * from lineage instead) so every consumer after the first action
    * reads the cached sets. Shared by q_basket_pairs and
    * q_graph_pagerank so the edge definition cannot drift between them.
    * The cache is SESSION-LIFETIME by intent: its consumers are
    * independent driver queries with no shared "after the action" point
    * to unpersist at, Spark's CacheManager dedupes the repeated persist
    * to one entry per sfDir, and MEMORY_AND_DISK evicts to disk under
    * pressure rather than competing destructively with later queries.
    * (Bench REPS note: reps >= 2 of the two consumers time cache-warmed
    * reads — documented at the REPS parse in Bench.)
    */
  private[operators] def orderPartSets(s: SparkSession, d: String): DataFrame = {
    val sets = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Fill the cache NOW, with one cheap pass, before any consumer plan
    // fans out: the consumers' shuffle stages and broadcast subtrees
    // materialize CONCURRENTLY (AQE submits independent stages in
    // parallel), and a still-empty cache makes each of them recompute
    // the full mining lineage — measured 5-6x the mining CPU on
    // q_graph_triangles before this fill. Once filled, every consumer
    // (this query's and later queries' — the CacheManager dedupes the
    // plan) reads cached partitions, and the count here is
    // partition-count work. Lazy-persist fault semantics are kept:
    // lost blocks recompute from lineage.
    sets.count()
    sets
  }

  /** Co-purchase pairs (p1 < p2, support >= minSupport) over the sets. */
  private[operators] def coPurchasePairs(sets: DataFrame,
      minSupport: Int): DataFrame =
    sets
      .select(explode(col("ps")).as("p1"), col("ps"))
      .select(col("p1"), explode(col("ps")).as("p2"))
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)

  /** Triangle enumeration with DEGREE orientation (the standard
    * bounded-arboricity formulation): each undirected edge (given once
    * as p1 < p2) is re-oriented from its lower-(degree, id) endpoint to
    * the higher, so a vertex's out-neighborhood — and therefore its
    * wedge fanout C(out-deg, 2) — is bounded by the graph's arboricity
    * rather than its hub degree. Id-orientation puts every one of a
    * d-degree hub's wedges on one key (d² rows from one task at 100×
    * scale); degree orientation gives the hub out-degree ~0 and spreads
    * its wedges across its neighbors. The wedge join (on the source)
    * and the closing-edge join (on the wedge tips) stay keyed
    * equi-joins, and each triangle {x<y<z in orientation order} is
    * found exactly once — as the wedge at x closed by the oriented
    * edge y→z. Output rows are the id-sorted (a, b, c), identical to
    * an id-oriented enumeration (orientation is invisible in the
    * result). The degree frame is vertex-sized: broadcast here; at a
    * scale where vertices outgrow a broadcast, the same joins shuffle
    * on their keys.
    */
  private[graft] def degreeOrientedTriangles(edges0: DataFrame): DataFrame = {
    // the mined edge set feeds FIVE scans (two for degrees, the two
    // wedge legs and the closing join) — persisted LAZILY so the
    // upstream mining runs once per action instead of per scan
    // (recomputable from lineage; the CacheManager dedupes repeated
    // calls on the same input by plan equality)
    val edges = edges0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fill before fan-out: the two degree broadcasts and the three
    // join legs below otherwise race to materialize the un-filled
    // cache concurrently, each recomputing the pair mining (same fix
    // and measurement as orderPartSets above)
    edges.count()
    val deg = edges.select(col("p1").as("v"))
      .unionAll(edges.select(col("p2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val fwd = col("d1") < col("d2") ||
      (col("d1") === col("d2") && col("p1") < col("p2"))
    val e = edges
      .join(broadcast(deg.select(col("v").as("p1"), col("deg").as("d1"))),
        Seq("p1"))
      .join(broadcast(deg.select(col("v").as("p2"), col("deg").as("d2"))),
        Seq("p2"))
      .select(
        when(fwd, col("p1")).otherwise(col("p2")).as("src"),
        when(fwd, col("p2")).otherwise(col("p1")).as("dst"),
        when(fwd, col("d2")).otherwise(col("d1")).as("ddst"))
    val w1 = e.select(col("src").as("u"), col("dst").as("v"),
      col("ddst").as("dv"))
    val w2 = e.select(col("src").as("u"), col("dst").as("w"),
      col("ddst").as("dw"))
    val wedges = w1.join(w2, Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    wedges.join(e.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
      .select(array_sort(array(col("u"), col("v"), col("w"))).as("t"))
      .select(col("t").getItem(0).as("a"), col("t").getItem(1).as("b"),
        col("t").getItem(2).as("c"))
      .orderBy(col("a").asc_nulls_first, col("b").asc_nulls_first,
        col("c").asc_nulls_first)
  }

  /** The same edge mining as SQL CTEs (li + pairs), shared by both
    * oracles — interpolate after WITH [RECURSIVE].
    */
  private[operators] val coPurchaseCte: String =
    """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(1) AS support
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(1) >= 2)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Funnel: per user, first signup -> first purchase strictly after
    // it; conversion flag + hours-to-convert. Two keyed aggregations +
    // one join on user_id — co-partitioned, no data explosion.
    "q_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
      val su = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
      val pu = e.filter(col("event_type") === "purchase")
        .join(su, Seq("user_id"))
        .filter(col("ts") > col("signup_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
      su.join(pu, Seq("user_id"), "left_outer")
        .select(col("user_id"), col("signup_ts"), col("purchase_ts"),
          col("purchase_ts").isNotNull.as("converted"),
          Det.r4((unix_micros(col("purchase_ts")) -
            unix_micros(col("signup_ts"))) / lit(3600e6)).as("hours_to_convert"))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    // Three-stage ordered funnel: signup -> first view strictly after it
    // -> first purchase strictly after THAT (each stage gates on the
    // previous stage's timestamp, not just the event kinds). Same
    // keyed-aggregation chain as q_funnel, one more hop; every join is
    // on user_id, so the three stages co-partition on one key.
    "q_funnel_stages" -> ((s, d) => {
      val e = Tables.events(s, d)
      val su = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
      val vu = e.filter(col("event_type") === "view")
        .join(su, Seq("user_id"))
        .filter(col("ts") > col("signup_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
      val pu = e.filter(col("event_type") === "purchase")
        .join(vu, Seq("user_id"))
        .filter(col("ts") > col("view_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
      su.join(vu, Seq("user_id"), "left_outer")
        .join(pu, Seq("user_id"), "left_outer")
        .select(col("user_id"), col("signup_ts"), col("view_ts"),
          col("purchase_ts"),
          (lit(1) + col("view_ts").isNotNull.cast("int") +
            col("purchase_ts").isNotNull.cast("int")).as("stages"))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    // Cohort retention: users grouped by first-activity week, counted in
    // each later activity week (offset in whole weeks). Output is
    // |cohorts| x |offsets|.
    "q_cohort_retention" -> ((s, d) => {
      val e = Tables.events(s, d)
      val first = e.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val act = e.select(col("user_id"),
        date_trunc("week", col("ts")).as("act_week")).distinct()
      act.join(first, Seq("user_id"))
        .withColumn("week_offset",
          floor(datediff(col("act_week"), col("cohort_week")) / 7)
            .cast("int"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week").asc_nulls_first,
          col("week_offset").asc_nulls_first)
    }),

    // Session feature extraction: lag-gap sessionization (10-minute
    // inactivity closes a session) then per-session behavioral features
    // — the event-stream counterpart of per-document quality features.
    // Two window passes + one aggregation, all keyed by user.
    "q_session_features" -> ((s, d) => {
      val byT = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("new_sess",
          when(unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(byT)) > 600L * 1000000L, 1)
            .otherwise(when(lag(col("ts"), 1).over(byT).isNull, 1).otherwise(0)))
        .withColumn("sess_id", sum(col("new_sess")).over(byT))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(
          min(col("ts")).as("sess_start"),
          expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000")
            .as("duration_sec"),
          count(lit(1)).as("n_events"),
          expr("count_if(event_type = 'purchase')").as("n_purchases"),
          Det.r4(sum(coalesce(col("value"), lit(0.0)))).as("total_value"))
        .orderBy(col("user_id").asc_nulls_first, col("sess_id").asc_nulls_first)
    }),

    // Forward fill (LOCF): carry the last observed value over nulls per
    // key in event-time order — the gap-filling semantic sensor/metric
    // pipelines need. Nulls are planted deterministically (every 5th
    // event loses its value); `last(_, ignoreNulls)` over an unbounded-
    // preceding frame is a single window pass per key.
    "q_window_fill" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("gappy",
          when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")))
        .withColumn("filled",
          Det.r4(last(col("gappy"), ignoreNulls = true).over(w)))
        .select(col("event_id"), col("user_id"),
          Det.r4(col("gappy")).as("gappy"), col("filled"))
        .orderBy(col("event_id").asc_nulls_first)
    }),

    // Fixed-width histogram of order totals: bin = floor(x / 25000).
    // Single partial-agg'd groupBy; bins bounded by the value domain.
    "q_histogram" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("bin",
          floor(col("o_totalprice") / 25000.0).cast("bigint"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          Det.r4(min(col("o_totalprice"))).as("lo"),
          Det.r4(max(col("o_totalprice"))).as("hi"))
        .orderBy(col("bin").asc_nulls_first)
    }),

    // Interval join: purchases within 24h after a signup, per user — the
    // batch form of the stream-stream interval join (StreamingSuite runs
    // the watermarked streaming form). The user_id equi-key keeps this a
    // hash join; the time bounds are a post-join range filter, never a
    // cartesian blowup.
    "q_interval_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val su = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("s_ts"))
      val pu = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value"))
      su.join(pu, Seq("user_id"))
        .filter(col("p_ts") > col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOURS"))
        .select(col("user_id"), col("s_ts"), col("p_ts"),
          Det.r4(col("value")).as("value"))
        .orderBy(col("user_id").asc_nulls_first, col("s_ts").asc_nulls_first,
          col("p_ts").asc_nulls_first)
    }),

    // Event-transition matrix (first-order markov counts): next event
    // per user by time, with per-from-state transition probability.
    // One window pass + one aggregation; ties on ts break by event_id
    // so the sequence is total-ordered.
    "q_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val wf = Window.partitionBy(col("event_type"))
      Tables.events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prob",
          Det.r4(col("n") / sum(col("n")).over(wf)))
        .orderBy(col("event_type").asc_nulls_first,
          col("next_type").asc_nulls_first)
    }),

    // Top-5 word bigrams per language: lead-window bigram construction
    // (the codegen-friendly shingle pattern), counted per lang, ranked
    // with a total-order tie-break.
    "q_text_bigrams" -> ((s, d) => {
      val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val rk = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("bigram").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w0")))
        .withColumn("w1", lead(col("w0"), 1).over(byPos))
        .filter(col("w1").isNotNull)
        .select(col("lang"), concat_ws(" ", col("w0"), col("w1")).as("bigram"))
        .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(rk))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("bigram"), col("n"), col("rk"))
        .orderBy(col("lang").asc_nulls_first, col("rk").asc_nulls_first)
    }),

    // Per-group quota sampling: keep at most 30 docs per language,
    // chosen by portable md5 order (reproducible across engines and
    // runs — the training-mix "cap each source" step). One window pass
    // partitioned by the quota key; rank<=k plans as WindowGroupLimit,
    // so map tasks emit at most k rows per group before the shuffle.
    // For groups of billions where even the map-side pass matters,
    // pre-filter on a generous hash threshold (keep hash < c*k/|group|
    // candidates) before the exact rank — same result, bounded input.
    "q_sample_quota" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("hk", md5(col("doc_id").cast("string")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("hk").asc, col("doc_id").asc)))
        .filter(col("rk") <= 30)
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Market-basket co-occurrence: part pairs bought together in one
    // order, with support and lift. The self-join is KEYED on the order
    // (pairs explode only within an order's few items — bounded fanout,
    // never all-parts x all-parts), and the marginals join back by
    // broadcast. Lift > 1 marks genuinely associated pairs.
    "q_basket_pairs" -> ((s, d) => {
      // order count as an in-plan scalar aggregate (1 row, broadcast) —
      // a driver-side .count() here would run a job during construction
      val nOrders = Tables.orders(s, d)
        .agg(count(lit(1)).cast("double").as("n_orders"))
      // shared edge mining (see orderPartSets/coPurchasePairs): one
      // shuffle builds the sets, pairs and marginals are map-side
      // explodes (a distinct + self-join formulation shuffles the item
      // table twice more for the same answer)
      val sets = orderPartSets(s, d)
      val pairs = coPurchasePairs(sets, minSupport = 2)
      val marg = sets.select(explode(col("ps")).as("l_partkey"))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("m"))
      pairs
        .join(broadcast(marg.select(col("l_partkey").as("p1"), col("m").as("m1"))), Seq("p1"))
        .join(broadcast(marg.select(col("l_partkey").as("p2"), col("m").as("m2"))), Seq("p2"))
        .crossJoin(broadcast(nOrders))
        .withColumn("lift", Det.r4(
          col("support") * col("n_orders") / (col("m1") * col("m2"))))
        .select(col("p1"), col("p2"), col("support"), col("lift"))
        .orderBy(col("support").desc, col("p1").asc_nulls_first,
          col("p2").asc_nulls_first)
        .limit(100)
    }),

    // Triangle enumeration over the co-purchase graph (the cohesion
    // counterpart of q_graph_pagerank's centrality): edges are the
    // support>=2 co-purchase pairs; [[degreeOrientedTriangles]] orients
    // them low-degree -> high-degree so per-key wedge fanout is bounded
    // by the graph's arboricity instead of its max hub degree — the
    // orientation changes nothing in the output (same triangles, same
    // a < b < c emission), which is why the id-oriented DuckDB oracle
    // still hash-matches.
    "q_graph_triangles" -> ((s, d) =>
      degreeOrientedTriangles(
        coPurchasePairs(orderPartSets(s, d), minSupport = 2)
          .select(col("p1"), col("p2")))),

    // Single-source BFS over the co-purchase graph (the traversal
    // complement of CC/pagerank/triangles): min-hop distance from the
    // lowest-id vertex, levels capped at 10 so the engine and the
    // recursive-CTE oracle share a finite frontier. Each level is ONE
    // keyed equi-join of the current frontier with the (bidirected)
    // edge list plus an anti-join against the visited set — the frontier
    // shuffles on the vertex key, never the whole graph; localCheckpoint
    // truncates the per-level lineage like the CC loop. Deterministic:
    // min-hop is order-free.
    "q_graph_bfs" -> ((s, d) => {
      import s.implicits._
      val edges = coPurchasePairs(orderPartSets(s, d), minSupport = 2)
        .select(col("p1"), col("p2")).localCheckpoint()
      val bidir = edges.select(col("p1").as("u"), col("p2").as("v"))
        .union(edges.select(col("p2").as("u"), col("p1").as("v")))
      val src = edges.agg(min(col("p1"))).head().getLong(0)
      var visited = Seq((src, 0)).toDF("node", "hop").localCheckpoint()
      var frontier = visited
      var level = 0
      while (level < 10 && !frontier.isEmpty) {
        val next = frontier.join(bidir, col("node") === col("u"))
          .select(col("v").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("hop", lit(level + 1))
          .localCheckpoint()
        visited = visited.union(next).localCheckpoint()
        frontier = next
        level += 1
      }
      visited.select(col("node"), col("hop").cast("int").as("hop"))
        .orderBy(col("node").asc_nulls_first)
    }),

    // Skyline (Pareto frontier): parts not dominated on (min price,
    // max size). The all-pairs NOT EXISTS definition is quadratic; this
    // plan is the scalable two-pass form — (1) per-price max size, a
    // partial-agg'd groupBy; (2) a prefix-max over the PRICE-AGGREGATED
    // frame (cardinality = distinct prices, orders of magnitude below
    // row count; for a truly continuous axis shard the prefix max like
    // ScalePatterns.withGlobalRank); (3) a broadcast semi-join back.
    // Equal (price, size) pairs dominate neither way, so both survive —
    // matching the NOT EXISTS oracle exactly.
    "q_skyline" -> ((s, d) => {
      val p = Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      val perPrice = p.groupBy(col("p_retailprice"))
        .agg(max(col("p_size")).as("pmax"))
      val w = Window.orderBy(col("p_retailprice").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val sky = perPrice
        .withColumn("prevmax", max(col("pmax")).over(w))
        .filter(col("prevmax").isNull || col("pmax") > col("prevmax"))
        .select(col("p_retailprice"), col("pmax"))
      p.join(broadcast(sky), Seq("p_retailprice"))
        .filter(col("p_size") === col("pmax"))
        .select(col("p_partkey"),
          Det.r4(col("p_retailprice")).as("price"), col("p_size"))
        .orderBy(col("p_partkey").asc_nulls_first)
    }),

    // Growth accounting: per day, active / new / returning users — the
    // product-analytics daily rollup. "New" is a per-user min-date
    // aggregation joined back on (user, day); both aggregations are
    // partial-agg'd and the join is keyed, so nothing concentrates.
    "q_growth_accounting" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val firstDay = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("first_day"))
      days.join(firstDay, Seq("user_id"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("active"),
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("new_users"))
        .withColumn("returning", col("active") - col("new_users"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("active"), col("new_users"), col("returning"))
        .orderBy(col("day").asc_nulls_first)
    }),

    // Winsorization: clip values at the per-group p05/p95 cutpoints —
    // standard outlier treatment before model features. Cutpoints come
    // from one exact-percentile aggregate broadcast back (the
    // q_range_bucket pattern); the clip itself is a map-only
    // least/greatest, and the output compares raw vs clipped moments.
    "q_winsorize" -> ((s, d) => {
      val e = Tables.events(s, d)
      val cuts = e.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.05D)").as("lo"),
          expr("percentile(value, 0.95D)").as("hi"))
      e.join(broadcast(cuts), Seq("event_type"))
        .withColumn("w", least(greatest(col("value"), col("lo")), col("hi")))
        .groupBy(col("event_type"))
        .agg(Det.r4(avg(col("value"))).as("mean_raw"),
          Det.r4(avg(col("w"))).as("mean_winsor"),
          Det.r4(max(col("lo"))).as("p05"),
          Det.r4(max(col("hi"))).as("p95"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    // Key-skew profile: the hottest join keys of the big fact table with
    // their share of all rows — the diagnostic that decides salting
    // factors and AQE skew thresholds before a 100 TB join. Partial-agg'd
    // groupBy collapses to one row per key before any exchange; the
    // top-10 is a TakeOrdered (never a global sort), and the total is an
    // in-plan scalar broadcast back. Total (n desc, key asc) order makes
    // the LIMIT deterministic under count ties.
    "q_skew_profile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val total = li.agg(count(lit(1)).cast("double").as("n_total"))
      li.groupBy(col("l_suppkey").as("key"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("key").asc_nulls_first)
        .limit(10)
        .crossJoin(broadcast(total))
        .select(col("key"), col("n"),
          Det.r4(col("n") / col("n_total")).as("share"))
        .orderBy(col("n").desc, col("key").asc_nulls_first)
    }),

    // Two-sample Welch t-statistic between event populations (purchase
    // vs view values) — the experimentation primitive. Entirely
    // partial-agg'd moments (count/mean/variance per arm), one tiny
    // join, closed-form t and degrees of freedom; no per-row state.
    "q_ab_test" -> ((s, d) => {
      val e = Tables.events(s, d)
      def arm(t: String, suffix: String) =
        e.filter(col("event_type") === t)
          .agg(count(lit(1)).cast("double").as(s"n$suffix"),
            avg(col("value")).as(s"m$suffix"),
            var_samp(col("value")).as(s"v$suffix"))
      val a = arm("purchase", "_a")
      val b = arm("view", "_b")
      val se2 = col("v_a") / col("n_a") + col("v_b") / col("n_b")
      val dfW = (se2 * se2) /
        ((col("v_a") / col("n_a")) * (col("v_a") / col("n_a")) / (col("n_a") - 1) +
         (col("v_b") / col("n_b")) * (col("v_b") / col("n_b")) / (col("n_b") - 1))
      a.crossJoin(b)
        .select(Det.r4(col("m_a")).as("mean_a"), Det.r4(col("m_b")).as("mean_b"),
          Det.r4((col("m_a") - col("m_b")) / sqrt(se2)).as("t_stat"),
          Det.r4(dfW).as("welch_df"),
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"))
    }),

    // Robust statistics: per-type median + MAD (median absolute
    // deviation) — the outlier-resistant counterpart of q_anomaly_zscore
    // (one planted extreme value shifts mean/stddev arbitrarily but
    // moves neither median). Two exact-percentile passes with a
    // broadcast of the 5-row median frame between them.
    "q_robust_stats" -> ((s, d) => {
      val e = Tables.events(s, d)
      val med = e.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5D)").as("med"))
      e.join(broadcast(med), Seq("event_type"))
        .withColumn("ad", abs(col("value") - col("med")))
        .groupBy(col("event_type"))
        .agg(Det.r4(max(col("med"))).as("median"),
          Det.r4(expr("percentile(ad, 0.5D)")).as("mad"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    // Per-type z-score anomalies: group stats via partial-agg'd groupBy
    // + broadcast join back (NOT a window over event_type — five huge
    // window partitions would concentrate all rows on five tasks at
    // corpus scale; the stats frame is 5 rows, the join is map-only).
    // try_divide: a zero-variance group (sigma = 0) must yield null z
    // (no anomalies by definition), not an ANSI DIVIDE_BY_ZERO abort —
    // the oracle states the same with nullif.
    "q_anomaly_zscore" -> ((s, d) => {
      val e = Tables.events(s, d)
      val stats = e.groupBy(col("event_type"))
        .agg(avg(col("value")).as("mu"),
          stddev_samp(col("value")).as("sigma"))
      e.join(broadcast(stats), Seq("event_type"))
        .withColumn("z",
          Det.r4(try_divide(col("value") - col("mu"), col("sigma"))))
        .filter(abs(col("z")) > 3)
        .select(col("event_id"), col("event_type"),
          Det.r4(col("value")).as("value"), col("z"))
        .orderBy(col("event_id").asc_nulls_first)
    })
  )

  private def r4sql(inner: String, alias: String) =
    s"floor(($inner) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS $alias"

  val oracle: Map[String, String] = Map(
    "q_funnel" ->
      s"""WITH su AS (
         |  SELECT user_id, min(ts) AS signup_ts FROM events
         |  WHERE event_type = 'signup' GROUP BY user_id),
         |pu AS (
         |  SELECT e.user_id, min(e.ts) AS purchase_ts
         |  FROM events e JOIN su ON e.user_id = su.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts > su.signup_ts
         |  GROUP BY e.user_id)
         |SELECT su.user_id, su.signup_ts, pu.purchase_ts,
         |  pu.purchase_ts IS NOT NULL AS converted,
         |  ${r4sql("(epoch_us(pu.purchase_ts) - epoch_us(su.signup_ts)) / 3600000000.0", "hours_to_convert")}
         |FROM su LEFT JOIN pu ON su.user_id = pu.user_id
         |ORDER BY su.user_id ASC NULLS FIRST""".stripMargin,
    "q_funnel_stages" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |vu AS (
        |  SELECT e.user_id, min(e.ts) AS view_ts
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'view' AND e.ts > su.signup_ts
        |  GROUP BY e.user_id),
        |pu AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN vu ON e.user_id = vu.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > vu.view_ts
        |  GROUP BY e.user_id)
        |SELECT su.user_id, su.signup_ts, vu.view_ts, pu.purchase_ts,
        |  CAST(1 + (vu.view_ts IS NOT NULL)::INT
        |    + (pu.purchase_ts IS NOT NULL)::INT AS INT) AS stages
        |FROM su LEFT JOIN vu ON su.user_id = vu.user_id
        |LEFT JOIN pu ON su.user_id = pu.user_id
        |ORDER BY su.user_id ASC NULLS FIRST""".stripMargin,
    "q_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
        |      FROM events)
        |SELECT f.cohort_week,
        |  CAST(floor(date_diff('day', f.cohort_week, a.act_week) / 7)
        |    AS INT) AS week_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY f.cohort_week, week_offset
        |ORDER BY f.cohort_week ASC NULLS FIRST,
        |  week_offset ASC NULLS FIRST""".stripMargin,
    "q_session_features" ->
      s"""WITH m AS (
         |  SELECT user_id, event_id, ts, event_type, value,
         |    CASE
         |      WHEN lag(ts, 1) OVER (PARTITION BY user_id
         |        ORDER BY ts ASC, event_id ASC) IS NULL THEN 1
         |      WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
         |        PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
         |        > 600 * 1000000 THEN 1
         |      ELSE 0 END AS new_sess
         |  FROM events),
         |s AS (
         |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
         |    ORDER BY ts ASC, event_id ASC
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
         |  FROM m)
         |SELECT user_id, sess_id, min(ts) AS sess_start,
         |  (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
         |    AS duration_sec,
         |  count(1) AS n_events,
         |  count(1) FILTER (WHERE event_type = 'purchase') AS n_purchases,
         |  ${r4sql("sum(coalesce(value, 0.0))", "total_value")}
         |FROM s GROUP BY user_id, sess_id
         |ORDER BY user_id ASC NULLS FIRST, sess_id ASC NULLS FIRST""".stripMargin,
    "q_window_fill" ->
      s"""WITH g AS (
         |  SELECT event_id, user_id, ts,
         |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS gappy
         |  FROM events)
         |SELECT event_id, user_id,
         |  ${r4sql("gappy", "gappy")},
         |  ${r4sql("last_value(gappy IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", "filled")}
         |FROM g ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
         |  count(1) AS n,
         |  ${r4sql("min(o_totalprice)", "lo")},
         |  ${r4sql("max(o_totalprice)", "hi")}
         |FROM orders GROUP BY bin ORDER BY bin ASC NULLS FIRST""".stripMargin,
    "q_interval_join" ->
      s"""WITH su AS (
         |  SELECT user_id, ts AS s_ts FROM events
         |  WHERE event_type = 'signup'),
         |pu AS (
         |  SELECT user_id, ts AS p_ts, value FROM events
         |  WHERE event_type = 'purchase')
         |SELECT su.user_id, su.s_ts, pu.p_ts,
         |  ${r4sql("pu.value", "value")}
         |FROM su JOIN pu ON su.user_id = pu.user_id
         |WHERE pu.p_ts > su.s_ts
         |  AND pu.p_ts <= su.s_ts + INTERVAL 24 HOURS
         |ORDER BY su.user_id ASC NULLS FIRST, su.s_ts ASC NULLS FIRST,
         |  pu.p_ts ASC NULLS FIRST""".stripMargin,
    "q_event_transitions" ->
      s"""WITH nx AS (
         |  SELECT event_type,
         |    lead(event_type, 1) OVER (PARTITION BY user_id
         |      ORDER BY ts ASC, event_id ASC) AS next_type
         |  FROM events),
         |c AS (
         |  SELECT event_type, next_type, count(1) AS n FROM nx
         |  WHERE next_type IS NOT NULL GROUP BY event_type, next_type)
         |SELECT event_type, next_type, n,
         |  ${r4sql("n / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)", "prob")}
         |FROM c ORDER BY event_type ASC NULLS FIRST,
         |  next_type ASC NULLS FIRST""".stripMargin,
    "q_text_bigrams" ->
      """WITH t AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w0,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |bg AS (
        |  SELECT lang, w0 || ' ' || lead(w0, 1) OVER (PARTITION BY doc_id
        |      ORDER BY pos ASC) AS bigram,
        |    lead(w0, 1) OVER (PARTITION BY doc_id ORDER BY pos ASC) AS w1
        |  FROM t),
        |c AS (
        |  SELECT lang, bigram, count(1) AS n FROM bg
        |  WHERE w1 IS NOT NULL GROUP BY lang, bigram),
        |r AS (
        |  SELECT lang, bigram, n, row_number() OVER (PARTITION BY lang
        |    ORDER BY n DESC, bigram ASC) AS rk FROM c)
        |SELECT lang, bigram, n, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5
        |ORDER BY lang ASC NULLS FIRST, rk ASC NULLS FIRST""".stripMargin,
    "q_sample_quota" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM r WHERE rk <= 30
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_basket_pairs" ->
      s"""WITH $coPurchaseCte,
        |n AS (SELECT count(*) AS n_orders FROM orders),
        |marg AS (SELECT l_partkey, count(1) AS m FROM li GROUP BY 1)
        |SELECT p1, p2, support,
        |  floor((CAST(support AS DOUBLE) * n_orders / (m1.m * m2.m)) * 10000
        |    + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS lift
        |FROM pairs CROSS JOIN n
        |JOIN marg m1 ON p1 = m1.l_partkey
        |JOIN marg m2 ON p2 = m2.l_partkey
        |ORDER BY support DESC, p1 ASC NULLS FIRST, p2 ASC NULLS FIRST
        |LIMIT 100""".stripMargin,
    "q_graph_triangles" ->
      s"""WITH $coPurchaseCte
        |SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        |FROM pairs e1
        |JOIN pairs e2 ON e1.p2 = e2.p1
        |JOIN pairs e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
        |ORDER BY a ASC NULLS FIRST, b ASC NULLS FIRST, c ASC NULLS FIRST""".stripMargin,
    // min-hop BFS as a level-bounded recursive CTE: UNION dedups exact
    // (node, hop) repeats, the hop < 10 guard bounds cyclic walks, and
    // min(hop) collapses every reach to the first one — the same
    // frontier semantics as the engine's iterative join loop
    "q_graph_bfs" ->
      s"""WITH RECURSIVE $coPurchaseCte,
        |bidir AS (SELECT p1 AS u, p2 AS v FROM pairs
        |          UNION ALL SELECT p2, p1 FROM pairs),
        |walk(node, hop) AS (
        |  SELECT (SELECT min(p1) FROM pairs), 0
        |  UNION
        |  SELECT v, hop + 1 FROM walk JOIN bidir ON node = u
        |  WHERE hop < 10)
        |SELECT node, CAST(min(hop) AS INT) AS hop FROM walk
        |GROUP BY node ORDER BY node ASC NULLS FIRST""".stripMargin,
    // dominance definition straight from the skyline literature: no b
    // that is <= on price, >= on size, and strictly better on one
    "q_skyline" ->
      """SELECT p_partkey,
        |  floor((p_retailprice) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS price,
        |  p_size
        |FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,
    "q_growth_accounting" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |fd AS (SELECT user_id, min(day) AS first_day FROM days GROUP BY 1),
        |g AS (
        |  SELECT days.day, count(1) AS active,
        |    CAST(sum(CASE WHEN days.day = fd.first_day THEN 1 ELSE 0 END)
        |      AS BIGINT) AS new_users
        |  FROM days JOIN fd USING (user_id) GROUP BY days.day)
        |SELECT strftime(day, '%Y-%m-%d') AS day, active, new_users,
        |  active - new_users AS returning
        |FROM g ORDER BY day ASC NULLS FIRST""".stripMargin,
    "q_winsorize" ->
      s"""WITH cuts AS (
         |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
         |    quantile_cont(value, 0.95) AS hi
         |  FROM events GROUP BY event_type),
         |w AS (
         |  SELECT e.event_type, e.value, cuts.lo, cuts.hi,
         |    least(greatest(e.value, cuts.lo), cuts.hi) AS wv
         |  FROM events e JOIN cuts USING (event_type))
         |SELECT event_type,
         |  ${r4sql("avg(value)", "mean_raw")},
         |  ${r4sql("avg(wv)", "mean_winsor")},
         |  ${r4sql("max(lo)", "p05")},
         |  ${r4sql("max(hi)", "p95")},
         |  count(1) AS n
         |FROM w GROUP BY event_type
         |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "q_skew_profile" ->
      s"""WITH t AS (
         |  SELECT l_suppkey AS key, count(1) AS n FROM lineitem GROUP BY 1),
         |tot AS (SELECT count(*) AS n_total FROM lineitem)
         |SELECT key, n,
         |  ${r4sql("CAST(n AS DOUBLE) / n_total", "share")}
         |FROM t CROSS JOIN tot
         |ORDER BY n DESC, key ASC NULLS FIRST
         |LIMIT 10""".stripMargin,
    "q_ab_test" ->
      s"""WITH a AS (
         |  SELECT CAST(count(1) AS DOUBLE) AS n_a, avg(value) AS m_a,
         |    var_samp(value) AS v_a
         |  FROM events WHERE event_type = 'purchase'),
         |b AS (
         |  SELECT CAST(count(1) AS DOUBLE) AS n_b, avg(value) AS m_b,
         |    var_samp(value) AS v_b
         |  FROM events WHERE event_type = 'view')
         |SELECT ${r4sql("m_a", "mean_a")}, ${r4sql("m_b", "mean_b")},
         |  ${r4sql("(m_a - m_b) / sqrt(v_a / n_a + v_b / n_b)", "t_stat")},
         |  ${r4sql("((v_a / n_a + v_b / n_b) * (v_a / n_a + v_b / n_b)) / ((v_a / n_a) * (v_a / n_a) / (n_a - 1) + (v_b / n_b) * (v_b / n_b) / (n_b - 1))", "welch_df")},
         |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
         |FROM a CROSS JOIN b""".stripMargin,
    "q_robust_stats" ->
      s"""WITH med AS (
         |  SELECT event_type, quantile_cont(value, 0.5) AS med
         |  FROM events GROUP BY event_type),
         |ad AS (
         |  SELECT e.event_type, med.med, abs(e.value - med.med) AS ad
         |  FROM events e JOIN med USING (event_type))
         |SELECT event_type,
         |  ${r4sql("max(med)", "median")},
         |  ${r4sql("quantile_cont(ad, 0.5)", "mad")},
         |  count(1) AS n
         |FROM ad GROUP BY event_type
         |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "q_anomaly_zscore" ->
      s"""WITH stats AS (
         |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
         |  FROM events GROUP BY event_type),
         |z AS (
         |  SELECT event_id, event_type, value,
         |    ${r4sql("(value - mu) / nullif(sigma, 0)", "z")}
         |  FROM events JOIN stats USING (event_type))
         |SELECT event_id, event_type,
         |  ${r4sql("value", "value")}, z
         |FROM z WHERE abs(z) > 3
         |ORDER BY event_id ASC NULLS FIRST""".stripMargin
  )
}
