package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, top-k, global sort, and set operations.
  *
  * Window specs always carry a deterministic total order inside each
  * partition (tie-broken on a key) so ranking is reproducible across
  * engines. Top-k-per-group is the `row_number + filter` pattern — the
  * same shape the similarity-search operators reuse; Spark pushes the
  * rank filter into the window (WindowGroupLimit) so the full sort is
  * never materialized at scale.
  */
object Windows {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_rank" -> ((s, d) => {
      // rank/dense_rank are tie-stable on the bare sort key; row_number
      // needs the unique tiebreak to be deterministic.
      val wt = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc_nulls_last)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc_nulls_last, col("c_custkey").asc_nulls_first)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          graft.Det.r4(col("c_acctbal")).as("bal"),
          rank().over(wt).as("rnk"),
          dense_rank().over(wt).as("drnk"),
          row_number().over(w).as("rn"))
        .orderBy(col("c_mktsegment").asc_nulls_first,
          col("rn").asc_nulls_first)
    }),

    "q_window_analytic" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          graft.Det.r4(col("o_totalprice")).as("price"),
          graft.Det.r4(lag(col("o_totalprice"), 1).over(w)).as("prev_price"),
          graft.Det.r4(lead(col("o_totalprice"), 1).over(w)).as("next_price"))
        .orderBy(col("o_custkey").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)
    }),

    // Running frame aggregate: per-customer cumulative spend.
    "q_window_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          graft.Det.r4(sum(col("o_totalprice")).over(w)).as("running_spend"))
        .orderBy(col("o_custkey").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)
    }),

    // Top-k per group (k=3 orders per customer by price).
    "q_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          graft.Det.r4(col("o_totalprice")).as("price"))
        .orderBy(col("o_custkey").asc_nulls_first, col("rn").asc_nulls_first)
    }),

    // Running COUNT DISTINCT over a growing frame — not supported as a
    // native window aggregate (in Spark or any mainstream engine), so
    // it composes from supported pieces: mark each (user, type)'s FIRST
    // occurrence with one ranking window, then running-sum the marks
    // with a second window on the same (user | time) partitioning —
    // both frames sequential scans within the user shard, never a
    // per-row distinct recompute (which would be quadratic in frame
    // length).
    "q_window_count_distinct" -> ((s, d) => {
      val e = Tables.events(s, d).filter(col("user_id") < 5)
      val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .withColumn("n_types_so_far", sum(col("first_seen")).over(wRun))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("n_types_so_far"))
        .orderBy(col("user_id").asc_nulls_first,
          col("event_id").asc_nulls_first)
    }),

    // Global sort + limit: Spark plans TakeOrderedAndProject — a per-
    // partition top-N + driver merge, no full sort at scale.
    "q_sort_limit" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
        .limit(100)
        .select(col("o_orderkey"), graft.Det.r4(col("o_totalprice")).as("price"))
    }),

    // Set ops (reference R8 continuation-table union generalized).
    "q_set_union" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      val sp = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      c.union(sp).distinct().orderBy(col("nk").asc_nulls_first)
    }),

    "q_set_intersect" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey").as("pk"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45).select(col("l_partkey").as("pk"))
      p.intersect(li).orderBy(col("pk").asc_nulls_first)
    }),

    "q_set_except" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey").as("pk"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45).select(col("l_partkey").as("pk"))
      p.except(li).orderBy(col("pk").asc_nulls_first)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_window_count_distinct" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, event_type,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts ASC, event_id ASC) = 1 THEN 1 ELSE 0 END AS first_seen,
        |    ts
        |  FROM events WHERE user_id < 5)
        |SELECT user_id, event_id, event_type,
        |  CAST(sum(first_seen) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_types_so_far
        |FROM marked
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
    "q_window_rank" ->
      """SELECT c_custkey, c_mktsegment, floor((c_acctbal) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS bal,
        |  CAST(rank() OVER wt AS INT) AS rnk,
        |  CAST(dense_rank() OVER wt AS INT) AS drnk,
        |  CAST(row_number() OVER w AS INT) AS rn
        |FROM customer
        |WINDOW wt AS (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC NULLS LAST),
        |  w AS (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS FIRST)
        |ORDER BY c_mktsegment ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,
    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey, floor((o_totalprice) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS price,
        |  floor((lag(o_totalprice, 1) OVER w) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS prev_price,
        |  floor((lead(o_totalprice, 1) OVER w) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  floor((sum(o_totalprice) OVER w) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey, floor((o_totalprice) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS price,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST)
        |      AS INT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, floor((o_totalprice) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS price FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
        |LIMIT 100""".stripMargin,
    "q_set_union" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk ASC NULLS FIRST""".stripMargin,
    "q_set_intersect" ->
      """SELECT p_partkey AS pk FROM part
        |INTERSECT SELECT l_partkey AS pk FROM lineitem WHERE l_quantity > 45
        |ORDER BY pk ASC NULLS FIRST""".stripMargin,
    "q_set_except" ->
      """SELECT p_partkey AS pk FROM part
        |EXCEPT SELECT l_partkey AS pk FROM lineitem WHERE l_quantity > 45
        |ORDER BY pk ASC NULLS FIRST""".stripMargin
  )
}
