package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship multi-join analytical queries (TPC-H Q3/Q5 shapes) and
  * distribution window functions — the end-to-end showcase of join
  * planning: dimensions broadcast, facts sort-merge/shuffle-hash join on
  * their keys, aggregation partials map-side, and the final top-k is a
  * TakeOrderedAndProject, never a global single-task sort.
  */
object Flagship {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q5 shape: revenue by customer nation for one region and one year.
    // region/nation broadcast (tiny dims), customer joins shuffled on
    // custkey, orders filtered by date before joining lineitem — the
    // filter runs at the scan, shrinking the fact join's build side.
    "q_star_join" -> ((s, d) => {
      val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, d)
      val cust = Tables.customer(s, d)
      val orders = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1997-01-01")
      val li = Tables.lineitem(s, d)
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Det.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name").asc_nulls_first)
    }),

    // Q8 shape (national market share): the fraction of one supplier
    // nation's revenue within a region's purchases of one part type,
    // per order year — an 8-table star with a conditional-aggregate
    // ratio on top. Dims (part/supplier/nation x2/region) broadcast;
    // the lineitem-orders-customer chain shuffles on its keys; the
    // numerator rides the same aggregate as the denominator via a CASE,
    // so the whole ratio is ONE pass over the joined fact.
    "q_market_share" -> ((s, d) => {
      val part = Tables.part(s, d).filter(col("p_type") === "STANDARD")
      val supp = Tables.supplier(s, d)
      val li = Tables.lineitem(s, d)
      val orders = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val volume = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(Det.r4(
          sum(when(col("supp_nation") === "NATION_3", volume).otherwise(0.0)) /
            sum(volume)).as("mkt_share"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_year").asc_nulls_first)
    }),

    // Q3 shape (shipping priority): top-10 open orders by revenue for
    // one segment. The limit plans as TakeOrderedAndProject over the
    // aggregated frame.
    "q_ship_priority" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
      val orders = Tables.orders(s, d)
        .filter(col("o_orderdate") < "1998-01-01")
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-06-01")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Det.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc_nulls_first)
        .limit(10)
    }),

    // Distribution window functions: percent_rank and cume_dist of
    // account balance within each market segment.
    "q_window_distribution" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          Det.r4(percent_rank().over(w)).as("pr"),
          Det.r4(cume_dist().over(w)).as("cd"))
        .orderBy(col("c_custkey").asc_nulls_first)
    })
  )

  private def r4sql(inner: String, alias: String) =
    s"floor(($inner) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS $alias"

  val oracle: Map[String, String] = Map(
    "q_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |  ${r4sql("sum(CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) / sum(l_extendedprice * (1.0 - l_discount))", "mkt_share")},
         |  count(1) AS n_items
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
         |GROUP BY year(o_orderdate)
         |ORDER BY o_year ASC NULLS FIRST""".stripMargin,
    "q_star_join" ->
      s"""SELECT n_name,
         |  ${r4sql("sum(l_extendedprice * (1.0 - l_discount))", "revenue")},
         |  count(1) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY n_name ASC NULLS FIRST""".stripMargin,
    "q_ship_priority" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
         |  ${r4sql("sum(l_extendedprice * (1.0 - l_discount))", "revenue")}
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate >= TIMESTAMP '1996-06-01'
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey ASC NULLS FIRST
         |LIMIT 10""".stripMargin,
    "q_window_distribution" ->
      s"""SELECT c_custkey, c_mktsegment,
         |  ${r4sql("percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)", "pr")},
         |  ${r4sql("cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)", "cd")}
         |FROM customer ORDER BY c_custkey ASC NULLS FIRST""".stripMargin
  )
}
