package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` surface: case-class rows with compile-time field
  * checks (SURVEY.md §1.4 maps the reference's `Part(keys, values)`
  * record, tables.py:267-270, to this). The typed aggregation compiles
  * to the same physical plan family as the untyped one — Catalyst sees
  * through the encoders — so it carries a DuckDB oracle like any other
  * query.
  */
object TypedApi {

  /** orders row; o_orderdate is TIMESTAMP_NTZ in the parquet ->
    * LocalDateTime in the JVM.
    */
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.time.LocalDateTime,
      o_orderpriority: String)

  case class StatusAgg(status: String, n: Long, total: Double)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Typed path: as[Order] -> groupByKey -> mapGroups with plain Scala.
    "q_typed_agg" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d).as[Order]
        .groupByKey(_.o_orderstatus)
        .mapGroups { (status, orders) =>
          // sort before summing: group iteration order is shuffle-
          // dependent, and a run-stable double sum keeps r4 reproducible
          val sorted = orders.toSeq.sortBy(_.o_orderkey)
          StatusAgg(status, sorted.size.toLong,
            sorted.iterator.map(_.o_totalprice).sum)
        }
        .toDF()
        .select(col("status"), col("n"), graft.Det.r4(col("total")).as("total"))
        .orderBy(col("status").asc_nulls_first)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_typed_agg" ->
      """SELECT o_orderstatus AS status, count(1) AS n,
        |  floor((sum(o_totalprice)) * 10000 + CAST(0.5 AS DOUBLE))
        |    / CAST(10000 AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY status ASC NULLS FIRST""".stripMargin
  )
}
