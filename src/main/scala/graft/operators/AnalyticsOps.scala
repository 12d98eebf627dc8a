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

    // Per-group quota sampling: keep at most 30 docs per language,
    // chosen by portable md5 order (reproducible across engines and
    // runs — the training-mix "cap each source" step). One window pass
    // partitioned by the quota key.
    "q_sample_quota" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("hk", md5(col("doc_id").cast("string")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("hk").asc, col("doc_id").asc)))
        .filter(col("rk") <= 30)
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy(col("doc_id").asc_nulls_first)
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
    "q_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
         |  count(1) AS n,
         |  ${r4sql("min(o_totalprice)", "lo")},
         |  ${r4sql("max(o_totalprice)", "hi")}
         |FROM orders GROUP BY bin ORDER BY bin ASC NULLS FIRST""".stripMargin,
    "q_sample_quota" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM r WHERE rk <= 30
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  )
}
