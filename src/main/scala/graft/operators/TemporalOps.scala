package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reshaping over `events`: gaps-and-islands run detection,
  * SCD2 (type-2 slowly-changing-dimension) interval snapshots, and
  * regular-grid resampling with linear interpolation. Generalizes the
  * reference's only temporal signal (the `ModDate` string folded into
  * provenance, reference tables.py:73) into the interval/versioned
  * shapes a warehouse user expects.
  *
  * Scale: every query here is windowed BY USER — the partition key is
  * the natural shard, frames are sequential scans within a shard, and
  * no window runs unpartitioned. The interpolation spine is
  * users x hours (bounded by wall-clock span, not event count).
  */
object TemporalOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gaps & islands: maximal runs of consecutive active DAYS per user.
    // The classic anchor trick — day minus per-user dense row_number is
    // constant within a run — turns run detection into one partitioned
    // window plus one groupBy, both keyed on user_id (no self-join, no
    // global sort).
    "q_gaps_islands" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("day").asc)
      days
        .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
        .groupBy(col("user_id"), col("anchor"))
        .agg(min(col("day")).as("start_day"),
          max(col("day")).as("end_day"),
          count(lit(1)).as("n_days"))
        // days go out as yyyy-MM-dd strings: pandas-side DATE handling
        // differs between engines in the comparison harness (same note
        // as q_date_spine)
        .select(col("user_id"),
          date_format(col("start_day"), "yyyy-MM-dd").as("island_start"),
          date_format(col("end_day"), "yyyy-MM-dd").as("island_end"),
          col("n_days"))
        .orderBy(col("user_id").asc_nulls_first,
          col("island_start").asc_nulls_first)
    }),

    // SCD2 snapshot: compress each user's event stream into
    // state-change intervals — one row per run of equal event_type,
    // valid_from inclusive, valid_to exclusive (NULL = current). Change
    // detection is a lag over (user, time) and the interval close is a
    // lead over the surviving change rows: two sequential window passes
    // on the SAME (user_id | ts) partitioning+ordering, so Spark plans
    // one shuffle and one sort for both.
    "q_scd2_snapshot" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val changes = Tables.events(s, d)
        .filter(col("user_id") < 20)
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("version"),
          col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"))
        .orderBy(col("user_id").asc_nulls_first, col("version").asc_nulls_first)
    }),

    // Rolling event-time features: per event, the count/average over
    // the PRECEDING HOUR of the same user's activity — the online
    // feature-engineering shape (a fraud/abuse velocity signal). A
    // RANGE frame over event-time micros, not a ROWS frame: peers at
    // the same timestamp are all in-frame in every engine, so ties
    // cannot de-synchronize the two sides. Windowed by user — the
    // natural shard — never unpartitioned.
    "q_event_rolling" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          Det.r4(avg(col("value")).over(w)).as("avg_1h"))
        .orderBy(col("user_id").asc_nulls_first,
          col("event_id").asc_nulls_first)
    }),

    // Time-weighted average (TWAP): each observation holds until the
    // next one, so it contributes value x holding-duration; the final
    // observation has no duration and drops out. One lead window keyed
    // on the user shard + one keyed aggregation — the standard form for
    // irregularly-sampled series where a plain avg() over-weights bursts.
    "q_time_weighted_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("dur",
          (unix_micros(lead(col("ts"), 1).over(w)) -
            unix_micros(col("ts"))).cast("double"))
        .filter(col("dur").isNotNull)
        .groupBy(col("user_id"))
        .agg(Det.r4(sum(col("value") * col("dur")) / sum(col("dur")))
            .as("twap"),
          Det.r4(avg(col("value"))).as("plain_avg"),
          count(lit(1)).as("n_holds"))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    // Resample + linear interpolation: per-user hourly averages onto a
    // complete hourly spine; missing interior hours are linearly
    // interpolated between the nearest observed neighbors, edges (before
    // the first / after the last observation) stay NULL. The neighbor
    // carry is last/first-non-null frames with (time, value) structs —
    // the same IGNORE NULLS machinery as q_window_fill, extended with
    // the lerp arithmetic. All doubles on both engines: bit-identical.
    "q_resample_interpolate" -> ((s, d) => {
      val obs = Tables.events(s, d)
        .filter(col("user_id") < 10)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(Det.r4(avg(col("value"))).as("v"))
      val bounds = obs.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      val hours = bounds.select(
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("h"))
      val spine = obs.select(col("user_id")).distinct().crossJoin(hours)
      val g = spine.join(obs, Seq("user_id", "h"), "left_outer")
      val wPrev = Window.partitionBy(col("user_id")).orderBy(col("h").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("user_id")).orderBy(col("h").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsPoint = when(col("v").isNotNull, struct(col("h"), col("v")))
      val frac = (unix_micros(col("h")) - unix_micros(col("pv.h"))).cast("double") /
        (unix_micros(col("nx.h")) - unix_micros(col("pv.h"))).cast("double")
      g.withColumn("pv", last(obsPoint, ignoreNulls = true).over(wPrev))
        .withColumn("nx", first(obsPoint, ignoreNulls = true).over(wNext))
        .withColumn("val", Det.r4(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNotNull && col("nx").isNotNull,
              col("pv.v") + (col("nx.v") - col("pv.v")) * frac)))
        .select(col("user_id"), col("h"), col("val"))
        .orderBy(col("user_id").asc_nulls_first, col("h").asc_nulls_first)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_gaps_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |anchored AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY day ASC) AS INTEGER) AS anchor
        |  FROM days)
        |SELECT user_id, strftime(min(day), '%Y-%m-%d') AS island_start,
        |  strftime(max(day), '%Y-%m-%d') AS island_end,
        |  count(1) AS n_days
        |FROM anchored GROUP BY user_id, anchor
        |ORDER BY user_id ASC NULLS FIRST, island_start ASC NULLS FIRST""".stripMargin,
    "q_scd2_snapshot" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS prev
        |  FROM events WHERE user_id < 20),
        |changes AS (
        |  SELECT user_id, event_id, ts, event_type FROM marked
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC) AS INT) AS version,
        |  event_type AS state, ts AS valid_from,
        |  lead(ts, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC) AS valid_to
        |FROM changes
        |ORDER BY user_id ASC NULLS FIRST, version ASC NULLS FIRST""".stripMargin,
    "q_event_rolling" ->
      """SELECT user_id, event_id,
        |  count(1) OVER w AS n_1h,
        |  floor((avg(value) OVER w) * 10000
        |    + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS avg_1h
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH held AS (
        |  SELECT user_id, value,
        |    CAST(epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
        |        ORDER BY ts ASC, event_id ASC))
        |      - epoch_us(ts) AS DOUBLE) AS dur
        |  FROM events)
        |SELECT user_id,
        |  floor((sum(value * dur) / sum(dur)) * 10000
        |    + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS twap,
        |  floor((avg(value)) * 10000
        |    + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS plain_avg,
        |  count(1) AS n_holds
        |FROM held WHERE dur IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "q_resample_interpolate" ->
      """WITH obs AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |    floor((avg(value)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS v
        |  FROM events WHERE user_id < 10 GROUP BY 1, 2),
        |b AS (SELECT min(h) AS mn, max(h) AS mx FROM obs),
        |hours AS (
        |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b),
        |spine AS (
        |  SELECT u.user_id, hours.h
        |  FROM (SELECT DISTINCT user_id FROM obs) u CROSS JOIN hours),
        |g AS (
        |  SELECT s.user_id, s.h, o.v
        |  FROM spine s LEFT JOIN obs o
        |    ON s.user_id = o.user_id AND s.h = o.h),
        |f AS (
        |  SELECT user_id, h, v,
        |    last_value(CASE WHEN v IS NOT NULL
        |        THEN struct_pack(h := h, v := v) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY h ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    first_value(CASE WHEN v IS NOT NULL
        |        THEN struct_pack(h := h, v := v) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY h ASC
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        |  FROM g)
        |SELECT user_id, h,
        |  floor((CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NOT NULL AND nx IS NOT NULL THEN
        |      pv.v + (nx.v - pv.v) *
        |        (CAST(epoch_us(h) - epoch_us(pv.h) AS DOUBLE) /
        |         CAST(epoch_us(nx.h) - epoch_us(pv.h) AS DOUBLE))
        |    END) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS val
        |FROM f
        |ORDER BY user_id ASC NULLS FIRST, h ASC NULLS FIRST""".stripMargin
  )
}
