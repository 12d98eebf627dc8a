package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface: strings (reference R18 normalization —
  * tables.py:178/230, database.py:28), dates, math, arrays (higher-order
  * functions over the embedding vectors), JSON extraction, and the
  * explode/lateral shape (reference R19's one-cell-to-many-rows parse,
  * main.py:18-43, generalized to tokenization).
  *
  * Everything is `org.apache.spark.sql.functions._` — codegen'd, no UDFs —
  * so the whole pipeline stays inside WholeStageCodegen.
  */
object Scalars {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          concat_ws("|", col("p_brand"), col("p_type")).as("tag"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
          levenshtein(col("p_name"), col("p_type")).as("edit_dist"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_name"), "\\s+", "_").as("slug"))
        .orderBy(col("p_partkey").asc_nulls_first)
    }),

    "q_date_funcs" -> ((s, d) => {
      Tables.events(s, d)
        .select(
          col("event_id"),
          date_trunc("day", col("ts")).as("day"),
          year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("m"),
          dayofmonth(col("ts")).cast("long").as("dom"),
          hour(col("ts")).cast("long").as("h"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
            .cast("long").as("days_in"))
        .orderBy(col("event_id").asc_nulls_first)
    }),

    "q_math_funcs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // round to 4: the true product of two 2-decimal values is an
          // exact 4-decimal number, so the rounding is boundary-safe in
          // both engines (round-to-2 diverges at .xx5: Spark rounds the
          // shortest decimal repr, DuckDB the binary double).
          graft.Det.r4(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("net"),
          graft.Det.r4(abs(col("l_discount") - 0.05)).as("disc_dev"),
          graft.Det.r4(log(col("l_extendedprice") + 1)).as("ln_price"),
          graft.Det.r4(pow(col("l_quantity"), 2)).as("qty_sq"),
          ceil(col("l_quantity")).cast("long").as("qty_ceil"),
          floor(col("l_tax") * 100).cast("long").as("tax_pct"),
          when(col("l_quantity") > 25, "bulk").otherwise("small").as("bucket"))
        .orderBy(col("l_orderkey").asc_nulls_first,
          col("l_linenumber").asc_nulls_first)
    }),

    // Higher-order array functions over the embedding vectors: the same
    // codegen'd fold the similarity operators build on (no UDF).
    "q_array_funcs" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          graft.Det.r4(sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))))
            .as("l2_norm"),
          graft.Det.r4(element_at(col("embedding"), 1).cast("double")).as("head"),
          graft.Det.r4(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
            (acc, x) => acc + x.cast("double"))).as("head8_sum"))
        .orderBy(col("vec_id").asc_nulls_first)
    }),

    // JSON field extraction from the events props payload.
    "q_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id").asc_nulls_first)
    }),

    // ANSI-safe arithmetic/casts: Spark 4 runs ANSI mode by default, so
    // division-by-zero and bad casts THROW unless the try_* family is
    // used — the error-tolerant path the reference took for free from
    // dynamic typing (SURVEY §1.2) and a tolerant engine must expose.
    "q_safe_math" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          // null (not an exception) exactly where l_quantity == 25
          graft.Det.r4(try_divide(col("l_extendedprice"),
            col("l_quantity") - lit(25.0))).as("per_excess"),
          // alphabetic flags never parse: try_cast -> null, no throw
          col("l_returnflag").cast("string").as("flag"),
          try_to_number(col("l_returnflag"), lit("999")).isNull.as("flag_nan"))
        .orderBy(col("l_orderkey").asc_nulls_first,
          col("l_linenumber").asc_nulls_first)
    }),

    // MapType surface: per-user event-type counts pivoted into a map
    // column (map_from_entries over the aggregated pairs), then keyed
    // lookups. The map is BUILT from an aggregation — bounded by
    // (user x type), not events — and element_at is a map lookup, not
    // a join.
    "q_map_funcs" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("n"))))).as("m"))
        .select(col("user_id"),
          size(col("m")).as("n_types"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    // Lateral tokenization: one document row -> one row per token, then
    // term frequency (reference R19 shape; NS text analysis).
    "q_explode_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("tf"))
        .orderBy(col("token").asc_nulls_first)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        |  substring(p_name, 1, 5) AS prefix,
        |  concat_ws('|', p_brand, p_type) AS tag,
        |  regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
        |  CAST(levenshtein(p_name, p_type) AS INT) AS edit_dist,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  regexp_replace(p_name, '\s+', '_', 'g') AS slug
        |FROM part ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,
    "q_date_funcs" ->
      """SELECT event_id, date_trunc('day', ts) AS day,
        |  CAST(extract(year FROM ts) AS BIGINT) AS y,
        |  CAST(extract(month FROM ts) AS BIGINT) AS m,
        |  CAST(extract(day FROM ts) AS BIGINT) AS dom,
        |  CAST(extract(hour FROM ts) AS BIGINT) AS h,
        |  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
        |    AS days_in
        |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor((l_extendedprice * (1 - l_discount)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS net,
        |  floor((abs(l_discount - 0.05)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS disc_dev,
        |  floor((ln(l_extendedprice + 1)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS ln_price,
        |  floor((pow(l_quantity, 2)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS qty_sq,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct,
        |  CASE WHEN l_quantity > 25 THEN 'bulk' ELSE 'small' END AS bucket
        |FROM lineitem
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        |  floor((sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS l2_norm,
        |  floor((CAST(embedding[1] AS DOUBLE)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS head,
        |  floor((list_sum(list_transform(embedding[1:8],
        |    x -> CAST(x AS DOUBLE)))) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS head8_sum
        |FROM embeddings ORDER BY vec_id ASC NULLS FIRST""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_explode_tokens" ->
      """SELECT token, count(1) AS tf FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE token <> ''
        |GROUP BY token ORDER BY token ASC NULLS FIRST""".stripMargin,
    "q_safe_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor((l_extendedprice / nullif(l_quantity - 25.0, 0)) * 10000
        |    + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS per_excess,
        |  l_returnflag AS flag,
        |  TRY_CAST(l_returnflag AS DOUBLE) IS NULL AS flag_nan
        |FROM lineitem
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin,
    "q_map_funcs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(1) AS n
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id, CAST(count(*) AS INT) AS n_types,
        |  coalesce(max(CASE WHEN event_type = 'click' THEN n END), 0) AS n_click,
        |  coalesce(max(CASE WHEN event_type = 'purchase' THEN n END), 0)
        |    AS n_purchase
        |FROM c GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin
  )
}
