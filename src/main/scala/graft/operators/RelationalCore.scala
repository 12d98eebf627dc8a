package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scans, filters, projections — pure Spark built-ins.
  *
  * Generalizes the reference's ingest dataflow (reference main.py:88-92
  * directory scan + extension filter; tables.py:89 density gate;
  * tables.py:216-242 canonical projection) into a declarative query
  * surface. Every query here is Catalyst-optimized end-to-end: filters and
  * projections reach the parquet scan (PushedFilters / ReadSchema), which
  * is the property that keeps these plans viable at 100 TB.
  *
  * Determinism contract (SURVEY.md §2.2 notes): every oracle query ends in
  * a total ORDER BY with explicit NULLS FIRST, floats are rounded to 4
  * decimals on both sides, aggregates are cast to stable types.
  */
object RelationalCore {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Columnar scan + projection + predicate: pushdown does the work.
    "q_scan_parquet" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
        .filter(col("l_quantity") > 30)
        .orderBy(col("l_orderkey").asc_nulls_first,
          col("l_linenumber").asc_nulls_first)
    }),

    // CSV round-trip (reference R9/R10 csv_check, tables.py:99-115):
    // stage a bounded dim table to CSV, read it back with an explicit
    // schema. The staging dir doubles as the two-phase-write analog of the
    // reference's human-review checkpoint.
    "q_scan_csv" -> ((s, d) => {
      val stage = s"${graft.StagePaths.root}/region_csv"
      Tables.region(s, d).orderBy("r_regionkey").coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(stage)
      s.read.option("header", "true")
        .schema("r_regionkey INT, r_name STRING")
        .csv(stage)
        .orderBy(col("r_regionkey").asc_nulls_first)
    }),

    // Conjunctive predicates + regex word-boundary containment
    // (reference R2/R13: s_c_w word-boundary match, tables.py:140-141).
    "q_filter_predicate" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("text").rlike("(?i)\\bjoin\\b") &&
          col("n_chars") > 200 && col("lang") =!= "zh")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Row-validity filter on null density (reference R7/R17,
    // tables.py:244-249 + 252-263: mapped-value density >= 0.5 keeps row).
    // The corpus has no natural nulls, so nullable facets are derived with
    // nullif — identical on the DuckDB side.
    "q_filter_null_density" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("f1", nullif(col("o_orderstatus"), lit("F")))
        .withColumn("f2", nullif(col("o_orderpriority"), lit("3-MEDIUM")))
        .withColumn("f3", when(col("o_totalprice") > 250000, col("o_totalprice")))
        .withColumn("f4", nullif(col("o_orderstatus"), lit("O")))
      o.withColumn("density",
          (coalesce(col("f1").isNotNull.cast("int"), lit(0)) +
           coalesce(col("f2").isNotNull.cast("int"), lit(0)) +
           coalesce(col("f3").isNotNull.cast("int"), lit(0)) +
           coalesce(col("f4").isNotNull.cast("int"), lit(0))) / lit(4.0))
        .filter(col("density") >= 0.5)
        .select(col("o_orderkey"), col("density"))
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Footer-stats aggregate: COUNT/MIN/MAX answered from parquet
    // row-group metadata via v2 aggregate pushdown — no row data read
    // (PushedAggregation plan-asserted in ScalePatternsSuite; the
    // v2-source confs are scoped inside footerAgg so the rest of the
    // session keeps its v1 plans).
    "q_scan_agg_pushdown" -> ((s, d) =>
      ScalePatterns.footerAgg(s, s"$d/lineitem.parquet",
        Seq("l_orderkey", "l_quantity"))),

    // Canonical-schema projection + string normalization (reference
    // R16/R18: map_row tables.py:216-242; whitespace collapse
    // tables.py:178/230, database.py:28).
    "q_project_rename" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          col("doc_id").as("id"),
          lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("body"),
          col("lang").as("language"),
          col("source").as("source_paper"),
          col("n_chars").as("len"))
        .orderBy(col("id").asc_nulls_first)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 30
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin,
    "q_scan_csv" ->
      s"""SELECT r_regionkey, r_name
        |FROM read_csv('${graft.StagePaths.root}/region_csv/*.csv', header=true,
        |  columns={'r_regionkey':'INT','r_name':'VARCHAR'})
        |ORDER BY r_regionkey ASC NULLS FIRST""".stripMargin,
    "q_filter_predicate" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE regexp_matches(text, '(?i)\bjoin\b') AND n_chars > 200 AND lang <> 'zh'
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_filter_null_density" ->
      """SELECT o_orderkey,
        |  (CASE WHEN nullif(o_orderstatus,'F') IS NULL THEN 0 ELSE 1 END
        |   + CASE WHEN nullif(o_orderpriority,'3-MEDIUM') IS NULL THEN 0 ELSE 1 END
        |   + CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END
        |   + CASE WHEN nullif(o_orderstatus,'O') IS NULL THEN 0 ELSE 1 END) / CAST(4.0 AS DOUBLE)
        |    AS density
        |FROM orders
        |WHERE (CASE WHEN nullif(o_orderstatus,'F') IS NULL THEN 0 ELSE 1 END
        |   + CASE WHEN nullif(o_orderpriority,'3-MEDIUM') IS NULL THEN 0 ELSE 1 END
        |   + CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END
        |   + CASE WHEN nullif(o_orderstatus,'O') IS NULL THEN 0 ELSE 1 END) / CAST(4.0 AS DOUBLE) >= 0.5
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_scan_agg_pushdown" ->
      """SELECT count(1) AS n_rows,
        |  min(l_orderkey) AS min_l_orderkey, max(l_orderkey) AS max_l_orderkey,
        |  min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity
        |FROM lineitem""".stripMargin,
    "q_project_rename" ->
      """SELECT doc_id AS id,
        |  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS body,
        |  lang AS language, source AS source_paper, n_chars AS len
        |FROM documents ORDER BY id ASC NULLS FIRST""".stripMargin
  )
}
