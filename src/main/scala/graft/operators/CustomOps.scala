package graft.operators

import graft.Tables
import graft.functions.{AbbrevPairs, RowDensityAgg}
import graft.functions.PartialRatioExpr.partial_ratio
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Custom-semantics operators: the three places the reference's behavior
  * is not expressible with Spark built-ins (SURVEY.md §4.3) —
  * `partial_ratio` fuzzy scoring, the abbreviation-pair UDTF, and the
  * density UDAF — plus the end-to-end fuzzy schema-alignment operator
  * they compose into (reference R15, tables.py:167-203).
  */
object CustomOps {

  /** Canonical schema-category terms the fuzzy mapper aligns physical
    * column names to — the engine-corpus analog of the reference's 10
    * rad_table categories (database.py:83-101).
    */
  val canonicalCategories: Seq[String] = Seq(
    "order key", "part key", "supplier key", "customer key",
    "quantity", "extended price", "discount", "tax", "return flag",
    "ship date", "order date", "total price", "market segment",
    "account balance", "nation key", "retail price")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Scalar fuzzy score via the custom Catalyst expression. No oracle:
    // partial_ratio has no DuckDB equivalent (custom semantics).
    "q_udf_fuzzy_ratio" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"), col("p_type"),
          partial_ratio(col("p_name"), col("p_type")).as("score"))
        .orderBy(col("p_partkey").asc_nulls_first)
    }),

    // UDTF shape (reference R19): parse 'A = B' lines — newlines inside
    // parentheses do NOT split — into generated (abbrev, expansion) rows.
    // Input cells are derived from part attributes to exercise the
    // parenthesis lock. Runs as a native Catalyst Generator inside
    // GenerateExec (AbbrevPairsGen): no intermediate array value, no UDF
    // boundary; the udf+explode array form stays available in SQL as
    // `abbrev_pairs`.
    "q_udtf_abbrev_pairs" -> ((s, d) => {
      import graft.functions.AbbrevPairsGen.abbrev_pairs_gen
      Tables.part(s, d)
        .withColumn("cell",
          concat(lit("PT = "), col("p_type"), lit("\nBR = "), col("p_brand"),
            lit(" (brand\ncode)"), lit("\nSZ = "), col("p_size").cast("string")))
        .select(col("p_partkey"),
          abbrev_pairs_gen(col("cell")).as(Seq("abbrev", "expansion")))
        .orderBy(col("p_partkey").asc_nulls_first, col("abbrev").asc_nulls_first)
    }),

    // Typed density UDAF (reference R7/R17) over the same derived
    // nullable facets as q_filter_null_density; oracle expresses the
    // identical math as avg-of-counts.
    "q_udaf_density" -> ((s, d) => {
      val densityUdaf = udaf(new RowDensityAgg(4))
      Tables.orders(s, d)
        .withColumn("row_nonnull",
          nullif(col("o_orderstatus"), lit("F")).isNotNull.cast("int") +
          nullif(col("o_orderpriority"), lit("3-MEDIUM")).isNotNull.cast("int") +
          when(col("o_totalprice") > 250000, 1).otherwise(0) +
          nullif(col("o_orderstatus"), lit("O")).isNotNull.cast("int"))
        .groupBy(col("o_orderstatus"))
        .agg(graft.Det.r4(densityUdaf(col("row_nonnull"))).as("density"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first)
    }),

    // End-to-end fuzzy schema alignment (reference R15 + R26): align
    // canonical category terms to the corpus's physical column names —
    // header cells x categories score matrix, per-category argmax, keep
    // score >= 75 (the reference's threshold, tables.py:199). HARD
    // ORACLE since round 11, with the same boundary as
    // q_rad_relational_full: the raw partial_ratio score MATRIX is
    // staged to parquet, and the argmax-≥75 derivation (composite-key
    // tie-break included) runs independently in DataFrame algebra here
    // and in DuckDB SQL over the staged matrix, hash-compared.
    "q_fuzzy_header_map" -> ((s, d) => {
      import s.implicits._
      // column names come from the declared corpus schemas — no parquet
      // footer reads for pure metadata
      val headers = graft.Schemas.corpus.toSeq.sortBy(_._1)
        .flatMap { case (n, st) => st.fieldNames.map(f => (n, f)) }
        .toDF("table_name", "column_name")
      val cats = canonicalCategories.toDF("category")
      headers.crossJoin(cats)
        .withColumn("score",
          partial_ratio(regexp_replace(col("column_name"), "^[a-z]+_", ""),
            col("category")))
        .write.mode("overwrite").parquet(headerScoresPath)
      s.read.parquet(headerScoresPath)
        .groupBy(col("category"))
        .agg(
          max_by(struct(col("table_name"), col("column_name")),
            concat(lpad(col("score").cast("string"), 3, "0"), lit("|"),
              col("table_name"), lit("|"), col("column_name"))).as("best"),
          max(col("score")).as("score"))
        .filter(col("score") >= 75)
        .select(col("category"), col("best.table_name").as("table_name"),
          col("best.column_name").as("column_name"), col("score"))
        .orderBy(col("category").asc_nulls_first)
    })
  )

  /** Staged score-matrix path for q_fuzzy_header_map — process-scoped
    * like every other oracle-read staging (see graft.StagePaths).
    */
  private def headerScoresPath: String =
    s"${graft.StagePaths.root}/header_scores"

  val oracle: Map[String, String] = Map(
    // argmax-≥75 over the staged score matrix, with the identical
    // fixed-width composite tie-break key (score is ≤ 100, lpad 3) —
    // the DuckDB arg_max-can't-order-by-struct workaround
    "q_fuzzy_header_map" ->
      s"""WITH sc AS (
         |  SELECT * FROM read_parquet('$headerScoresPath/*.parquet')),
         |k AS (
         |  SELECT category, table_name, column_name, score,
         |    lpad(CAST(score AS VARCHAR), 3, '0') || '|' || table_name
         |      || '|' || column_name AS ck
         |  FROM sc),
         |m AS (SELECT category, max(ck) AS mk FROM k GROUP BY category)
         |SELECT k.category AS category, k.table_name, k.column_name, k.score
         |FROM k JOIN m ON k.category = m.category AND k.ck = m.mk
         |WHERE k.score >= 75
         |ORDER BY k.category ASC NULLS FIRST""".stripMargin,
    "q_udaf_density" ->
      """SELECT o_orderstatus,
        |  floor((avg((CASE WHEN nullif(o_orderstatus,'F') IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN nullif(o_orderpriority,'3-MEDIUM') IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END
        |    + CASE WHEN nullif(o_orderstatus,'O') IS NULL THEN 0 ELSE 1 END) / CAST(4.0 AS DOUBLE)))
        |    * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS density,
        |  count(1) AS n
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,
    // The generator's parse restated for this query's constructed cell:
    // paren-depth-aware line split keeps the "(brand\ncode)" newline
    // INSIDE the br line (a naive newline split would emit a bogus
    // "code)" fragment and lose the parenthetical), first-'=' split,
    // then norm = lowercase + collapse-whitespace + trim on both sides.
    // A parser that mishandled the protected newline hash-mismatches.
    "q_udtf_abbrev_pairs" ->
      """WITH cells AS (
        |  SELECT p_partkey, p_type, p_brand, CAST(p_size AS VARCHAR) AS sz
        |  FROM part)
        |SELECT p_partkey, abbrev, expansion FROM (
        |  SELECT p_partkey, 'pt' AS abbrev,
        |    trim(regexp_replace(lower(p_type), '\s+', ' ', 'g')) AS expansion
        |  FROM cells
        |  UNION ALL
        |  SELECT p_partkey, 'br',
        |    trim(regexp_replace(lower(p_brand || ' (brand
        |code)'), '\s+', ' ', 'g'))
        |  FROM cells
        |  UNION ALL
        |  SELECT p_partkey, 'sz', sz FROM cells)
        |ORDER BY p_partkey ASC NULLS FIRST, abbrev ASC NULLS FIRST""".stripMargin
  )
}
