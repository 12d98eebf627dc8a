package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lakehouse maintenance + data-quality operators: MERGE-style upsert
  * (the engine's R22/R23 bulk-CRUD generalized to one atomic
  * update-or-insert pass), per-column table profiling, text
  * normalization, and the batch-equivalent of streaming dedup.
  *
  * The upsert is the full-outer-join formulation every lakehouse MERGE
  * lowers to: one shuffle on the key, coalesce per column; at 100 TB the
  * delta side is typically small enough to broadcast, turning MERGE into
  * a map-side stitch.
  */
object QualityOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MERGE INTO semantics: a deterministic delta (1/97 of keys updated:
    // status 'U', price +10%; 1/101 re-keyed past max as inserts, status
    // 'N') full-outer-joined to the target, delta winning per column.
    // Insert keys are max+rank: the rank comes from the parallel
    // range-partition + zipWithIndex pattern (ScalePatterns.withGlobalRank)
    // — identical values to a global row_number (the sort key is unique)
    // with no single-task window, so even a "big delta" merge scales.
    "q_merge_upsert" -> ((s, d) => {
      val t = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val upd = t.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), lit("U").as("d_status"),
          (col("o_totalprice") * 1.1).as("d_price"))
      val maxk = t.agg(max(col("o_orderkey")).as("mk"))
      val ins = ScalePatterns.withGlobalRank(
          t.filter(col("o_orderkey") % 101 === 0), "rn",
          col("o_orderkey").asc)
        .crossJoin(broadcast(maxk))
        .select((col("mk") + col("rn")).as("o_orderkey"),
          lit("N").as("d_status"), col("o_totalprice").as("d_price"))
      val delta = upd.unionByName(ins)
      t.join(delta, Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"),
          coalesce(col("d_status"), col("o_orderstatus")).as("status"),
          Det.r4(coalesce(col("d_price"), col("o_totalprice"))).as("price"))
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Table profiling (data-quality audit): one aggregation pass
    // computing count/nulls/distinct/min/max per column, melted to one
    // row per column. Output is bounded by column count, not rows;
    // distinct counts are exact (swap in approx_count_distinct at the
    // 100 TB tier).
    "q_profile_table" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      def prof(c: String, minS: org.apache.spark.sql.Column,
          maxS: org.apache.spark.sql.Column) =
        struct(lit(c).as("column"), count(lit(1)).as("n_rows"),
          count(when(col(c).isNull, lit(1))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          minS.cast("string").as("min_s"), maxS.cast("string").as("max_s"))
      l.agg(
        prof("l_quantity", Det.r4(min(col("l_quantity"))),
          Det.r4(max(col("l_quantity")))).as("p1"),
        prof("l_returnflag", min(col("l_returnflag")),
          max(col("l_returnflag"))).as("p2"),
        prof("l_discount", Det.r4(min(col("l_discount"))),
          Det.r4(max(col("l_discount")))).as("p3"),
        prof("l_suppkey", min(col("l_suppkey")),
          max(col("l_suppkey"))).as("p4"))
        .select(explode(array(col("p1"), col("p2"), col("p3"), col("p4")))
          .as("p"))
        .select(col("p.column"), col("p.n_rows"), col("p.n_null"),
          col("p.n_distinct"), col("p.min_s"), col("p.max_s"))
        .orderBy(col("column").asc_nulls_first)
    }),

    // Text normalization: plant deterministic case/punctuation noise,
    // then lower -> strip non-alphanumerics -> collapse runs of spaces
    // -> trim. Map-only scan; the emitted delta length audits how much
    // was scrubbed.
    "q_text_normalize" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("noisy", concat(
          upper(substring(col("text"), 1, 20)), lit("!! "), col("text")))
        .withColumn("norm", trim(regexp_replace(regexp_replace(
          lower(col("noisy")), "[^a-z0-9 ]", ""), " +", " ")))
        .select(col("doc_id"),
          substring(col("norm"), 1, 60).as("norm_head"),
          (length(col("noisy")) - length(col("norm"))).as("n_stripped"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // URL field extraction (training-data provenance parsing): host,
    // path, and query string pulled from synthesized per-doc URLs with
    // portable regexes (no parse_url — DuckDB lacks it). Map-only scan.
    "q_url_extract" -> ((s, d) => {
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/docs/"), col("lang"), lit("/"),
        col("doc_id").cast("string"), lit("?rev="), (col("doc_id") % 7).cast("string"))
      Tables.documents(s, d)
        .withColumn("url", url)
        .select(col("doc_id"), col("url"),
          regexp_extract(col("url"), "^https?://([^/]+)/", 1).as("host"),
          regexp_extract(col("url"), "^https?://[^/]+(/[^?]*)", 1).as("path"),
          regexp_extract(col("url"), "\\?(.*)$", 1).as("query"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // URL-canonicalization dedup (training-corpus provenance dedup):
    // noisy per-doc URL variants (tracking params, fragments, host case,
    // www. prefix — deterministic by doc_id) collapse to one canonical
    // form — strip fragment, strip utm_* params, lowercase scheme+host,
    // drop www. — then one keeper per canonical URL. Map-only
    // canonicalization + one partial-agg'd groupBy; the regexes avoid
    // backreferences (Spark uses $1, DuckDB \1) so the oracle states the
    // IDENTICAL pipeline. Spark's regexp_replace is replace-ALL; the
    // oracle passes DuckDB's 'g' flag on the utm_* strip so both engines
    // state the same semantics even with multiple tracking params.
    "q_dedup_url" -> ((s, d) => {
      val page = (col("doc_id") % 50).cast("string")
      val base = concat(lit("https://"), col("source"),
        lit(".example.com/docs/"), col("lang"), lit("/"), page,
        lit("?rev="), ((col("doc_id") % 50) % 7).cast("string"))
      val v = col("doc_id") % 4
      val noisy = when(v === 0, concat(base, lit("&utm_source=feed")))
        .when(v === 1, concat(base, lit("#sec")))
        .when(v === 2, concat(
          upper(regexp_extract(base, "^[A-Za-z]+://[^/]+", 0)),
          regexp_extract(base, "^[A-Za-z]+://[^/]+(.*)$", 1)))
        .otherwise(regexp_replace(base, "^https://", "https://www."))
      Tables.documents(s, d)
        .withColumn("noisy_url", noisy)
        .withColumn("c1", regexp_replace(col("noisy_url"), "#.*$", ""))
        .withColumn("c2",
          regexp_replace(col("c1"), "&utm_[a-z_]*=[^&#]*", ""))
        .withColumn("canon_url", regexp_replace(
          concat(lower(regexp_extract(col("c2"), "^[A-Za-z]+://[^/]+", 0)),
            regexp_extract(col("c2"), "^[A-Za-z]+://[^/]+(.*)$", 1)),
          "://www\\.", "://"))
        .groupBy(col("canon_url"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .orderBy(col("canon_url").asc_nulls_first)
    }),

    // The reference's tolerant measurement parser (R12; '<1', '>50',
    // '50-300', 'HDR~65 LDR~30' as observed in its golden db) under the
    // oracle gate: deterministic measurement strings are synthesized
    // from order keys, parsed by Ingest.parseMeasurement, and the struct
    // flattened. Map-only scan; the regexes are RE2/Java-portable.
    "q_parse_measurements" -> ((s, d) => {
      val k = col("o_orderkey")
      val raw = when(k % 5 === 0, concat(lit("<"), (k % 97).cast("string")))
        .when(k % 5 === 1, concat(lit(">"), (k % 97).cast("string")))
        .when(k % 5 === 2, concat((k % 50).cast("string"), lit("-"),
          (k % 50 + 25).cast("string")))
        .when(k % 5 === 3, concat(lit("HDR~"), (k % 80).cast("string"),
          lit(" LDR~"), (k % 30).cast("string")))
        .otherwise((k % 100).cast("string"))
      Tables.orders(s, d)
        .withColumn("m", graft.ingest.Ingest.parseMeasurement(raw))
        .select(col("o_orderkey"), col("m.raw"), col("m.op"),
          col("m.value"), col("m.value_hi"))
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Batch-equivalent of streaming deduplication (dropDuplicates over a
    // keyed stream): first event per (user_id, event_type) plus the
    // number of duplicates dropped. The streaming form
    // (dropDuplicatesWithinWatermark) is exercised in StreamingSuite;
    // this form is its deterministic whole-input answer.
    // Snapshot diff (CDC classification): given two versions of a keyed
    // table, classify every key as inserted / deleted / updated /
    // unchanged — the inverse of q_merge_upsert (which APPLIES a delta,
    // while this COMPUTES one). One full-outer join on the key; the
    // summary is a 4-row partial-agg'd rollup of it. Synthetic versions
    // carved deterministically from orders so the oracle states the
    // identical derivation.
    "q_snapshot_diff" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val before = o.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey").as("k"),
          graft.Det.r4(col("o_totalprice")).as("v_before"))
      val after = o.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey").as("k2"),
          graft.Det.r4(when(col("o_orderkey") % 3 === 0,
            col("o_totalprice") * 1.1).otherwise(col("o_totalprice")))
            .as("v_after"))
      before.join(after, col("k") === col("k2"), "full_outer")
        .withColumn("change",
          when(col("k").isNull, "inserted")
            .when(col("k2").isNull, "deleted")
            .when(col("v_before") =!= col("v_after"), "updated")
            .otherwise("unchanged"))
        .groupBy(col("change"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("change").asc_nulls_first)
    }),

    // Constraint validation over the warehouse: key uniqueness and
    // referential integrity as data (check, n_violations) rows, not
    // schema declarations — what replaces the reference's per-row
    // EXISTS probes (database.py:43-61) when constraints are audited in
    // bulk. Uniqueness = one partial-agg'd count vs count(DISTINCT);
    // every FK orphan check is a single anti-join. All checks union
    // into one result so the audit is one job.
    "q_integrity_audit" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val cust = Tables.customer(s, d)
      def unique(name: String, df: org.apache.spark.sql.DataFrame,
          key: String) =
        df.agg((count(lit(1)) - countDistinct(col(key))).as("n_violations"))
          .select(lit(name).as("check"), col("n_violations"))
      def orphans(name: String, child: org.apache.spark.sql.DataFrame,
          fk: String, parent: org.apache.spark.sql.DataFrame, pk: String) =
        child.join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("check"), col("n_violations"))
      unique("orders_pk_unique", orders, "o_orderkey")
        .unionByName(unique("customer_pk_unique", cust, "c_custkey"))
        .unionByName(orphans("lineitem_orderkey_fk", li, "l_orderkey",
          orders, "o_orderkey"))
        .unionByName(orphans("orders_custkey_fk", orders, "o_custkey",
          cust, "c_custkey"))
        .orderBy(col("check").asc_nulls_first)
    }),

    "q_stream_dedup" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("ts")).as("first_ts"),
          (count(lit(1)) - 1).as("n_dropped"))
        .orderBy(col("user_id").asc_nulls_first,
          col("event_type").asc_nulls_first)
    })
  )

  private def r4sql(inner: String, alias: String) =
    s"floor(($inner) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS $alias"

  val oracle: Map[String, String] = Map(
    "q_snapshot_diff" ->
      """WITH before_v AS (
        |  SELECT o_orderkey AS k,
        |    floor((o_totalprice) * 10000 + CAST(0.5 AS DOUBLE))
        |      / CAST(10000 AS DOUBLE) AS v_before
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |after_v AS (
        |  SELECT o_orderkey AS k2,
        |    floor((CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
        |      ELSE o_totalprice END) * 10000 + CAST(0.5 AS DOUBLE))
        |      / CAST(10000 AS DOUBLE) AS v_after
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |d AS (
        |  SELECT CASE WHEN k IS NULL THEN 'inserted'
        |    WHEN k2 IS NULL THEN 'deleted'
        |    WHEN v_before <> v_after THEN 'updated'
        |    ELSE 'unchanged' END AS change
        |  FROM before_v FULL OUTER JOIN after_v ON k = k2)
        |SELECT change, count(1) AS n FROM d GROUP BY change
        |ORDER BY change ASC NULLS FIRST""".stripMargin,
    "q_integrity_audit" ->
      """SELECT 'customer_pk_unique' AS "check",
        |  count(1) - count(DISTINCT c_custkey) AS n_violations FROM customer
        |UNION ALL
        |SELECT 'lineitem_orderkey_fk',
        |  (SELECT count(1) FROM lineitem
        |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |UNION ALL
        |SELECT 'orders_custkey_fk',
        |  (SELECT count(1) FROM orders
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |UNION ALL
        |SELECT 'orders_pk_unique',
        |  count(1) - count(DISTINCT o_orderkey) FROM orders
        |ORDER BY "check" ASC NULLS FIRST""".stripMargin,
    "q_merge_upsert" ->
      s"""WITH t AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         |upd AS (
         |  SELECT o_orderkey, 'U' AS d_status,
         |    o_totalprice * 1.1 AS d_price
         |  FROM t WHERE o_orderkey % 97 = 0),
         |mk AS (SELECT max(o_orderkey) AS mk FROM t),
         |ins AS (
         |  SELECT mk.mk + row_number() OVER (ORDER BY o_orderkey ASC)
         |      AS o_orderkey,
         |    'N' AS d_status, o_totalprice AS d_price
         |  FROM t CROSS JOIN mk WHERE o_orderkey % 101 = 0),
         |delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
         |SELECT coalesce(t.o_orderkey, delta.o_orderkey) AS o_orderkey,
         |  coalesce(delta.d_status, t.o_orderstatus) AS status,
         |  ${r4sql("coalesce(delta.d_price, t.o_totalprice)", "price")}
         |FROM t FULL OUTER JOIN delta ON t.o_orderkey = delta.o_orderkey
         |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_profile_table" ->
      s"""WITH p AS (
         |  SELECT 'l_quantity' AS "column", count(1) AS n_rows,
         |    count(CASE WHEN l_quantity IS NULL THEN 1 END) AS n_null,
         |    count(DISTINCT l_quantity) AS n_distinct,
         |    CAST(floor(min(l_quantity) * 10000 + CAST(0.5 AS DOUBLE))
         |      / CAST(10000 AS DOUBLE) AS VARCHAR) AS min_s,
         |    CAST(floor(max(l_quantity) * 10000 + CAST(0.5 AS DOUBLE))
         |      / CAST(10000 AS DOUBLE) AS VARCHAR) AS max_s
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'l_returnflag', count(1),
         |    count(CASE WHEN l_returnflag IS NULL THEN 1 END),
         |    count(DISTINCT l_returnflag),
         |    CAST(min(l_returnflag) AS VARCHAR),
         |    CAST(max(l_returnflag) AS VARCHAR)
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'l_discount', count(1),
         |    count(CASE WHEN l_discount IS NULL THEN 1 END),
         |    count(DISTINCT l_discount),
         |    CAST(floor(min(l_discount) * 10000 + CAST(0.5 AS DOUBLE))
         |      / CAST(10000 AS DOUBLE) AS VARCHAR) AS min_s,
         |    CAST(floor(max(l_discount) * 10000 + CAST(0.5 AS DOUBLE))
         |      / CAST(10000 AS DOUBLE) AS VARCHAR) AS max_s
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'l_suppkey', count(1),
         |    count(CASE WHEN l_suppkey IS NULL THEN 1 END),
         |    count(DISTINCT l_suppkey),
         |    CAST(min(l_suppkey) AS VARCHAR),
         |    CAST(max(l_suppkey) AS VARCHAR)
         |  FROM lineitem)
         |SELECT "column", n_rows, n_null, n_distinct, min_s, max_s
         |FROM p ORDER BY "column" ASC NULLS FIRST""".stripMargin,
    "q_text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    upper(substring(text, 1, 20)) || '!! ' || text AS noisy
        |  FROM documents)
        |SELECT doc_id,
        |  substring(trim(regexp_replace(regexp_replace(
        |    lower(noisy), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, 60)
        |    AS norm_head,
        |  CAST(length(noisy) - length(trim(regexp_replace(regexp_replace(
        |    lower(noisy), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
        |    AS INT) AS n_stripped
        |FROM n ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_url_extract" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/docs/' || lang || '/' ||
        |    CAST(doc_id AS VARCHAR) || '?rev=' || CAST(doc_id % 7 AS VARCHAR)
        |      AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |  regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
        |  regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '\?(.*)$', 1) AS query
        |FROM u ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_dedup_url" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/docs/' || lang || '/' ||
        |    CAST(doc_id % 50 AS VARCHAR) || '?rev=' ||
        |    CAST((doc_id % 50) % 7 AS VARCHAR) AS base
        |  FROM documents),
        |n AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN doc_id % 4 = 0 THEN base || '&utm_source=feed'
        |      WHEN doc_id % 4 = 1 THEN base || '#sec'
        |      WHEN doc_id % 4 = 2 THEN
        |        upper(regexp_extract(base, '^[A-Za-z]+://[^/]+', 0)) ||
        |        regexp_extract(base, '^[A-Za-z]+://[^/]+(.*)$', 1)
        |      ELSE regexp_replace(base, '^https://', 'https://www.')
        |    END AS noisy
        |  FROM b),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      lower(regexp_extract(
        |        regexp_replace(regexp_replace(noisy, '#.*$', ''),
        |          '&utm_[a-z_]*=[^&#]*', '', 'g'),
        |        '^[A-Za-z]+://[^/]+', 0)) ||
        |      regexp_extract(
        |        regexp_replace(regexp_replace(noisy, '#.*$', ''),
        |          '&utm_[a-z_]*=[^&#]*', '', 'g'),
        |        '^[A-Za-z]+://[^/]+(.*)$', 1),
        |      '://www\.', '://') AS canon_url
        |  FROM n)
        |SELECT canon_url, count(1) AS n_docs, min(doc_id) AS keeper
        |FROM c GROUP BY canon_url
        |ORDER BY canon_url ASC NULLS FIRST""".stripMargin,
    "q_parse_measurements" ->
      """WITH r AS (
        |  SELECT o_orderkey,
        |    CASE
        |      WHEN o_orderkey % 5 = 0
        |        THEN '<' || CAST(o_orderkey % 97 AS VARCHAR)
        |      WHEN o_orderkey % 5 = 1
        |        THEN '>' || CAST(o_orderkey % 97 AS VARCHAR)
        |      WHEN o_orderkey % 5 = 2
        |        THEN CAST(o_orderkey % 50 AS VARCHAR) || '-' ||
        |             CAST(o_orderkey % 50 + 25 AS VARCHAR)
        |      WHEN o_orderkey % 5 = 3
        |        THEN 'HDR~' || CAST(o_orderkey % 80 AS VARCHAR) ||
        |             ' LDR~' || CAST(o_orderkey % 30 AS VARCHAR)
        |      ELSE CAST(o_orderkey % 100 AS VARCHAR)
        |    END AS raw
        |  FROM orders)
        |SELECT o_orderkey, raw,
        |  CASE
        |    WHEN regexp_matches(raw, '^\s*<') THEN '<'
        |    WHEN regexp_matches(raw, '^\s*>') THEN '>'
        |    WHEN regexp_matches(raw, '^\s*\d+(\.\d+)?\s*-\s*\d') THEN 'range'
        |    WHEN regexp_matches(raw, '~') THEN 'approx'
        |    WHEN regexp_matches(raw, '^\s*\d') THEN '='
        |    ELSE NULL
        |  END AS op,
        |  CAST(nullif(regexp_extract(raw, '(\d+(?:\.\d+)?)', 1), '')
        |    AS DOUBLE) AS value,
        |  CAST(nullif(regexp_extract(raw, '\d+(?:\.\d+)?\s*-\s*(\d+(?:\.\d+)?)', 1), '')
        |    AS DOUBLE) AS value_hi
        |FROM r ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_stream_dedup" ->
      """SELECT user_id, event_type, min(ts) AS first_ts,
        |  count(1) - 1 AS n_dropped
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin
  )
}
