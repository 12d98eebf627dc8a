package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Declared schemas (reference R25: `create_tables`, database.py:75-278)
  * as Catalyst `StructType`s.
  *
  * Two families:
  *   - the engine corpus (TESTDATA.md / FIXTURES.md §A) — what the
  *     queries read;
  *   - the reference's canonical output schemas — paper/abbreviation/
  *     rad_table (database.py:77-116) and the six part-category tables
  *     generated from a shared base plus per-category field blocks
  *     (database.py:244-278), reproducing the reference's
  *     single-table-inheritance-flattened design.
  *
  * Type choices follow FIXTURES.md §B1: columns the reference declares
  * as BOOL/INTEGER but actually fills with Y/N/free-text/title strings
  * (`spec`, `source_paper` — SURVEY.md §1.2) are StringType here, with
  * the measurement columns kept as raw strings for
  * `Ingest.parseMeasurement`.
  */
object Schemas {

  private def s(names: String*): Seq[StructField] =
    names.map(StructField(_, StringType, nullable = true))

  // --- canonical reference schemas -----------------------------------

  val paperTable: StructType = StructType(
    StructField("id", LongType, nullable = false) +:
    s("title", "scope", "authors"))

  val abbreviationTable: StructType = StructType(
    StructField("id", LongType, nullable = false) +:
    (s("abbreviation", "expansion") :+
      StructField("source_papers", ArrayType(StringType), nullable = true)))

  /** rad_table (database.py:83-101): 17 columns. */
  val radTable: StructType = StructType(
    StructField("id", LongType, nullable = false) +:
    s("part_number", "manufacturer", "tester_id", "device_function",
      "category", "technology", "principal_investigator", "results",
      "spec", "dose_rate", "proton_energy", "degradation_level",
      "proton_fluence", "misc_info", "source_paper",
      "source_paper_filename"))

  /** Shared base of the six part-category tables (database.py:257-276). */
  val partBase: Seq[StructField] =
    StructField("id", LongType, nullable = false) +:
    (s("part_number", "manufacturer", "device_type", "technology",
      "supply_voltage", "voltage_rating", "temperature_range", "package",
      "datasheet") :+ StructField("rad_id", LongType, nullable = true))

  /** Per-category field blocks (database.py:118-224). */
  val partCategoryFields: Map[String, Seq[StructField]] = Map(
    "operational_amplifiers" ->
      s("gain_bandwidth", "slew_rate", "input_offset_voltage", "quiescent_current"),
    "memory" ->
      s("capacity", "organization", "access_time", "interface"),
    "transistors" ->
      s("polarity", "collector_current", "breakdown_voltage", "gain_hfe"),
    "voltage_references" ->
      s("reference_voltage", "tolerance", "temperature_coefficient"),
    "voltage_regulators" ->
      s("output_voltage", "output_current", "dropout_voltage"),
    "diodes" ->
      s("diode_type", "forward_voltage", "reverse_voltage", "recovery_time"))

  /** The six specialized tables, generated base + block, mirroring the
    * reference's loop (database.py:244-278).
    */
  val partCategoryTables: Map[String, StructType] =
    partCategoryFields.map { case (name, fields) =>
      name -> StructType(partBase ++ fields)
    }

  /** All canonical tables by name (the reference's 9 CREATE TABLEs). */
  val canonicalTables: Map[String, StructType] =
    Map("paper_table" -> paperTable,
      "abbreviation_table" -> abbreviationTable,
      "rad_table" -> radTable) ++ partCategoryTables

  /** R25 analog: register every canonical table in the session catalog
    * (empty, managed parquet) if absent — `CREATE TABLE IF NOT EXISTS`.
    */
  def createTables(spark: SparkSession): Unit =
    canonicalTables.foreach { case (name, schema) =>
      if (!spark.catalog.tableExists(name)) {
        spark.catalog.createTable(name, "parquet", schema,
          Map.empty[String, String])
      }
    }

  // --- engine corpus schemas (FIXTURES.md §A) ------------------------

  val corpus: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))),
    // events.ts: TIMESTAMP(NANOS) parquet, surfaced as micros
    // TimestampType by graft.Tables.events (nanosAsLong + conversion)
    "events" -> StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))
}
