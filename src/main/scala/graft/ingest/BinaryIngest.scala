package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-file ingestion manifest — the Spark-side half of the
  * reference's PDF intake (R1/R2/R4 analog; reference main.py:88-92
  * scans `docs/`, filters `.pdf`, and skips papers already in the
  * database; tables.py:67-76 opens each file). The container has no PDF
  * codec, so the *content* extraction (camelot, R5) stays out of scope —
  * but everything Spark is responsible for is real: a distributed
  * `binaryFile` scan, a typed (file_name, length, sha256, mod_time)
  * manifest, and the R3 already-ingested skip as one anti-join.
  *
  * Scale notes: the binaryFile source assigns whole files to tasks, so a
  * 100 TB document lake scans embarrassingly parallel. `manifest` without
  * `withSha` never selects `content` — the source prunes the column and
  * no file body is read (footer-only listing). With `withSha`, bodies are
  * hashed where they are read and only the 64-char digest ever moves;
  * raw bytes never shuffle.
  */
object BinaryIngest {

  /** Default docs directory: the reference's own PDF corpus. */
  def defaultDocsDir: String =
    sys.env.getOrElse("GRAFT_DOCS_DIR", "/root/reference/docs")

  /** R1+R2: distributed directory scan with an extension glob
    * (main.py:88-92's `os.listdir` + `.endswith(".pdf")`).
    */
  def scan(spark: SparkSession, dir: String, glob: String = "*.pdf"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** R4 analog: per-file metadata manifest. `withSha = false` keeps the
    * plan content-free (column pruning — no file body is read).
    */
  def manifest(spark: SparkSession, dir: String, glob: String = "*.pdf",
      withSha: Boolean = true): DataFrame = {
    val base = scan(spark, dir, glob).select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
      col("length"),
      col("modificationTime").as("mod_time"),
      col("content"))
    val m =
      if (withSha) base.withColumn("sha256", sha2(col("content"), 256))
      else base
    m.drop("content")
  }

  /** R3: skip files already ingested — the reference's per-paper
    * `in_database` probe (main.py:88-92) as one anti-join on `key`
    * (file_name for name-addressed skip, sha256 for content-addressed).
    */
  def skipIngested(incoming: DataFrame, seen: DataFrame,
      key: String = "file_name"): DataFrame =
    incoming.join(seen.select(col(key)).distinct(), Seq(key), "left_anti")

  /** Binary scan + manifest + paper-skip anti-join over the reference's
    * own PDF corpus. The "seen" set simulates a prior ingest of the
    * pre-2010 compendia, so the query returns the files a fresh run
    * would actually process. Content is never read (no sha — pruned
    * scan); the oracle reads the same directory via DuckDB `read_blob`.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_binary" -> ((s, _) => {
      val m = manifest(s, defaultDocsDir, withSha = false)
        .select(col("file_name"), col("length"))
      val seen = m.filter(col("file_name") < "2010")
      skipIngested(m, seen)
        .orderBy(col("file_name").asc_nulls_first)
    }),

    // R4's PDF-INTERNAL half: each document's own Info dictionary
    // (/Title, /ModDate) parsed from the raw bytes by PdfMeta — a real
    // container walk (trailer /Info ref -> classic object or
    // Inflater-decompressed /ObjStm), not filename heuristics. Runs
    // inside mapPartitions over the binaryFile source: whole files stay
    // task-local, only the two extracted strings move. No oracle
    // (DuckDB has no PDF codec); PdfMetaSuite pins planted synthetic
    // PDFs exactly (both layouts) plus known reference-corpus values
    // derived with an independent parser.
    // R5's lattice half from the vector source (no renderer in this
    // container; see PdfLattice): ruled tables of every corpus PDF as a
    // (file, page, table, row, col, cell) frame. No oracle (DuckDB has
    // no PDF codec); PdfLatticeSuite pins a planted ruled table exactly
    // plus independently-verified reference-corpus cells.
    "q_pdf_tables" -> ((s, _) => {
      import org.apache.spark.sql.functions.col
      PdfLattice.cells(s, defaultDocsDir)
        .orderBy(col("file_name").asc_nulls_first, col("page").asc_nulls_first,
          col("table_idx").asc_nulls_first, col("row_idx").asc_nulls_first,
          col("col_idx").asc_nulls_first)
    }),

    // The reference's ENTIRE ingest dataflow (main.py:83-108) over the
    // real corpus: R4 title gate -> R5 cells -> R6 title join -> R7
    // density -> R8 continuation -> R12 type -> R15 header map -> R17
    // validity -> R16 projection -> R21 row dedup = rad_table, the
    // reference's primary artifact, produced from the same input bytes.
    // No oracle (the input is PDF bytes); PdfIngestSuite pins real part
    // rows and the per-stage semantics.
    // R19/R20 on the REAL corpus: the abbreviation/conventions tables
    // extracted by R5 feed the native abbrev_pairs Generator — the
    // reference's glossary mined from its own PDFs. rows-only;
    // PdfIngestSuite pins known pairs (tid -> total ionizing dose).
    "q_abbrev_ingest" -> ((s, _) => {
      import graft.functions.AbbrevPairsGen.abbrev_pairs_gen
      import org.apache.spark.sql.functions.col
      PdfIngest.abbrevCells(s, defaultDocsDir)
        .select(col("file_name"),
          abbrev_pairs_gen(col("cell")).as(Seq("abbrev", "expansion")))
        .distinct()
        .orderBy(col("file_name").asc_nulls_first,
          col("abbrev").asc_nulls_first, col("expansion").asc_nulls_first)
    }),

    "q_rad_ingest" -> ((s, _) => {
      import org.apache.spark.sql.functions.col
      PdfIngest.radTable(s, defaultDocsDir)
        .orderBy(PdfIngest.radColumns.map(col(_).asc_nulls_first): _*)
    }),

    "q_pdf_meta" -> ((s, _) => {
      import s.implicits._
      scan(s, defaultDocsDir)
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
          col("content"))
        .as[(String, Array[Byte])]
        .mapPartitions(_.map { case (name, bytes) =>
          val (t, md) = PdfMeta.titleModDate(bytes)
          (name, t.orNull, md.orNull)
        })
        .toDF("file_name", "title", "mod_date")
        .orderBy(col("file_name").asc_nulls_first)
    })
  )

  // interpolated, not hardcoded: both sides must honor GRAFT_DOCS_DIR
  val oracle: Map[String, String] = Map(
    "q_scan_binary" ->
      s"""SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
         |  size AS length
         |FROM read_blob('$defaultDocsDir/*.pdf')
         |WHERE regexp_extract(filename, '([^/]+)$$', 1) >= '2010'
         |ORDER BY file_name ASC NULLS FIRST""".stripMargin
  )
}
