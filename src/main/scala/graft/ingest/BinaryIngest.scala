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

  /** Process-scoped staging root for the oracle-checkable relational
    * queries — see graft.StagePaths for the race/lifetime contract.
    */
  private[ingest] def stageRoot: String = graft.StagePaths.root

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

    // R19 -> R20 COMPOSED on the real corpus — the composition the
    // reference intends at main.py:45-50 but never wires (its
    // abbreviation_expansion is a behavioral no-op): mine the glossary
    // from the corpus's own abbreviation tables, canonicalize one
    // expansion per abbreviation (min — deterministic under glossary
    // growth), then expand whole-word matches through the rad_table's
    // descriptive columns. Broadcast-dictionary map-only shape: the
    // glossary is K-bounded model state; the corpus side never
    // shuffles before the presentation sort. rows-only; PdfIngestSuite
    // pins a known expansion in context.
    "q_abbrev_expand" -> ((s, _) => {
      import graft.functions.AbbrevPairsGen.abbrev_pairs_gen
      import org.apache.spark.sql.functions.{col, min}
      val glossary = PdfIngest.abbrevCells(s, defaultDocsDir)
        .select(abbrev_pairs_gen(col("cell")).as(Seq("abbrev", "expansion")))
        .groupBy(col("abbrev")).agg(min(col("expansion")).as("expansion"))
        .orderBy(col("abbrev").asc_nulls_first)
      Ingest.expandAbbreviations(
        PdfIngest.radTable(s, defaultDocsDir),
        Seq("device_function", "technology", "results"), glossary)
        .select(col("part_number"), col("manufacturer"),
          col("device_function"), col("technology"), col("results"),
          col("source_paper_filename"))
        .orderBy(Seq("part_number", "manufacturer", "device_function",
          "technology", "results", "source_paper_filename")
          .map(col(_).asc_nulls_first): _*)
    }),

    // The ingest RELATIONAL TAIL under the hard oracle: the PDF-codec
    // stages (R5 lattice, R6 title walk, R15 fuzzy scoring — things a
    // SQL engine cannot do) are staged to parquet as plain relational
    // frames, then the R7 density -> R8 continuation -> R12 type ->
    // R17 validity -> R16 projection -> R21 dedup tail is derived from
    // those frames HERE in DataFrame algebra and INDEPENDENTLY by
    // DuckDB over the same files — hash-compared row for row. Density
    // gates use integer arithmetic (4·filled > cells) so no float
    // boundary can diverge between engines.
    "q_rad_relational" -> ((s, _) => {
      import s.implicits._
      val cellsPath = s"$stageRoot/rad_cells"
      val mapPath = s"$stageRoot/rad_hmap"
      val staged = scan(s, defaultDocsDir)
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
          col("content"))
        .as[(String, Array[Byte])]
      staged.mapPartitions(_.flatMap { case (n, b) =>
          PdfIngest.stageRowsOf(n, b)._1
        })
        .toDF("file_name", "table_uid", "title", "source_paper",
          "row_idx", "col_idx", "cell")
        .write.mode("overwrite").parquet(cellsPath)
      staged.mapPartitions(_.flatMap { case (n, b) =>
          PdfIngest.stageRowsOf(n, b)._2
        })
        .toDF("file_name", "root_uid", "category", "col_idx")
        .write.mode("overwrite").parquet(mapPath)
      val c = s.read.parquet(cellsPath)
      val m = s.read.parquet(mapPath)
      // R7: per-table density gate, integer-exact
      val tab = c.groupBy(col("file_name"), col("table_uid"), col("title"),
          col("source_paper"))
        .agg(count(lit(1)).as("n_cells"),
          sum((col("cell") =!= "").cast("long")).as("n_filled"))
      val gated = tab.filter(col("n_filled") * 4 > col("n_cells"))
      // R8: every gated table folds into the last TITLED gated table
      // before it (its root); titleless tables with no root drop
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("file_name")).orderBy(col("table_uid").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val rooted = gated.withColumn("root_uid",
          max(when(col("title") =!= "", col("table_uid"))).over(w))
        .filter(col("root_uid").isNotNull)
      // R12 word-boundary typing on the ROOT title, first-rule-wins
      val radRoots = rooted.filter(col("table_uid") === col("root_uid"))
        .filter(!col("title").rlike("(?i)\\b(principal|investigator)\\b") &&
          !col("title").rlike("(?i)\\b(acronym|abbreviations)\\b") &&
          col("title").rlike(
            "(?i)\\b(tid|see|dd|ddd|seu|let|ongoing|dose|result)\\b"))
        .select(col("file_name"), col("root_uid"), col("source_paper"))
      val members = rooted
        .select(col("file_name"), col("table_uid"), col("root_uid"))
        .join(radRoots.select(col("file_name"), col("root_uid")),
          Seq("file_name", "root_uid"))
      // data rows: row 0 of every member is the (repeated) header
      val mapped = c
        .select(col("file_name"), col("table_uid"), col("row_idx"),
          col("col_idx"), col("cell"))
        .filter(col("row_idx") > 0)
        .join(members, Seq("file_name", "table_uid"))
        .join(m, Seq("file_name", "root_uid", "col_idx"))
      // R16 projection + R17 validity (>= 3 non-empty mapped values:
      // the reference's (count + 2 provenance) / 10 >= 0.5)
      val cats = PdfIngest.headerCategories
      val aggs = sum((col("cell") =!= "").cast("long")).as("nv") +:
        cats.map(cat => max(when(col("category") === cat,
          regexp_replace(col("cell"), "\n", " ")))
          .as(cat.replace(' ', '_')))
      val pivoted = mapped
        .groupBy(col("file_name"), col("root_uid"), col("table_uid"),
          col("row_idx"))
        .agg(aggs.head, aggs.tail: _*)
        .filter(col("nv") >= 3)
      pivoted
        .join(radRoots, Seq("file_name", "root_uid"))
        .select(cats.map(cat => col(cat.replace(' ', '_'))) ++
          Seq(col("source_paper"),
            col("file_name").as("source_paper_filename")): _*)
        .distinct()
        .orderBy(PdfIngest.radColumns.map(col(_).asc_nulls_first): _*)
    }),

    // q_rad_relational with the oracle boundary pushed TWO STAGES
    // deeper: R6's nearest-above title walk and R15's argmax-≥75
    // header map are no longer staged as pre-joined inputs — only raw
    // per-page line/table GEOMETRY and the raw partial_ratio SCORE
    // MATRIX are staged, and the walk (strict running-minima of
    // squared distance + the two-line-title merge) and the argmax are
    // derived in DataFrame algebra here AND independently in DuckDB
    // SQL, hash-compared. See PdfIngest.stageGeomOf for why the
    // sequential walk is exactly a running-minima scan.
    "q_rad_relational_full" -> ((s, _) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val linesPath = s"$stageRoot/rad_lines"
      val tgeoPath = s"$stageRoot/rad_tgeo"
      val cellsPath = s"$stageRoot/rad_cells_raw"
      val scoresPath = s"$stageRoot/rad_scores"
      val staged = scan(s, defaultDocsDir)
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
          col("content"))
        .as[(String, Array[Byte])]
      staged.mapPartitions(_.flatMap { case (n, b) =>
          PdfIngest.stageGeomOf(n, b)._1 })
        .toDF("file_name", "page", "line_idx", "lx", "ly", "text", "text_len")
        .write.mode("overwrite").parquet(linesPath)
      staged.mapPartitions(_.flatMap { case (n, b) =>
          PdfIngest.stageGeomOf(n, b)._2 })
        .toDF("file_name", "page", "table_uid", "tx", "ty")
        .write.mode("overwrite").parquet(tgeoPath)
      staged.mapPartitions(_.flatMap { case (n, b) =>
          PdfIngest.stageGeomOf(n, b)._3 })
        .toDF("file_name", "table_uid", "source_paper", "row_idx",
          "col_idx", "cell")
        .write.mode("overwrite").parquet(cellsPath)
      staged.mapPartitions(_.flatMap { case (n, b) =>
          PdfIngest.stageGeomOf(n, b)._4 })
        .toDF("file_name", "table_uid", "col_idx", "category", "score")
        .write.mode("overwrite").parquet(scoresPath)
      val l = s.read.parquet(linesPath)
      val tg = s.read.parquet(tgeoPath)
      val c = s.read.parquet(cellsPath)
      val sc = s.read.parquet(scoresPath)
      // R6: candidates are same-page lines under 50 chars; accepted =
      // strict running minima of d² (< 100²); first "table"-flagged
      // pick takes the NEXT pick as its second title line
      val byTable = Window.partitionBy(col("file_name"), col("table_uid"))
      val cand = tg.join(l, Seq("file_name", "page"))
        .filter(col("text_len") < 50)
        .withColumn("d2",
          (col("lx") - col("tx")) * (col("lx") - col("tx")) +
          (col("ly") - col("ty")) * (col("ly") - col("ty")))
      val picks = cand
        .withColumn("prev_min", min(col("d2")).over(
          byTable.orderBy(col("line_idx").asc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("d2") < lit(10000.0) &&
          (col("prev_min").isNull || col("d2") < col("prev_min")))
        .withColumn("pick_seq",
          row_number().over(byTable.orderBy(col("line_idx").asc)))
        .select(col("file_name"), col("table_uid"), col("pick_seq"),
          col("text"))
      val flagged = picks
        .filter(lower(col("text")).contains("table"))
        .groupBy(col("file_name"), col("table_uid"))
        .agg(min(col("pick_seq")).as("flag_seq"))
      val flagTxt = picks.join(flagged, Seq("file_name", "table_uid"))
        .filter(col("pick_seq") === col("flag_seq"))
        .select(col("file_name"), col("table_uid"), col("text").as("t1"))
      val nextTxt = picks.join(flagged, Seq("file_name", "table_uid"))
        .filter(col("pick_seq") === col("flag_seq") + 1)
        .select(col("file_name"), col("table_uid"), col("text").as("t2"))
      val titles = tg.select(col("file_name"), col("table_uid"))
        .join(flagTxt, Seq("file_name", "table_uid"), "left")
        .join(nextTxt, Seq("file_name", "table_uid"), "left")
        .withColumn("title", when(col("t1").isNull, lit(""))
          .otherwise(when(col("t2").isNull, col("t1"))
            .otherwise(concat(col("t1"), lit(" "), col("t2")))))
        .select(col("file_name"), col("table_uid"), col("title"))
      // R15: per-category argmax over header cells, first maximal index
      // wins (strict > scan), mapped only at score >= 75
      val hmap = sc
        .withColumn("best", max(col("score")).over(
          Window.partitionBy(col("file_name"), col("table_uid"),
            col("category"))))
        .filter(col("score") === col("best") && col("best") >= 75)
        .groupBy(col("file_name"), col("table_uid"), col("category"))
        .agg(min(col("col_idx")).as("col_idx"))
        .withColumnRenamed("table_uid", "root_uid")
      // R7 density gate (integer-exact), on cells + derived titles
      val tab = c.join(titles, Seq("file_name", "table_uid"))
        .groupBy(col("file_name"), col("table_uid"), col("title"),
          col("source_paper"))
        .agg(count(lit(1)).as("n_cells"),
          sum((col("cell") =!= "").cast("long")).as("n_filled"))
      val gated = tab.filter(col("n_filled") * 4 > col("n_cells"))
      // R8 rooting
      val w = Window.partitionBy(col("file_name"))
        .orderBy(col("table_uid").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val rooted = gated.withColumn("root_uid",
          max(when(col("title") =!= "", col("table_uid"))).over(w))
        .filter(col("root_uid").isNotNull)
      // R12 typing on the root title
      val radRoots = rooted.filter(col("table_uid") === col("root_uid"))
        .filter(!col("title").rlike("(?i)\\b(principal|investigator)\\b") &&
          !col("title").rlike("(?i)\\b(acronym|abbreviations)\\b") &&
          col("title").rlike(
            "(?i)\\b(tid|see|dd|ddd|seu|let|ongoing|dose|result)\\b"))
        .select(col("file_name"), col("root_uid"), col("source_paper"))
      val members = rooted
        .select(col("file_name"), col("table_uid"), col("root_uid"))
        .join(radRoots.select(col("file_name"), col("root_uid")),
          Seq("file_name", "root_uid"))
      val mapped = c
        .select(col("file_name"), col("table_uid"), col("row_idx"),
          col("col_idx"), col("cell"))
        .filter(col("row_idx") > 0)
        .join(members, Seq("file_name", "table_uid"))
        .join(hmap, Seq("file_name", "root_uid", "col_idx"))
      // R16 projection + R17 validity
      val cats = PdfIngest.headerCategories
      val aggs = sum((col("cell") =!= "").cast("long")).as("nv") +:
        cats.map(cat => max(when(col("category") === cat,
          regexp_replace(col("cell"), "\n", " ")))
          .as(cat.replace(' ', '_')))
      val pivoted = mapped
        .groupBy(col("file_name"), col("root_uid"), col("table_uid"),
          col("row_idx"))
        .agg(aggs.head, aggs.tail: _*)
        .filter(col("nv") >= 3)
      pivoted
        .join(radRoots, Seq("file_name", "root_uid"))
        .select(cats.map(cat => col(cat.replace(' ', '_'))) ++
          Seq(col("source_paper"),
            col("file_name").as("source_paper_filename")): _*)
        .distinct()
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
         |ORDER BY file_name ASC NULLS FIRST""".stripMargin,
    // the same relational tail DuckDB-side, over the frames the query
    // stages — an INDEPENDENT derivation of rad_table's relational
    // stages, hash-compared against the Spark plan
    "q_rad_relational" -> {
      val pivotCols = PdfIngest.headerCategories.map { cat =>
        s"""    max(CASE WHEN category = '$cat'
           |      THEN replace(cell, chr(10), ' ') END) AS ${cat.replace(' ', '_')}"""
          .stripMargin
      }.mkString(",\n")
      val outCols = PdfIngest.headerCategories
        .map(_.replace(' ', '_')).mkString(", ")
      val orderCols = PdfIngest.radColumns
        .map(c => s"$c ASC NULLS FIRST").mkString(", ")
      s"""WITH c AS (
         |  SELECT * FROM read_parquet('$stageRoot/rad_cells/*.parquet')),
         |m AS (
         |  SELECT * FROM read_parquet('$stageRoot/rad_hmap/*.parquet')),
         |tab AS (
         |  SELECT file_name, table_uid, title, source_paper,
         |    count(1) AS n_cells,
         |    sum(CASE WHEN cell <> '' THEN 1 ELSE 0 END) AS n_filled
         |  FROM c GROUP BY 1, 2, 3, 4),
         |gated AS (SELECT * FROM tab WHERE n_filled * 4 > n_cells),
         |rooted AS (
         |  SELECT *, max(CASE WHEN title <> '' THEN table_uid END)
         |    OVER (PARTITION BY file_name ORDER BY table_uid
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS root_uid
         |  FROM gated),
         |rad_roots AS (
         |  SELECT file_name, root_uid, source_paper FROM rooted
         |  WHERE table_uid = root_uid
         |    AND NOT regexp_matches(title, '(?i)\\b(principal|investigator)\\b')
         |    AND NOT regexp_matches(title, '(?i)\\b(acronym|abbreviations)\\b')
         |    AND regexp_matches(title,
         |      '(?i)\\b(tid|see|dd|ddd|seu|let|ongoing|dose|result)\\b')),
         |members AS (
         |  SELECT r.file_name, r.table_uid, r.root_uid FROM rooted r
         |  JOIN rad_roots rr
         |    ON r.file_name = rr.file_name AND r.root_uid = rr.root_uid),
         |pivoted AS (
         |  SELECT c.file_name, mem.root_uid, c.table_uid, c.row_idx,
         |    sum(CASE WHEN c.cell <> '' THEN 1 ELSE 0 END) AS nv,
         |$pivotCols
         |  FROM c
         |  JOIN members mem
         |    ON c.file_name = mem.file_name AND c.table_uid = mem.table_uid
         |  JOIN m ON m.file_name = c.file_name AND m.root_uid = mem.root_uid
         |    AND m.col_idx = c.col_idx
         |  WHERE c.row_idx > 0
         |  GROUP BY 1, 2, 3, 4)
         |SELECT DISTINCT $outCols,
         |  rr.source_paper, p.file_name AS source_paper_filename
         |FROM pivoted p
         |JOIN rad_roots rr
         |  ON p.file_name = rr.file_name AND p.root_uid = rr.root_uid
         |WHERE p.nv >= 3
         |ORDER BY $orderCols""".stripMargin
    },
    // independent DuckDB derivation of q_rad_relational_full: the R6
    // walk (running-minima scan over staged geometry) and R15 argmax
    // (over the staged score matrix) PLUS the whole relational tail,
    // from raw staged frames — nothing pre-joined
    "q_rad_relational_full" -> {
      val pivotCols = PdfIngest.headerCategories.map { cat =>
        s"""    max(CASE WHEN category = '$cat'
           |      THEN replace(cell, chr(10), ' ') END) AS ${cat.replace(' ', '_')}"""
          .stripMargin
      }.mkString(",\n")
      val outCols = PdfIngest.headerCategories
        .map(_.replace(' ', '_')).mkString(", ")
      val orderCols = PdfIngest.radColumns
        .map(c => s"$c ASC NULLS FIRST").mkString(", ")
      s"""WITH l AS (
         |  SELECT * FROM read_parquet('$stageRoot/rad_lines/*.parquet')),
         |tg AS (
         |  SELECT * FROM read_parquet('$stageRoot/rad_tgeo/*.parquet')),
         |c AS (
         |  SELECT * FROM read_parquet('$stageRoot/rad_cells_raw/*.parquet')),
         |sc AS (
         |  SELECT * FROM read_parquet('$stageRoot/rad_scores/*.parquet')),
         |cand AS (
         |  SELECT tg.file_name, tg.table_uid, l.line_idx, l.text,
         |    (l.lx - tg.tx)*(l.lx - tg.tx) + (l.ly - tg.ty)*(l.ly - tg.ty) AS d2
         |  FROM tg JOIN l ON tg.file_name = l.file_name AND tg.page = l.page
         |  WHERE l.text_len < 50),
         |mins AS (
         |  SELECT *, min(d2) OVER (PARTITION BY file_name, table_uid
         |    ORDER BY line_idx
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
         |  FROM cand),
         |picks AS (
         |  SELECT file_name, table_uid, text, row_number() OVER (
         |      PARTITION BY file_name, table_uid ORDER BY line_idx) AS pick_seq
         |  FROM mins
         |  WHERE d2 < 10000 AND (prev_min IS NULL OR d2 < prev_min)),
         |flagged AS (
         |  SELECT file_name, table_uid, min(pick_seq) AS flag_seq
         |  FROM picks WHERE contains(lower(text), 'table') GROUP BY 1, 2),
         |titles AS (
         |  SELECT tg.file_name, tg.table_uid,
         |    CASE WHEN fp.text IS NULL THEN ''
         |         WHEN np.text IS NULL THEN fp.text
         |         ELSE fp.text || ' ' || np.text END AS title
         |  FROM tg
         |  LEFT JOIN flagged f
         |    ON f.file_name = tg.file_name AND f.table_uid = tg.table_uid
         |  LEFT JOIN picks fp
         |    ON fp.file_name = tg.file_name AND fp.table_uid = tg.table_uid
         |    AND fp.pick_seq = f.flag_seq
         |  LEFT JOIN picks np
         |    ON np.file_name = tg.file_name AND np.table_uid = tg.table_uid
         |    AND np.pick_seq = f.flag_seq + 1),
         |scored AS (
         |  SELECT *, max(score) OVER (
         |      PARTITION BY file_name, table_uid, category) AS best
         |  FROM sc),
         |hm AS (
         |  SELECT file_name, table_uid AS root_uid, category,
         |    min(col_idx) AS col_idx
         |  FROM scored WHERE score = best AND best >= 75
         |  GROUP BY 1, 2, 3),
         |tab AS (
         |  SELECT c.file_name, c.table_uid, t.title, c.source_paper,
         |    count(1) AS n_cells,
         |    sum(CASE WHEN cell <> '' THEN 1 ELSE 0 END) AS n_filled
         |  FROM c JOIN titles t
         |    ON t.file_name = c.file_name AND t.table_uid = c.table_uid
         |  GROUP BY 1, 2, 3, 4),
         |gated AS (SELECT * FROM tab WHERE n_filled * 4 > n_cells),
         |rooted AS (
         |  SELECT *, max(CASE WHEN title <> '' THEN table_uid END)
         |    OVER (PARTITION BY file_name ORDER BY table_uid
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS root_uid
         |  FROM gated),
         |rad_roots AS (
         |  SELECT file_name, root_uid, source_paper FROM rooted
         |  WHERE table_uid = root_uid
         |    AND NOT regexp_matches(title, '(?i)\\b(principal|investigator)\\b')
         |    AND NOT regexp_matches(title, '(?i)\\b(acronym|abbreviations)\\b')
         |    AND regexp_matches(title,
         |      '(?i)\\b(tid|see|dd|ddd|seu|let|ongoing|dose|result)\\b')),
         |members AS (
         |  SELECT r.file_name, r.table_uid, r.root_uid FROM rooted r
         |  JOIN rad_roots rr
         |    ON r.file_name = rr.file_name AND r.root_uid = rr.root_uid),
         |pivoted AS (
         |  SELECT c.file_name, mem.root_uid, c.table_uid, c.row_idx,
         |    sum(CASE WHEN c.cell <> '' THEN 1 ELSE 0 END) AS nv,
         |$pivotCols
         |  FROM c
         |  JOIN members mem
         |    ON c.file_name = mem.file_name AND c.table_uid = mem.table_uid
         |  JOIN hm ON hm.file_name = c.file_name AND hm.root_uid = mem.root_uid
         |    AND hm.col_idx = c.col_idx
         |  WHERE c.row_idx > 0
         |  GROUP BY 1, 2, 3, 4)
         |SELECT DISTINCT $outCols,
         |  rr.source_paper, p.file_name AS source_paper_filename
         |FROM pivoted p
         |JOIN rad_roots rr
         |  ON p.file_name = rr.file_name AND p.root_uid = rr.root_uid
         |WHERE p.nv >= 3
         |ORDER BY $orderCols""".stripMargin
    }
  )
}
