package graft.ingest

import graft.functions.FuzzyMatch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ingest dataflow re-expressed as composable Spark
  * operators (reference main.py:83-108 driver; SURVEY.md §3.1): one lazy
  * DataFrame plan from raw extracted cells to canonical, validated,
  * deduplicated rows. Each stage cites the reference behavior it
  * re-creates; all of it is built-ins + the partial_ratio expression, so
  * Catalyst sees the whole chain (predicate pushdown through the gates,
  * column pruning into the scan).
  */
object Ingest {

  /** Canonical output categories (reference rad_table, database.py:83-101). */
  val canonicalCategories: Seq[String] = Seq(
    "part number", "manufacturer", "tester id", "device function",
    "category", "technology", "principal investigator", "results",
    "spec", "dose rate", "proton energy", "degradation level",
    "proton fluence", "misc info")

  /** Aliases applied before scoring (reference tables.py:182-183 maps
    * 'degradation level' via the alias 'deg level').
    */
  val categoryAliases: Map[String, Seq[String]] = Map(
    "degradation level" -> Seq("deg level"))

  /** R18 string normalization: newline flatten + whitespace collapse +
    * trim + lower (tables.py:178, tables.py:230, database.py:28).
    */
  def normalize(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** R13 word-boundary containment (s_c_w, tables.py:140-141). */
  def containsWord(c: Column, word: String): Column =
    c.rlike("(?i)\\b" + java.util.regex.Pattern.quote(word) + "\\b")

  /** R12 title classification (find_table_type, tables.py:145-153):
    * 'principal investigator(s)' -> principal_investigator;
    * 'abbreviation'/'acronym' -> abbreviation; 'test results' or
    * ('table' and 'results') -> rad; otherwise null (dropped).
    */
  def classifyTitle(title: Column): Column =
    when(title.rlike("(?i)\\bprincipal investigators?\\b"), "principal_investigator")
      .when(title.rlike("(?i)\\babbreviations?\\b|\\bacronyms?\\b"), "abbreviation")
      .when(title.rlike("(?i)\\btest results?\\b") ||
            (containsWord(title, "table") && containsWord(title, "results")), "rad")
      .otherwise(lit(null))

  /** R7 table density: fraction of non-empty cells over value columns;
    * tables with density <= 0.25 are dropped whole (tables.py:244-249,
    * threshold at tables.py:89). Input: one row per cell (table_id,
    * cell). Output: (table_id, density).
    */
  def tableDensity(cells: DataFrame, tableId: String, cell: String): DataFrame =
    cells.groupBy(col(tableId))
      .agg((sum(when(length(trim(col(cell))) > 0, 1).otherwise(0)) /
        count(lit(1)).cast("double")).as("density"))

  /** R15 fuzzy header -> category alignment: score every header cell
    * against every canonical category with normalized partial_ratio
    * (alias-aware), take the per-category argmax, keep score >= 75
    * (tables.py:167-203; threshold tables.py:199). Runs driver-side over
    * a header list — headers are tiny metadata, the data never moves.
    * Returns category -> (headerIndex, score).
    */
  def mapHeader(header: Seq[String],
      categories: Seq[String] = canonicalCategories,
      aliases: Map[String, Seq[String]] = categoryAliases,
      threshold: Int = 75): Map[String, (Int, Int)] = {
    categories.flatMap { cat =>
      val targets = cat +: aliases.getOrElse(cat, Nil)
      val scored = header.zipWithIndex.map { case (h, i) =>
        (i, targets.map(t => FuzzyMatch.normalizedPartialRatio(h, t)).max)
      }
      val (bestIdx, bestScore) = scored.maxBy { case (i, s) => (s, -i) }
      if (bestScore >= threshold) Some(cat -> ((bestIdx, bestScore))) else None
    }.toMap
  }

  /** R16 canonical projection: select the mapped source column per
    * category (normalized), plus provenance columns (tables.py:216-242
    * appends source_paper + source_paper_filename).
    */
  def projectCanonical(staged: DataFrame, mapping: Map[String, (Int, Int)],
      sourcePaper: String, sourceFile: String): DataFrame = {
    // backtick-quote the exact column name (messy headers contain
    // newlines/dots that the bare column parser would split on)
    val cols = mapping.toSeq.sortBy(_._1).map { case (cat, (idx, _)) =>
      normalize(col("`" + staged.columns(idx) + "`")).as(cat.replace(' ', '_'))
    }
    staged.select(cols :+ lit(sourcePaper).as("source_paper")
      :+ lit(sourceFile).as("source_paper_filename"): _*)
  }

  /** R17 row validity: mapped-value density over the canonical columns;
    * rows under 0.5 are invalid (tables.py:252-263).
    */
  def withRowDensity(projected: DataFrame, mappedCols: Seq[String]): DataFrame = {
    val nonNull = mappedCols.map(c =>
      when(col(c).isNotNull && length(col(c)) > 0, 1).otherwise(0))
      .reduce(_ + _)
    projected.withColumn("row_density",
      nonNull / lit(mappedCols.size.toDouble))
  }

  /** R21 pre-insert dedup: keep only incoming rows whose key tuple does
    * not already exist in the target — the reference's per-row EXISTS
    * probe (database.py:19, database.py:43-61) as one anti-join. Also
    * dedups within the batch itself. Idempotent: ingesting the same batch
    * twice adds nothing (main.py:90 invariant).
    */
  def dedupAgainst(incoming: DataFrame, existing: DataFrame,
      keys: Seq[String]): DataFrame =
    incoming.dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** R22 bulk append write (replaces the reference's INSERT+commit per
    * row, database.py:31-32): dedup then one columnar append.
    */
  def appendDedup(incoming: DataFrame, targetPath: String,
      keys: Seq[String]): Long = {
    val spark = incoming.sparkSession
    val existing =
      try spark.read.parquet(targetPath)
      catch { case _: Exception => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], incoming.schema) }
    val fresh = dedupAgainst(incoming, existing, keys).cache()
    val n = fresh.count()
    if (n > 0) fresh.write.mode("append").parquet(targetPath)
    fresh.unpersist()
    n
  }

  /** Intended R20 at the DataFrame level (the reference's
    * `abbreviation_expansion` is a behavioral no-op, main.py:45-50; this
    * is the meant semantics): replace whole-word abbreviations with
    * their expansions across the given columns. The pairs table is
    * bounded (an abbreviation glossary), so it is collected and
    * broadcast into a scalar UDF — each cell is rewritten in one pass.
    */
  def expandAbbreviations(df: DataFrame, cols: Seq[String],
      pairs: DataFrame, abbrevCol: String = "abbrev",
      expansionCol: String = "expansion"): DataFrame = {
    val spark = df.sparkSession
    // glossary-sized collect: K-bounded model state, like a k-means
    // seed — never corpus data. Patterns compile ONCE here and ship
    // broadcast (java.util.regex.Pattern is Serializable); compiling
    // per cell would dominate the UDF at corpus scale.
    val compiled: Seq[(java.util.regex.Pattern, String)] = pairs
      .select(col(abbrevCol), col(expansionCol))
      .collect().map { r =>
        (java.util.regex.Pattern.compile(
          "(?i)\\b" + java.util.regex.Pattern.quote(r.getString(0)) + "\\b"),
          java.util.regex.Matcher.quoteReplacement(r.getString(1)))
      }.toSeq
    val bc = spark.sparkContext.broadcast(compiled)
    val expandUdf = udf((s: String) =>
      if (s == null) null
      else bc.value.foldLeft(s)((acc, pe) => pe._1.matcher(acc).replaceAll(pe._2)))
    cols.foldLeft(df)((d, c) => d.withColumn(c, expandUdf(col(c))))
  }

  /** R23 update (reference `add_to_entry_in_table`, database.py:35-41):
    * vanilla Spark/parquet has no in-place update, so the pattern is
    * read -> conditional rewrite -> two-phase copy through a staging
    * path (stage fully written before the target is overwritten; NOT
    * atomic — a crash between the two writes leaves the stage copy as
    * the recovery source). This is the SIMPLE tier for plain-parquet
    * tables a caller doesn't control the layout of; the production
    * 100 TB tier is [[graft.sources.SnapshotTable.updateWhere]] —
    * atomic manifest commits, only affected files rewritten, time
    * travel (and the same verb family: delete/merge/compact/append).
    * Returns the number of rows that matched the predicate.
    */
  def updateWhere(spark: SparkSession, tablePath: String,
      predicate: Column, assignments: Map[String, Column]): Long = {
    val df = spark.read.parquet(tablePath)
    // one simultaneous select — SQL UPDATE binds every RHS and the
    // predicate against the OLD row (a withColumn fold would let later
    // assignments see already-updated values; same rule as
    // SnapshotTable.updateWhere)
    val updated = df.select(df.columns.map { c =>
      assignments.get(c) match {
        case Some(v) => when(predicate, v).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }.toIndexedSeq: _*)
    val n = df.filter(predicate).count()
    val stage = tablePath + "__stage"
    updated.write.mode("overwrite").parquet(stage)
    spark.read.parquet(stage).write.mode("overwrite").parquet(tablePath)
    cleanupStage(spark, stage)
    n
  }

  /** R24 delete-with-limit (reference `delete_entry_from_table`,
    * database.py:66-71): rewrite keeping rows that miss the predicate;
    * an optional limit deletes only the first `limit` matches in
    * `orderCol` order (the reference's LIMIT n delete).
    *
    * The limit path tags rows with a per-row id, picks the first-k
    * victims via a distributed TopK (`orderBy.limit(k)` plans as
    * TakeOrderedAndProject — every partition contributes only its local
    * top-k, no global single-task sort), and removes them with a
    * broadcast anti-join on the id (victims ≤ k rows). Victims are NOT
    * anti-joined by row content — that would skip NULL-bearing victims
    * (non-null-safe equality) and over-delete duplicates beyond the
    * limit. The id is `monotonically_increasing_id` over the parquet
    * scan, stable across the plan's two branches because file-scan
    * splits (and hence partition indexes and in-partition row order)
    * are fixed at planning time; the id is also the tie-break, so equal
    * `orderCol` values delete deterministically.
    */
  def deleteWhere(spark: SparkSession, tablePath: String,
      predicate: Column, orderCol: String,
      limit: Option[Int] = None): Long = {
    val df = spark.read.parquet(tablePath)
    val matches = coalesce(predicate, lit(false))
    val keep = limit match {
      case None => df.filter(!matches)
      case Some(k) =>
        val withId = df.withColumn("__id", monotonically_increasing_id())
        val victims = withId.filter(matches)
          .orderBy(col(orderCol).asc_nulls_first, col("__id").asc)
          .limit(k)
          .select(col("__id").as("__vid"))
        withId.join(broadcast(victims),
            col("__id") === col("__vid"), "left_anti")
          .drop("__id")
    }
    val total = df.count()
    val stage = tablePath + "__stage"
    keep.write.mode("overwrite").parquet(stage)
    spark.read.parquet(stage).write.mode("overwrite").parquet(tablePath)
    cleanupStage(spark, stage)
    total - spark.read.parquet(tablePath).count()
  }

  /** Lakehouse small-file compaction: rewrite a parquet table so each
    * output file is ~`targetMB`. Streaming appends and per-batch
    * `appendDedup` calls accrete small files; a scan then pays one task
    * + one footer read per file, and at 100 TB the file count (not the
    * byte count) becomes the scheduler bottleneck. File count =
    * ceil(current bytes / target), same staged-rewrite safety as
    * `updateWhere`. Returns (files before, files after).
    */
  def compact(spark: SparkSession, tablePath: String,
      targetMB: Int = 128): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles() = fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles()
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L,
      (bytes + targetMB.toLong * 1024 * 1024 - 1) / (targetMB.toLong * 1024 * 1024))
    val df = spark.read.parquet(tablePath).repartition(nOut.toInt)
    val stage = tablePath + "__stage"
    df.write.mode("overwrite").parquet(stage)
    // re-shape on the republish too: a plain read-back packs the staged
    // files into maxPartitionBytes-sized splits and would undo the target
    spark.read.parquet(stage).repartition(nOut.toInt)
      .write.mode("overwrite").parquet(tablePath)
    cleanupStage(spark, stage)
    (before.length.toLong, parquetFiles().length.toLong)
  }

  /** Remove a staging directory left by the rewrite path. */
  private def cleanupStage(spark: SparkSession, stage: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(stage)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** Fuzzy near-duplicate elimination (motivated by the reference's own
    * data defect: '1366 MV Xe' vs '1366 MeV Xe' survive exact dedup —
    * SURVEY.md §5.2). Rows are blocked on exact values of `blockKeys`
    * (a near-dup must agree on them), then within each block a row is
    * dropped when ANY earlier row (lower `idCol`) scores partial_ratio
    * >= `threshold` on `fuzzyCol` — note: earlier, not earlier-AND-
    * surviving, so a chain a~b~c with a!~c keeps only a (single-pass
    * greedy semantics; survivor-only chains would need iteration).
    * Blocking keeps the pairwise
    * comparison inside small groups — the scalable shape: the
    * cross-pair work is bounded by the largest block, not the table.
    */
  def fuzzyDedup(df: DataFrame, blockKeys: Seq[String], fuzzyCol: String,
      idCol: String, threshold: Int = 90): DataFrame = {
    import graft.functions.PartialRatioExpr.partial_ratio
    val a = df.select((blockKeys :+ fuzzyCol :+ idCol).map(col): _*)
    val b = df.select(blockKeys.map(k => col(k).as(s"__$k")) :+
      col(fuzzyCol).as("__other") :+ col(idCol).as("__oid"): _*)
    val joinCond = blockKeys.map(k => col(k) === col(s"__$k"))
      .reduce(_ && _) && col("__oid") < col(idCol)
    val dominated = a.join(b, joinCond, "left_outer")
      .withColumn("__sim",
        when(col("__oid").isNotNull,
          partial_ratio(col(fuzzyCol), col("__other"))).otherwise(lit(0)))
      .groupBy((blockKeys :+ fuzzyCol :+ idCol).map(col): _*)
      .agg(max(col("__sim")).as("__best"))
      .filter(col("__best") >= threshold)
      .select(col(idCol).as("__dropid"))
    df.join(dominated, df(idCol) === col("__dropid"), "left_anti")
  }

  /** Tolerant measurement parser for the reference's string-encoded
    * values ('<1', '>50', '50-300', 'HDR~65 LDR~30' — observed in
    * main.db; SURVEY.md §7 hard part d): extracts a comparison operator
    * and the first numeric value, keeping the raw string alongside for
    * lossless storage.
    */
  def parseMeasurement(c: Column): Column = struct(
    c.as("raw"),
    when(c.rlike("^\\s*<"), "<")
      .when(c.rlike("^\\s*>"), ">")
      .when(c.rlike("^\\s*\\d+(\\.\\d+)?\\s*-\\s*\\d"), "range")
      .when(c.rlike("~"), "approx")
      .when(c.rlike("^\\s*\\d"), "=")
      .otherwise(lit(null)).as("op"),
    // nullif guards the no-match '' (ANSI mode rejects '' -> double)
    nullif(regexp_extract(c, "(\\d+(?:\\.\\d+)?)", 1), lit(""))
      .cast("double").as("value"),
    nullif(regexp_extract(c, "\\d+(?:\\.\\d+)?\\s*-\\s*(\\d+(?:\\.\\d+)?)", 1),
      lit("")).cast("double").as("value_hi"))
}
