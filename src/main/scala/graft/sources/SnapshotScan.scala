package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{NumericType, StructType}

/** Catalyst-integrated snapshot scan: a custom [[FileIndex]] whose
  * `listFiles` prunes the snapshot's file list with the MANIFEST's
  * partition labels and column stats when Catalyst pushes data filters
  * down — so `SnapshotTable.scan(spark, t).filter($"k" === 42)` (or the
  * same predicate through `spark.sql` on a registered view) opens only
  * the files that can contain matches, with NO explicit
  * readWhere/readWhereRange call. This is the Delta/Iceberg
  * `TahoeFileIndex` integration shape: scan planning runs on metadata,
  * the parquet reader then applies its own row-group pruning inside the
  * surviving files, and the row-level filter keeps exactness.
  *
  * Pruning is CONSERVATIVE: only predicate shapes the translator
  * understands can exclude a file (equality/range/IN on a column with
  * recorded stats or the partition label, composed with AND/OR);
  * everything else keeps the file. Exclusion is therefore always
  * sound — an excluded file provably contains no matching row.
  */
class SnapshotFileIndex(spark: SparkSession, table: String,
    snap: SnapshotTable.Snapshot) extends FileIndex {

  private val statuses: Seq[(String, FileStatus)] = {
    val p = new Path(table)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one listStatus per batch DIR, not one getFileStatus per file: at
    // production file counts the per-file RPC is the metadata
    // bottleneck (a manifest of 800k files = 800k round trips vs one
    // per batch); the dir listing also matches object-store batching
    val byDir = snap.files.groupBy(r => r.split('/').dropRight(1).mkString("/"))
    val listed: Map[String, FileStatus] = byDir.keys.flatMap { dir =>
      f.listStatus(new Path(table, dir)).iterator.filter(_.isFile)
        .map(st => s"$dir/${st.getPath.getName}" -> st)
    }.toMap
    snap.files.map(rel => rel -> listed(rel))
  }

  /** Test hook: how many files the last `listFiles` call planned. */
  @volatile var lastPlannedFiles: Int = -1

  override def rootPaths: Seq[Path] = Seq(new Path(table))

  override def partitionSchema: StructType = StructType(Nil)

  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = statuses.filter { case (rel, _) =>
      dataFilters.forall(e => mayMatch(rel, e))
    }
    lastPlannedFiles = kept.size
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2).toArray))
  }

  private val pcols = SnapshotTable.partitionColsOf(snap)
  // hidden-partitioning transforms, aligned with pcols (empty on
  // identity-partitioned and unpartitioned tables)
  private val ptransforms = SnapshotTable.partitionSpecOf(snap)

  /** Can `file` possibly hold a row satisfying `e`? (false only on a
    * provable exclusion.)
    */
  private def mayMatch(file: String, e: Expression): Boolean = e match {
    case And(l, r) => mayMatch(file, l) && mayMatch(file, r)
    case Or(l, r) => mayMatch(file, l) || mayMatch(file, r)
    case EqualTo(a: AttributeReference, l: Literal) =>
      boundsAdmit(file, a.name, l, lo = true, hi = true)
    case EqualTo(l: Literal, a: AttributeReference) =>
      boundsAdmit(file, a.name, l, lo = true, hi = true)
    case GreaterThan(a: AttributeReference, l: Literal) =>
      boundsAdmit(file, a.name, l, lo = true, hi = false)
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      boundsAdmit(file, a.name, l, lo = true, hi = false)
    case LessThan(a: AttributeReference, l: Literal) =>
      boundsAdmit(file, a.name, l, lo = false, hi = true)
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      boundsAdmit(file, a.name, l, lo = false, hi = true)
    case GreaterThan(l: Literal, a: AttributeReference) =>
      boundsAdmit(file, a.name, l, lo = false, hi = true)
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      boundsAdmit(file, a.name, l, lo = false, hi = true)
    case LessThan(l: Literal, a: AttributeReference) =>
      boundsAdmit(file, a.name, l, lo = true, hi = false)
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      boundsAdmit(file, a.name, l, lo = true, hi = false)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => boundsAdmit(file, a.name,
        v.asInstanceOf[Literal], lo = true, hi = true))
    // per-file row/null counts (manifest `x=` attributes) prove a file
    // all-null or null-free — unknown counts keep the file (soundness)
    case IsNotNull(a: AttributeReference) =>
      (extraLong(file, "rows"), extraLong(file, s"nulls.${a.name}")) match {
        case (Some(rows), Some(nulls)) => nulls < rows
        case _ => true
      }
    case IsNull(a: AttributeReference) =>
      extraLong(file, s"nulls.${a.name}") match {
        case Some(nulls) => nulls > 0
        case _ => true
      }
    case _ => true
  }

  private def extraLong(file: String, key: String): Option[Long] =
    snap.extraOf.get(file).flatMap(_.get(key))
      .flatMap(v => scala.util.Try(v.toLong).toOption)

  /** `lo`: the predicate needs rows with value ≥ literal to exist, so
    * the file admits it iff literal ≤ max; `hi`: needs value ≤ literal,
    * so literal ≥ min must hold. EqualTo checks both sides.
    */
  private def boundsAdmit(file: String, column: String, l: Literal,
      lo: Boolean, hi: Boolean): Boolean = {
    val v = render(l)
    if (v == null) return true
    // exact partition value beats range stats for ANY partition column
    // (multi-column tables carry the full value tuple per file, so a
    // predicate on the second column prunes as well as the first —
    // subset pruning, not Hive's prefix-only trie walk). Hidden
    // partitioning prunes the RAW-column predicate THROUGH the
    // transform: the literal maps into the label domain with the same
    // derivation staging used, then equality compares labels directly
    // and — for order-preserving transforms only — ranges compare in
    // the label domain (x >= L implies t(x) >= t(L), so label < t(L)
    // provably excludes the file). A column may source SEVERAL
    // transforms; every position gets its veto.
    var pi = 0
    while (pi < pcols.length) {
      if (pcols(pi) == column) {
        SnapshotTable.partValuesOf(snap, file).flatMap(_.lift(pi))
          .foreach { label =>
            ptransforms.lift(pi) match {
              case Some(t) if !t.isIdentity =>
                t.applyLiteral(l).foreach { tl =>
                  def cmpLe(x: String, y: String): Boolean =
                    if (t.numericLabel)
                      try BigDecimal(x) <= BigDecimal(y)
                      catch { case _: NumberFormatException => true }
                    else SnapshotTable.codePointLe(x, y)
                  if (lo && hi) { if (label != tl) return false }
                  else if (t.monotonic &&
                      !((!lo || cmpLe(tl, label)) &&
                        (!hi || cmpLe(label, tl)))) return false
                  // non-monotonic (bucket) range: no partition verdict
                }
              case _ =>
                // identity: exact-equality pruning — but the literal
                // must render in the SAME domain the label was derived
                // in. Labels come from cast-to-string at staging;
                // render() emits epoch MICROS for TimestampType, so
                // comparing cross-domain would silently exclude every
                // matching file. Catalyst's Cast with the session
                // timezone IS the staging derivation — render the
                // timestamp literal through it.
                if (lo && hi) {
                  val lv =
                    if (l.dataType ==
                        org.apache.spark.sql.types.TimestampType)
                      org.apache.spark.sql.catalyst.expressions.Cast(l,
                        org.apache.spark.sql.types.StringType,
                        Some(org.apache.spark.sql.internal.SQLConf.get
                          .sessionLocalTimeZone)).eval() match {
                        case null => null
                        case s => s.toString
                      }
                    else v
                  if (lv != null) return label == lv
                }
            }
          }
      }
      pi += 1
    }
    snap.statsOf.get(file).flatMap(_.get(column)) match {
      case Some((mn, mx)) =>
        // TIMESTAMP stats are recorded as epoch micros, so they compare
        // numerically like any numeric column
        val numeric = snap.schema.fieldNames.contains(column) &&
          (snap.schema(column).dataType.isInstanceOf[NumericType] ||
            snap.schema(column).dataType ==
              org.apache.spark.sql.types.TimestampType)
        // unparseable numeric repr -> no exclusion (soundness first);
        // string compare is by CODE POINT — the order UTF8String's
        // min/max recorded the stats under (Java's UTF-16 <= disagrees
        // for supplementary chars vs U+E000..U+FFFF and would silently
        // exclude matching files)
        def le(x: String, y: String): Boolean =
          if (numeric)
            try BigDecimal(x) <= BigDecimal(y)
            catch { case _: NumberFormatException => true }
          else SnapshotTable.codePointLe(x, y)
        (!hi || le(mn, v)) && (!lo || le(v, mx))
      case None => true
    }
  }

  /** The literal as the STRING `computeStats`/partition labels record
    * (Spark's cast-to-string rendering). Types whose internal Catalyst
    * value does not stringify to that form must either convert
    * faithfully (DateType: epoch days → ISO local date, which also
    * compares correctly lexicographically; TimestampType: the Catalyst
    * value IS epoch micros, exactly what the stats record — zone-free
    * on both sides) or return null = UNPRUNABLE (TimestampNTZ —
    * soundness before pruning). A mismatch here silently EXCLUDES
    * matching files, the worst failure mode a skipping layer can have.
    */
  private def render(l: Literal): String = (l.value, l.dataType) match {
    case (null, _) => null
    case (days: Integer, org.apache.spark.sql.types.DateType) =>
      java.time.LocalDate.ofEpochDay(days.longValue).toString
    case (micros: java.lang.Long, org.apache.spark.sql.types.TimestampType) =>
      micros.toString
    case (_, org.apache.spark.sql.types.TimestampType) => null
    case (_, org.apache.spark.sql.types.TimestampNTZType) => null
    case (u: org.apache.spark.unsafe.types.UTF8String, _) => u.toString
    case (other, _) => other.toString
  }
}

object SnapshotScan {

  /** The Catalyst-planned snapshot read: filters on this frame (or on a
    * view registered from it) prune files through the manifest
    * automatically. Pins the CURRENT snapshot at call time, like
    * [[SnapshotTable.read]].
    */
  def scan(spark: SparkSession, table: String,
      version: Option[Long] = None): (DataFrame, SnapshotFileIndex) = {
    val snap = version match {
      case Some(v) => SnapshotTable.readManifest(spark, table, v)
      case None => SnapshotTable.readManifest(spark, table,
        SnapshotTable.currentVersion(spark, table))
    }
    // fail honestly rather than resurrect vector-deleted rows: the raw
    // FileIndex relation has no seam for the DV anti join — compact()
    // purges the vectors, after which the Catalyst scan is exact again
    require(snap.deleteFiles.isEmpty,
      s"$table v${snap.version} carries deletion vectors; read it via " +
        "SnapshotTable.read (DV-applying) or compact() to purge them")
    // same honesty rule for column mapping: the raw FileIndex scan
    // reads by CURRENT names only, so files written before a rename
    // would read the column as NULL — silently wrong. compact()
    // rewrites under current names, after which the mapping clears.
    require(SnapshotTable.colMapOf(snap).isEmpty,
      s"$table v${snap.version} carries renamed columns; read it via " +
        "SnapshotTable.read (mapping-aware) or compact() to rewrite " +
        "under the current names")
    // and for initial-defaults: files predating an ADD COLUMN DEFAULT
    // must read the default, which only the frame-level read applies —
    // compact() materializes it, after which this scan is exact again
    require(!SnapshotTable.hasLiveDefaults(snap),
      s"$table v${snap.version} has files predating a column DEFAULT; " +
        "read it via SnapshotTable.read (default-applying) or " +
        "compact() to materialize the defaults")
    val index = new SnapshotFileIndex(spark, table, snap)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = snap.schema,
      // declared bucket layout rides the relation: the v1 bucketed
      // scan groups the tagged files by bucket id and reports hash
      // output partitioning — equal-bucketed graft tables then join
      // with no exchange on either side
      bucketSpec = SnapshotTable.bucketSpecOf(snap).map { case (cs, n) =>
        org.apache.spark.sql.catalyst.catalog.BucketSpec(n, cs,
          SnapshotTable.bucketSortOf(snap))
      },
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    (GraftShim.ofRows(spark, LogicalRelation(relation, isStreaming = false)),
      index)
  }
}
