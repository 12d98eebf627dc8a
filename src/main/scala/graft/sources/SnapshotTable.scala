package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Snapshot-manifest table commits — the transactional layer the plain
  * staged-rewrite mutation verbs (graft.ingest.Ingest.updateWhere /
  * deleteWhere / compact) lack at 100 TB, in the spirit of
  * Iceberg/Delta's manifest-pointer design but self-contained on the
  * Hadoop FileSystem API.
  *
  * Layout:
  * {{{
  *   <table>/data/b-<uuid>/part-*.parquet   immutable data files
  *   <table>/_manifests/v<N>.manifest       snapshot N: schema + file list
  * }}}
  *
  * A manifest is a small text file: a format marker, the schema (one
  * JSON line), then one table-relative data-file path per line. The
  * CURRENT snapshot is the highest committed version. Commit protocol:
  * stage the new data files under a fresh `data/b-<uuid>/` dir (invisible
  * to every reader — readers only open files their pinned manifest
  * lists), write the manifest to a temp name, then RENAME it to
  * `v<N+1>.manifest`. The rename is the commit point:
  *
  *  - a crash before the rename leaves only orphaned staged files; the
  *    previous snapshot stays current and fully readable;
  *  - a reader pins the manifest it resolved at open time — a commit
  *    racing the read cannot mutate the reader's file list (data files
  *    are never rewritten in place, only added);
  *  - every previous snapshot stays readable by version = time travel,
  *    until [[expireSnapshots]] garbage-collects it;
  *  - a single-row update costs a rewrite of only the files that
  *    CONTAIN matching rows (found by a pushed-down scan over
  *    `input_file_name`), never the full table — the fix for the
  *    full-table rewrite in Ingest.updateWhere (reference analog:
  *    SQLite's atomic UPDATE/DELETE, database.py:35-41/66-71, which got
  *    this for free from its journal).
  *
  * Concurrency: optimistic. Two writers racing to commit the same next
  * version are detected at the commit point (the loser aborts with its
  * staged files orphaned, data intact) — ACROSS PROCESSES: the
  * check-then-rename pair is serialized by [[LockFileCatalog]]'s
  * exclusive-create lockfile (O_CREAT|O_EXCL via NIO on local
  * filesystems, server-side-atomic create on HDFS), behind the
  * pluggable [[CommitCatalog]] seam a multi-driver deployment points at
  * a real catalog/CAS endpoint. Exercised by a forked-second-JVM race
  * test in SnapshotSuite.
  *
  * Scale: the manifest is file-list-sized (100 TB at 128 MB files ~
  * 800k lines, tens of MB — driver/metadata-tier, never data-tier);
  * sharding manifests per partition like Iceberg's manifest lists is a
  * straightforward extension of the same commit point.
  */
object SnapshotTable {

  /** A lost optimistic-commit race (another writer published first).
    * Typed so [[withCommitRetry]] retries on the CLASS, not on message
    * text; extends IllegalStateException for source compatibility with
    * callers that catch the old type.
    */
  final class CommitConflictException(msg: String)
    extends IllegalStateException(msg)

  /** A staged batch (or the existing data, for [[addConstraint]])
    * violates a CHECK constraint. Typed — and deliberately NOT a
    * [[CommitConflictException]]: a constraint violation is not
    * retryable, so [[withCommitRetry]] must not spin on it.
    */
  final class ConstraintViolationException(msg: String)
    extends IllegalArgumentException(msg)

  private val Marker = "graft-snapshot-1"

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(table: String) = new Path(table, "_manifests")

  private def manifestPath(table: String, v: Long) =
    new Path(manifestDir(table), f"v$v%d.manifest")

  /** Highest committed version, 0 if the table does not exist yet. */
  def currentVersion(spark: SparkSession, table: String): Long = {
    val dir = manifestDir(table)
    val f = fs(spark, table)
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong
      }.foldLeft(0L)(math.max)
  }

  /** One committed snapshot: schema, table-relative data file paths,
    * per-file partition labels (for manifest-level pruning; empty for
    * unpartitioned tables), and small key=value metadata (e.g. the
    * streaming sink's last committed batch id — committed ATOMICALLY
    * with the file list by the same manifest rename, which is what
    * makes idempotent exactly-once replay possible). `depth` is the
    * DELTA-CHAIN depth of the backing manifest: 0 for a full manifest,
    * base.depth + 1 for a delta (see [[commitManifest]]'s O(churn)
    * commit-metadata encoding).
    */
  final case class Snapshot(version: Long, schema: StructType,
      files: Seq[String], meta: Map[String, String] = Map.empty,
      partitionOf: Map[String, String] = Map.empty,
      statsOf: Map[String, Map[String, (String, String)]] = Map.empty,
      deleteFiles: Seq[String] = Nil, depth: Int = 0,
      extraOf: Map[String, Map[String, String]] = Map.empty,
      cleanGroups: Map[String, GroupRef] = Map.empty)

  /** One group reference inside a GROUPED (two-tier) full manifest:
    * the anchor lists (group file, label, entry count, total data
    * bytes, per-group column BOUNDS) per group instead of the file
    * entries themselves, so scan planning with a pruning predicate
    * reads only the matching groups' metadata — O(matched groups),
    * not O(table files). For PARTITIONED tables `label` is the
    * composite partition value; for UNPARTITIONED CLUSTERED tables
    * groups are cluster-range CHUNKS of each write batch's sorted file
    * run and `label` is the synthetic `#<batch>#<chunk>` key (never a
    * partition value — admission ignores it). `stats` holds min/max
    * per column, folded over the member files' recorded stats (only
    * columns every member carries) — range predicates prune GROUPS
    * before any group file is read, on partitioned tables too (a
    * non-partition predicate can now skip whole groups). `bytes` is
    * -1 when some member file's size was unknown at anchor time
    * (sizeInBytes then falls back to listing).
    */
  final case class GroupRef(rel: String, label: Option[String],
      count: Int, bytes: Long,
      stats: Map[String, (String, String)] = Map.empty)

  /** One manifest FILE as written (full, grouped-full, or a delta
    * against `base`). An entry is (path, partition label, min/max
    * stats, extra per-file attributes — row count, per-column null
    * counts, on-disk bytes). `groups` is non-empty for GROUPED full
    * manifests; `entries` then holds the resolved union of all groups
    * when parsed eagerly, or only the admitted groups when parsed for
    * pruned scan planning.
    */
  private[sources] final case class RawManifest(version: Long,
      schema: StructType,
      base: Option[Long], depth: Int, meta: Map[String, String],
      deleteFiles: Seq[String], removed: Seq[String],
      entries: Seq[(String, Option[String], Map[String, (String, String)],
        Map[String, String])],
      groups: Seq[GroupRef] = Nil)

  private[sources] type Entry =
    (String, Option[String], Map[String, (String, String)],
      Map[String, String])

  private def readLinesAt(spark: SparkSession, table: String,
      p: Path): Vector[String] = {
    val in = fs(spark, table).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
  }

  /** Parse one file-entry line: `path` plus optional TAB-separated
    * tagged fields `p=<partitionValue>`, `s=<col>|<min>|<max>[;...]`
    * and `x=<k>|<v>[;...]` (URL-encoded components).
    */
  private def parseEntryLine(l: String): Entry = {
    val fields = l.split('\t')
    val path = fields.head
    var part: Option[String] = None
    var stats = Map.empty[String, (String, String)]
    var extra = Map.empty[String, String]
    def dec(x: String) = java.net.URLDecoder.decode(x, "UTF-8")
    fields.tail.foreach {
      case f if f.startsWith("p=") => part = Some(f.stripPrefix("p="))
      case f if f.startsWith("s=") =>
        stats = f.stripPrefix("s=").split(';').iterator.map { e =>
          // -1 limit: an empty-string max ("col||") must not drop its
          // trailing field and poison the manifest with a MatchError
          val Array(c, mn, mx) = e.split("\\|", -1).map(dec)
          c -> ((mn, mx))
        }.toMap
      case f if f.startsWith("x=") =>
        extra = f.stripPrefix("x=").split(';').iterator.map { e =>
          val Array(k, v) = e.split("\\|", -1).map(dec)
          k -> v
        }.toMap
      case _ => ()
    }
    (path, part, stats, extra)
  }

  private val GroupMarker = "graft-group-v1"

  /** Read one partition-group file's entries (and its metadata byte
    * size — the two-tier planning-cost measure).
    */
  private def readGroupEntriesWithBytes(spark: SparkSession,
      table: String, rel: String): (Seq[Entry], Long) = {
    val lines = readLinesAt(spark, table,
      new Path(manifestDir(table), rel))
    require(lines.headOption.contains(GroupMarker),
      s"$rel is not a $GroupMarker group file")
    (lines.drop(1).filter(_.nonEmpty).map(parseEntryLine),
      lines.iterator.map(_.length + 1L).sum)
  }

  private def readGroupEntries(spark: SparkSession, table: String,
      rel: String): Seq[Entry] =
    readGroupEntriesWithBytes(spark, table, rel)._1

  /** Parse a manifest WITHOUT resolving its partition groups —
    * header (schema/meta/dv/base/depth), its own inline entries, and
    * the group references. The scan-planning path prunes on the group
    * labels and reads only matching groups; [[parseManifestFile]]
    * resolves everything for the verbs.
    */
  private def parseManifestHeader(spark: SparkSession, table: String,
      p: Path, version: Long): RawManifest = {
    val lines = readLinesAt(spark, table, p)
    require(lines.headOption.contains(Marker),
      s"$p is not a $Marker manifest")
    val schema = DataType.fromJson(lines(1).stripPrefix("schema:"))
      .asInstanceOf[StructType]
    val body = lines.drop(2).filter(_.nonEmpty)
    val (metaLines, rest0) = body.partition(_.startsWith("meta:"))
    val (dvLines, rest1) = rest0.partition(_.startsWith("dv:"))
    val (baseLines, rest2) = rest1.partition(_.startsWith("base:"))
    val (depthLines, rest3) = rest2.partition(_.startsWith("depth:"))
    val (grpLines, rest4) = rest3.partition(_.startsWith("grp:"))
    val (rmLines, fileLines) = rest4.partition(_.startsWith("rm:"))
    val meta = metaLines.map(_.stripPrefix("meta:")).map { kv =>
      val i = kv.indexOf('=')
      kv.take(i) -> kv.drop(i + 1)
    }.toMap
    val groups = grpLines.map { l =>
      val fields = l.stripPrefix("grp:").split('\t')
      val Array(rel, lab, cnt, bytes) = fields.take(4)
      // optional 5th field: per-group column bounds, entry-line syntax
      val stats = fields.lift(4).filter(_.startsWith("s="))
        .map(_.stripPrefix("s=").split(';').iterator.map { e =>
          val Array(c, mn, mx) = e.split("\\|", -1).map(dec)
          c -> ((mn, mx))
        }.toMap).getOrElse(Map.empty[String, (String, String)])
      GroupRef(rel,
        if (lab == "-") None else Some(dec(lab.stripPrefix("v"))),
        cnt.toInt, bytes.toLong, stats)
    }
    RawManifest(version, schema,
      baseLines.headOption.map(_.stripPrefix("base:").toLong),
      depthLines.headOption.map(_.stripPrefix("depth:").toInt).getOrElse(0),
      meta, dvLines.map(_.stripPrefix("dv:")),
      rmLines.map(_.stripPrefix("rm:")), fileLines.map(parseEntryLine),
      groups)
  }

  private def parseManifestFile(spark: SparkSession, table: String,
      p: Path, version: Long): RawManifest = {
    val raw = parseManifestHeader(spark, table, p, version)
    if (raw.groups.isEmpty) raw
    else raw.copy(entries = raw.entries ++
      raw.groups.flatMap(g => readGroupEntries(spark, table, g.rel)))
  }

  private def toSnapshot(raw: RawManifest): Snapshot =
    Snapshot(raw.version, raw.schema, raw.entries.map(_._1), raw.meta,
      raw.entries.collect { case (f, Some(v), _, _) => f -> v }.toMap,
      raw.entries.collect {
        case (f, _, st, _) if st.nonEmpty => f -> st }.toMap,
      raw.deleteFiles, raw.depth,
      raw.entries.collect {
        case (f, _, _, x) if x.nonEmpty => f -> x }.toMap,
      raw.groups.flatMap(g => g.label.map(_ -> g)).toMap)

  /** Apply one delta on top of its resolved base: the file list drops
    * the removed paths and appends the added entries; meta, schema and
    * the DV list come WHOLLY from the delta (each manifest is
    * authoritative for them — this is how additive schema evolution and
    * stream high-water marks ride delta commits unchanged).
    * `cleanGroups` — the anchor's partition groups whose membership
    * the chain has NOT touched — loses every label the delta adds to
    * or removes from; the next re-anchor reuses the surviving groups'
    * files verbatim (O(churn) re-anchor, not O(table)).
    */
  private def applyDelta(base: Snapshot, d: RawManifest): Snapshot = {
    val rm = d.removed.toSet
    // cluster-chunk groups dirty at batch granularity: a removed file
    // shifts its batch's surviving sorted run, so every chunk of that
    // batch loses reuse (adds land in fresh batches — no chunk exists)
    val rmBatches = d.removed.map(batchDirOf).toSet
    val dirtyChunks = base.cleanGroups.keySet.filter(l =>
      chunkBatchOf(l).exists(rmBatches.contains))
    val dirtyLabels = (d.entries.flatMap(_._2) ++
      d.removed.flatMap(base.partitionOf.get)).toSet ++ dirtyChunks
    Snapshot(d.version, d.schema,
      base.files.filterNot(rm) ++ d.entries.map(_._1), d.meta,
      (base.partitionOf -- rm) ++
        d.entries.collect { case (f, Some(v), _, _) => f -> v },
      (base.statsOf -- rm) ++
        d.entries.collect { case (f, _, st, _) if st.nonEmpty => f -> st },
      d.deleteFiles, d.depth,
      (base.extraOf -- rm) ++
        d.entries.collect { case (f, _, _, x) if x.nonEmpty => f -> x },
      base.cleanGroups -- dirtyLabels)
  }

  def readManifest(spark: SparkSession, table: String,
      version: Long): Snapshot = {
    // fail FAST below the retention floor: the manifest may survive as
    // a chain link, but its data files were expired — resolving it
    // would fail mid-scan with FileNotFoundException later (the chain
    // walk itself bypasses this check via readManifestAt)
    val floor = retentionFloor(spark, table)
    if (version < floor) throw new IllegalArgumentException(
      s"version $version of $table is expired (retention floor $floor)")
    readManifestAt(spark, table, manifestPath(table, version), version)
  }

  private def readManifestAt(spark: SparkSession, table: String,
      p: Path, version: Long): Snapshot =
    resolveChain(parseManifestFile(spark, table, p, version),
      v => parseManifestFile(spark, table, manifestPath(table, v), v))

  /** Resolve a (possibly delta) manifest through `load`: walk the
    * chain down to the full manifest, then fold forward; chain length
    * is bounded by MaxChainDepth at commit time. `load` is the seam
    * multi-version readers (history) memoize so shared chain prefixes
    * parse once instead of once per version.
    */
  private def resolveChain(top: RawManifest,
      load: Long => RawManifest): Snapshot = {
    if (top.base.isEmpty) toSnapshot(top)
    else {
      var stack: List[RawManifest] = List(top)
      var baseV = top.base
      while (baseV.isDefined) {
        val r = load(baseV.get)
        stack ::= r
        baseV = r.base
      }
      require(stack.head.base.isEmpty, "delta chain must end at a full manifest")
      stack.tail.foldLeft(toSnapshot(stack.head))(applyDelta)
    }
  }

  /** A snapshot resolved for SCAN PLANNING: the header (schema, meta,
    * DV list — everything the relation needs before filters arrive) is
    * parsed eagerly, but a GROUPED anchor's file entries are NOT — the
    * FileIndex materializes them per query with a partition-label
    * admission predicate, reading only matching groups' metadata.
    * Delta-chain links are churn-sized and always read whole.
    */
  final class ScanPlan private[SnapshotTable] (
      spark: SparkSession, table: String,
      private[sources] val anchor: RawManifest,
      private[sources] val deltas: Seq[RawManifest]) {

    /** Header-only Snapshot (files empty): meta/schema/dv/depth are
      * authoritative from the chain TOP, like [[applyDelta]].
      */
    val header: Snapshot = {
      val top = deltas.lastOption.getOrElse(anchor)
      Snapshot(top.version, top.schema, Nil, top.meta,
        Map.empty, Map.empty, top.deleteFiles, top.depth)
    }

    /** Bytes of group metadata the last [[entries]] call read — the
      * two-tier planning cost, asserted ∝ matched partitions.
      */
    @volatile var lastGroupsRead: Int = -1
    @volatile var lastGroupBytesRead: Long = -1L

    /** Live initial-default markers need the PER-FILE extras, which a
      * header-only snapshot lacks — tables declaring defaults
      * materialize their entries for this check (rare, and correctness
      * beats laziness: a missed marker would silently skip applying a
      * column DEFAULT).
      */
    lazy val liveDefaults: Boolean = {
      val defs = defaultsOf(header)
      defs.nonEmpty && {
        val markers = defs.keys.map(c => s"predates.${enc(c)}").toSet
        entries(None).exists(e => markers.exists(e._4.contains))
      }
    }

    /** Total data bytes WITHOUT materializing groups, when every
      * group's byte total is known (anchors record them from the
      * staged sizes); None falls back to materializing.
      */
    def knownSizeInBytes: Option[Long] = {
      if (anchor.groups.isEmpty) None
      else {
        val rmAll = deltas.flatMap(_.removed).toSet
        if (rmAll.nonEmpty) None // removed bytes live inside groups
        else {
          val g = anchor.groups.map(_.bytes)
          val d = deltas.flatMap(_.entries).map(_._4.get("bytes")
            .flatMap(v => scala.util.Try(v.toLong).toOption)
            .getOrElse(-1L))
          if (g.exists(_ < 0) || d.exists(_ < 0)) None
          else Some(g.sum + d.sum)
        }
      }
    }

    /** Materialize the file entries whose group reference `admit`s
      * (None = all). Group files of non-admitted refs are never read;
      * the admission sees the ref's partition label AND its per-group
      * column bounds — partition pruning and cluster-range pruning
      * share one gate. Inline anchor entries and delta entries pass
      * through the same predicate as single-entry pseudo-refs (their
      * own label + per-file stats); delta rm-sets apply (a removed
      * file in an unread group was never listed, harmlessly).
      */
    def entries(admit: Option[GroupRef => Boolean]): Seq[Entry] = {
      def keepRef(g: GroupRef): Boolean = admit.forall(_(g))
      def keepEntry(e: Entry): Boolean =
        admit.forall(_(GroupRef("", e._2, 1, -1L, e._3)))
      var groupsRead = 0
      var bytesRead = 0L
      val anchorEntries: Seq[Entry] =
        if (anchor.groups.isEmpty) anchor.entries.filter(keepEntry)
        else anchor.entries.filter(keepEntry) ++
          anchor.groups.filter(keepRef).flatMap { g =>
            groupsRead += 1
            val (es, b) = readGroupEntriesWithBytes(spark, table, g.rel)
            bytesRead += b
            es
          }
      lastGroupsRead = groupsRead
      lastGroupBytesRead = bytesRead
      deltas.foldLeft(anchorEntries) { (acc, d) =>
        val rm = d.removed.toSet
        acc.filterNot(e => rm(e._1)) ++ d.entries.filter(keepEntry)
      }
    }
  }

  /** Resolve `version` (or a branch/staged manifest path) for scan
    * planning: chain links parse header-only; grouped anchors defer
    * their entries to [[ScanPlan.entries]].
    */
  private[sources] def scanPlanAt(spark: SparkSession, table: String,
      version: Long): ScanPlan = {
    val floor = retentionFloor(spark, table)
    if (version < floor) throw new IllegalArgumentException(
      s"version $version of $table is expired (retention floor $floor)")
    val top = parseManifestHeader(spark, table,
      manifestPath(table, version), version)
    if (top.base.isEmpty) new ScanPlan(spark, table, top, Nil)
    else {
      var stack: List[RawManifest] = List(top)
      var baseV = top.base
      while (baseV.isDefined) {
        val r = parseManifestHeader(spark, table,
          manifestPath(table, baseV.get), baseV.get)
        stack ::= r
        baseV = r.base
      }
      require(stack.head.base.isEmpty,
        "delta chain must end at a full manifest")
      new ScanPlan(spark, table, stack.head, stack.tail)
    }
  }

  /** The verbs' "current snapshot", BRANCH-SCOPE AWARE (inside
    * [[withBranch]] this is the branch head) — the accessor provider
    * code uses when it must see what the verbs will see.
    */
  private[sources] def currentSnapshot(spark: SparkSession,
      table: String): Snapshot = loadCurrent(spark, table)

  private def loadCurrent(spark: SparkSession, table: String): Snapshot =
    scopedBranch(table) match {
      case Some(name) =>
        // inside withBranch: every verb's "current snapshot" IS the
        // branch head, with the head sequence standing in for the
        // version so the verbs' expected+1 commit arithmetic lands on
        // the next branch manifest
        val (snap, seq) = branchSnapshot(spark, table, name)
        snap.copy(version = seq.toLong)
      case None =>
        val v = currentVersion(spark, table)
        require(v > 0, s"no committed snapshot at $table")
        readManifest(spark, table, v)
    }

  /** Pin `version` (or the current snapshot) and return its DataFrame,
    * deletion vectors applied. The file list is resolved HERE — commits
    * that land afterwards do not change what this frame reads.
    */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    val snap = version match {
      case Some(v) => readManifest(spark, table, v)
      case None => loadCurrent(spark, table)
    }
    val df = readFilesDv(spark, table, snap, snap.files)
    // a materialized view's hidden maintained-state columns
    // (__graft_mv_*) are refresh machinery, not contents: the visible
    // schema is the definition's schema
    if (snap.meta.contains("mvQuery"))
      df.drop(df.columns
        .filter(_.startsWith(MaterializedView.AuxPrefix)): _*)
    else df
  }

  /** The MV refresh's view of its own stored state: the current
    * snapshot WITH the hidden maintained-state columns.
    */
  private[sources] def readCurrentWithAux(spark: SparkSession,
      table: String): DataFrame = {
    val snap = loadCurrent(spark, table)
    readFilesDv(spark, table, snap, snap.files)
  }

  /** The schema a READER sees: for materialized views the hidden
    * maintained-state columns are projected away (parquet by-name
    * resolution simply never requests them), everywhere else the
    * manifest schema verbatim. Every scan surface — the frame read,
    * the provider relation, the Catalyst FileIndex scan — goes
    * through this, so an MV's visible schema is its definition's.
    */
  private[sources] def visibleSchema(snap: Snapshot): StructType =
    if (snap.meta.contains("mvQuery"))
      StructType(snap.schema.fields.filterNot(
        _.name.startsWith(MaterializedView.AuxPrefix)))
    else snap.schema

  /** The location-independent identity of a data file: its
    * `data/<batch>/...` suffix — the manifest's relative path in the
    * URI-ENCODED space of `_metadata.file_path` (a raw disk name like
    * `__part=a b` or `__part=a%20b` renders as `a%20b` / `a%2520b`
    * there). Deletion vectors key on it (plus row position), so a moved
    * table keeps its deletes; the encoding is location-independent too.
    * Anchored on the batch-dir prefix (`b-`/`dv-` + uuid), so partition
    * subdirectories don't truncate the key. Compare against
    * manifest-relative paths ONLY after [[pctDecode]] — they live in the
    * raw on-disk space ([[relKeyFromUri]] is the driver-side bridge).
    */
  private def fileKeyOf(absCol: Column): Column =
    // greedy .* prefix pins the LAST `data/<batch>/` occurrence, so a
    // table path that itself contains a `data/b-...` segment cannot
    // truncate the key
    regexp_extract(absCol, "^.*(data/(?:b|dv)-[^/]+/.*)$", 1)

  /** Decode %xx sequences ONLY — the inverse of Hadoop Path/URI
    * rendering, which never writes '+' for a space (URLDecoder would
    * corrupt a literal '+'). One decode maps an encoded file key back
    * to the raw on-disk name the manifest records: a space in a dir
    * name renders as `%20` in URI space and decodes back; a
    * Hive-escaped '%' (on disk as `%25`, e.g. inside `__part=a%20b`
    * for a value containing "a%20b" verbatim) renders as `%2525` and
    * decodes back to the on-disk `%25` — never double-decoded.
    */
  private def pctDecode(s: String): String = unescapePartValue(s)

  private val RelKeyRe = "^.*(data/(?:b|dv)-[^/]+/.*)$".r

  /** Driver-side bridge from an encoded absolute URI (input_file_name /
    * _metadata.file_path / FileStatus Path.toString) to the RAW
    * manifest-relative path: extract the `data/<batch>/...` suffix in
    * the encoded space (where the uuid batch anchor is guaranteed
    * literal), then decode once. Replaces the former O(files) endsWith
    * scan per row AND fixes the silent mismatch for partition values
    * with URI-special characters (space, '%', Hive-escaped '='/':').
    */
  private def relKeyFromUri(abs: String): Option[String] = abs match {
    case RelKeyRe(rel) => Some(pctDecode(rel))
    case _ => None
  }

  /** Read `files` under snapshot `snap` with its DELETION VECTORS
    * applied: rows whose (file key, row position) appear in a delete
    * file are anti-joined away. The anti join's build side is
    * delete-sized (broadcast-able in the common case; AQE picks the
    * strategy), and a DV-free snapshot reads with zero overhead —
    * the plain scan, no provenance columns, full codegen.
    */
  // ------------------------------------------------------------------
  // COLUMN MAPPING (metadata-only RENAME / DROP / type widening)
  //
  // A renamed column keeps its data under its FORMER name in every
  // file written before the rename; files written after carry the new
  // name. Each file therefore holds EXACTLY ONE of the name
  // generations (the others read as NULL under parquet's by-name
  // resolution), so `coalesce(current, former1, former2, ...)` is an
  // exact reconstruction — no file rewrite, no per-file bookkeeping.
  // A dropped column's data stays in old files and is simply never
  // requested. Type widening (int->long, float->double) is pure
  // schema metadata: Spark 4's parquet readers (vectorized and not)
  // up-convert narrow physical values to the requested wider type.
  // The one restriction this scheme needs: a former/dropped physical
  // name can never be REUSED for a new column — old files still carry
  // real values under it, and by-name resolution would resurrect them
  // (the guard lives in renameColumn/addColumns).

  /** logical column -> its former names, newest first (a column
    * renamed a->b->c maps c -> [b, a]).
    */
  private[graft] def colMapOf(snap: Snapshot): Map[String, Seq[String]] =
    snap.meta.get("colmap").map { v =>
      v.split(';').filter(_.nonEmpty).map { entry =>
        val Array(l, fs) = entry.split(":", 2)
        dec(l) -> fs.split(',').filter(_.nonEmpty).map(dec).toSeq
      }.toMap
    }.getOrElse(Map.empty)

  private def encodeColMap(m: Map[String, Seq[String]]): String =
    m.toSeq.sortBy(_._1).map { case (l, fs) =>
      s"${enc(l)}:${fs.map(enc).mkString(",")}"
    }.mkString(";")

  /** Physical names whose reuse would resurrect stale file data:
    * every former name plus every dropped column's name lineage.
    */
  private[sources] def retiredNames(snap: Snapshot): Set[String] =
    colMapOf(snap).values.flatten.toSet ++
      snap.meta.get("droppedCols").toSeq
        .flatMap(_.split(',').filter(_.nonEmpty).map(dec))

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** The fixed schema of a deletion-vector sidecar file. Passed
    * explicitly to every DV read: a schema-less parquet read runs
    * footer schema inference (SchemaMergeUtils.mergeSchemasInParallel —
    * an extra job or driver-side footer pass per read), pure overhead
    * for a two-column format the engine itself wrote.
    */
  private val dvFileSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("file_key",
      org.apache.spark.sql.types.StringType, nullable = true),
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType, nullable = true)))

  private def readFilesDv(spark: SparkSession, table: String,
      snap: Snapshot, files: Seq[String]): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    if (snap.deleteFiles.isEmpty) {
      val cm = colMapOf(snap)
      if (cm.isEmpty) { // the hot path stays a bare schema'd scan
        val raw = spark.read.schema(snap.schema)
          .parquet(files.map(f => s"$table/$f"): _*)
        withInitialDefaults(raw, snap, files,
          expr("_metadata.file_path"))
      } else
        withInitialDefaults(mappedScan(spark, table, snap, files),
          snap, files, col("__meta_fp"))
          .select(snap.schema.fieldNames
            .map(n => col(s"`$n`")).toIndexedSeq: _*)
    } else
      readFilesDvProv(spark, table, snap, files)
        .drop("__fk", "__rp")
  }

  /** The column-mapping read: request current + former names (each
    * nullable — a file holds exactly one generation), then coalesce
    * the generations into the logical column. Keeps `_metadata`
    * available to the caller (the select is applied by the callers).
    */
  private def mappedScan(spark: SparkSession, table: String,
      snap: Snapshot, files: Seq[String]): DataFrame = {
    val cm = colMapOf(snap)
    val readFields = snap.schema.fields.flatMap { f =>
      (f.name +: cm.getOrElse(f.name, Nil)).map(n =>
        org.apache.spark.sql.types.StructField(n, f.dataType,
          nullable = true))
    }
    val raw = spark.read
      .schema(org.apache.spark.sql.types.StructType(readFields))
      .parquet(files.map(f => s"$table/$f"): _*)
    raw.select(snap.schema.fields.map { f =>
      cm.get(f.name) match {
        case Some(formers) =>
          coalesce((f.name +: formers).map(n => col(s"`$n`")): _*)
            .as(f.name)
        case None => col(s"`${f.name}`")
      }
    }.toIndexedSeq
      :+ expr("_metadata.file_path").as("__meta_fp")
      :+ expr("_metadata.row_index").as("__meta_ri"): _*)
  }

  /** As [[readFilesDv]] but KEEPING the provenance columns `__fk`
    * (file key) and `__rp` (row position) — the coordinates a new
    * deletion vector records.
    */
  private def readFilesDvProv(spark: SparkSession, table: String,
      snap: Snapshot, files: Seq[String]): DataFrame = {
    val base0 =
      if (colMapOf(snap).isEmpty)
        spark.read.schema(snap.schema)
          .parquet(files.map(f => s"$table/$f"): _*)
          .withColumn("__fk", fileKeyOf(expr("_metadata.file_path")))
          .withColumn("__rp", expr("_metadata.row_index"))
      else
        mappedScan(spark, table, snap, files)
          .withColumn("__fk", fileKeyOf(col("__meta_fp")))
          .withColumn("__rp", col("__meta_ri"))
          .drop("__meta_fp", "__meta_ri")
    // the file key carries the batch-dir segment, so the default
    // rewrite rides it — the mutation verbs (which read through here)
    // then materialize defaults whenever they rewrite a file
    val base = withInitialDefaults(base0, snap, files, col("__fk"))
    if (snap.deleteFiles.isEmpty) base
    else {
      val dv = spark.read.schema(dvFileSchema)
        .parquet(snap.deleteFiles.map(d => s"$table/$d"): _*)
        .select(col("file_key").as("__dk"), col("pos").as("__dp"))
      base.join(dv,
        base("__fk") === col("__dk") && base("__rp") === col("__dp"),
        "left_anti")
    }
  }

  /** Row-level DELETE as a DELETION VECTOR commit (the Delta DV /
    * Iceberg position-delete shape): instead of rewriting every file
    * that contains a matching row, write only the matched rows'
    * (file key, row position) pairs as a small delete file and commit a
    * manifest that references it — the data files are untouched, so a
    * needle-in-a-haystack delete costs IO proportional to the MATCHES,
    * not to the files they live in. Readers anti-join the vectors at
    * scan time; [[compact]] purges them (materializes the deletes and
    * clears the vector list). Matching runs on the LIVE view, so
    * re-deleting already-deleted rows is a no-op. Returns (new version,
    * rows deleted).
    */
  def deleteWhereVector(spark: SparkSession, table: String,
      predicate: Column): (Long, Long) = {
    val snap = loadCurrent(spark, table)
    val matches = coalesce(predicate, lit(false))
    val hits = readFilesDvProv(spark, table, snap, snap.files)
      .filter(matches)
      .select(col("__fk").as("file_key"), col("__rp").as("pos"))
    val batch = "dv-" + java.util.UUID.randomUUID().toString
    val dir = s"$table/data/$batch"
    hits.write.mode("error").parquet(dir)
    val f = fs(spark, table)
    val dvFiles = f.listStatus(new Path(dir)).iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"data/$batch/$n").toVector.sorted
    val n = spark.read.schema(dvFileSchema).parquet(dir).count()
    if (n == 0) { f.delete(new Path(dir), true); return (snap.version, 0L) }
    val v = commitManifest(spark, table, snap.schema, snap.files,
      snap.version, snap.meta, snap.partitionOf, snap.statsOf,
      snap.deleteFiles ++ dvFiles, Some(snap), snap.extraOf)
    (v, n)
  }

  /** Write `df` as a fresh immutable file batch under `data/b-<uuid>/`;
    * returns the new files' table-relative paths. Staged files are
    * invisible until a manifest referencing them commits.
    */
  private[graft] def stageBatch(df: DataFrame, table: String): Seq[String] = {
    val batch = "b-" + java.util.UUID.randomUUID().toString
    val dir = s"$table/data/$batch"
    df.write.mode("error").parquet(dir)
    val f = fs(df.sparkSession, table)
    f.listStatus(new Path(dir)).iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"data/$batch/$n").toVector.sorted
  }

  /** BUCKETED batch staging: hash-repartition on the bucket column
    * into exactly `numBuckets` tasks (Spark's own HashPartitioning —
    * the same murmur3 bucketing a `bucketBy` write uses), then tag
    * each staged file's NAME with its bucket id in the `_NNNNN` form
    * `BucketingUtils.getBucketId` parses. The task-partition index IS
    * the bucket id (the parquet writer names one file per non-empty
    * partition `part-<idx>-…`), so the tag is read off the original
    * name — no data is inspected. A relation built over these files
    * with the matching `BucketSpec` reports hash output partitioning,
    * and two graft tables bucketed the same way JOIN WITHOUT A
    * SHUFFLE on the bucket column (the 100 TB co-located-join layout;
    * PlanAuditSuite asserts the exchange-free plan).
    */
  private[graft] def stageBucketedBatch(df: DataFrame, table: String,
      bucketCols: Seq[String], numBuckets: Int,
      clusterSort: Seq[Column] = Nil): Seq[String] = {
    val batch = "b-" + java.util.UUID.randomUUID().toString
    val dir = s"$table/data/$batch"
    val bucketed = df.repartition(numBuckets,
      bucketCols.map(c => col(s"`$c`")): _*)
    // declared clustering sorts WITHIN each bucket (after the bucket
    // shuffle — a pre-shuffle sort would be destroyed by it)
    (if (clusterSort.isEmpty) bucketed
     else bucketed.sortWithinPartitions(clusterSort: _*))
      .write.mode("error").parquet(dir)
    val f = fs(df.sparkSession, table)
    f.listStatus(new Path(dir)).iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map { n =>
        val tagged = bucketTagName(n)
        require(f.rename(new Path(dir, n), new Path(dir, tagged)),
          s"cannot bucket-tag $n")
        s"data/$batch/$tagged"
      }.toVector.sorted
  }

  /** `part-NNNNN-…` → `…_NNNNN.parquet`: the task-partition index IS
    * the bucket id (HashPartitioning's pmod(murmur3, n)), re-rendered
    * in the `_NNNNN` suffix form `BucketingUtils.getBucketId` parses.
    */
  private def bucketTagName(n: String): String = {
    val idx = n.substring(5, 10).toInt // part-NNNNN-…
    val dot = n.indexOf('.')
    val (stem, ext) =
      if (dot < 0) (n, "") else (n.substring(0, dot), n.substring(dot))
    f"${stem}_$idx%05d$ext"
  }

  /** PARTITION × BUCKET staging (the canonical large-fact layout:
    * partition by date, bucket by join key). One shuffle total: the
    * batch hash-repartitions into `numBuckets` tasks on the bucket
    * key, each task sorts its rows by (partition labels, bucket sort)
    * — the writer's required ordering, so FileFormatWriter inserts no
    * second sort — and writes ONE file per (partition dir, bucket)
    * pair, bucket-tagged. Rows of key k live in bucket hash(k)%n
    * inside EVERY partition dir, so the union of any partition-pruned
    * file subset still groups cleanly by bucket id and the relation's
    * BucketSpec keeps reporting hash output partitioning: a
    * partition-pruned fact-fact join stays exchange-free.
    */
  private[graft] def stagePartitionedBucketedBatch(df: DataFrame,
      table: String, labelCols: Seq[Column], bucketCols: Seq[String],
      numBuckets: Int, sortWithin: Seq[Column] = Nil)
      : Seq[(String, String)] = {
    val batch = "b-" + java.util.UUID.randomUUID().toString
    val dir = s"$table/data/$batch"
    val partNames = labelCols.indices.map(i => s"__part$i")
    val withParts = labelCols.zip(partNames).foldLeft(df) {
      case (acc, (c, p)) => acc.withColumn(p, c)
    }
    withParts
      .repartition(numBuckets, bucketCols.map(c => col(s"`$c`")): _*)
      .sortWithinPartitions(partNames.map(col) ++ sortWithin: _*)
      .write.mode("error").partitionBy(partNames: _*).parquet(dir)
    val f = fs(df.sparkSession, table)
    def walk(p: Path, depth: Int, rel: String,
        vals: List[String]): Vector[(String, String)] =
      if (depth == labelCols.length)
        f.listStatus(p).iterator.map(_.getPath.getName)
          .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
          .map { n =>
            val tagged = bucketTagName(n)
            require(f.rename(new Path(p, n), new Path(p, tagged)),
              s"cannot bucket-tag $rel/$n")
            (s"$rel/$tagged", vals.reverse.map(enc).mkString(","))
          }.toVector
      else
        f.listStatus(p).iterator.filter(_.isDirectory)
          .filter(_.getPath.getName.startsWith(s"__part$depth="))
          .flatMap { pd =>
            val name = pd.getPath.getName
            val v = unescapePartValue(name.stripPrefix(s"__part$depth="))
            walk(pd.getPath, depth + 1, s"$rel/$name", v :: vals)
          }.toVector
    walk(new Path(dir), 0, s"data/$batch", Nil).sortBy(_._1)
  }

  /** Hive-style partitioned batch staging: a duplicated string column
    * drives partitionBy (the data keeps the original column), and the
    * partition value of every file is parsed back from its directory
    * name. Returns (table-relative path, partition value) pairs. Null
    * partition values carry Hive's default-partition token. Repartition
    * by the column => one file per partition value per batch.
    */
  /** Hive-style partition-dir / URI unescape: ONLY %xx sequences
    * decode. Spark's escapePathName never writes '+' for a space, so
    * URLDecoder — which maps '+' -> ' ' — would corrupt any label
    * containing a literal '+', silently breaking partition pruning for
    * that value. Runs of CONSECUTIVE %xx escapes decode as one UTF-8
    * byte sequence, not char-by-char: URI rendering encodes a
    * multi-byte code point as adjacent escapes (`é` -> `%C3%A9`), and
    * per-escape toChar decoding would yield mojibake whose key never
    * matches the raw manifest path — UPDATE/DELETE/MERGE would then
    * silently skip those files' rows. ASCII escapes (the only kind
    * escapePathName emits) are a one-byte run, so both callers share
    * this decoder.
    */
  private def unescapePartValue(s: String): String = {
    val sb = new StringBuilder(s.length)
    val run = new java.io.ByteArrayOutputStream(8)
    var i = 0
    def flushRun(): Unit = if (run.size() > 0) {
      sb.append(new String(run.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      run.reset()
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        run.write(Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16))
        i += 3
      } else { flushRun(); sb.append(c); i += 1 }
    }
    flushRun()
    sb.result()
  }

  private[graft] def stagePartitionedBatch(df: DataFrame, table: String,
      pcol: String, clusterSort: Seq[Column] = Nil)
      : Seq[(String, String)] = {
    val batch = "b-" + java.util.UUID.randomUUID().toString
    val dir = s"$table/data/$batch"
    val withPart = df.withColumn("__part", col(pcol).cast("string"))
    // clustered tables RANGE-partition on (partition, cluster key)
    // instead of hashing on the partition alone: a task then holds a
    // contiguous key slice of one (or a few) partition values, so each
    // partition directory gets one file PER SLICE — tight per-file
    // min/max a range predicate prunes WITHIN the partition — rather
    // than one file spanning the partition's whole key range
    (if (clusterSort.isEmpty) withPart.repartition(col("__part"))
     else withPart
       .repartitionByRange(col("__part") +: clusterSort: _*)
       .sortWithinPartitions(col("__part") +: clusterSort: _*))
      .write.mode("error").partitionBy("__part").parquet(dir)
    val f = fs(df.sparkSession, table)
    f.listStatus(new Path(dir)).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("__part="))
      .toIndexedSeq.flatMap { pd =>
        val v = unescapePartValue(
          pd.getPath.getName.stripPrefix("__part="))
        f.listStatus(pd.getPath).iterator
          .map(_.getPath.getName)
          .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
          .map(n => (s"data/$batch/${pd.getPath.getName}/$n", v))
          .toVector
      }.sortBy(_._1)
  }

  /** Multi-column staging: nested `__part0=<a>/__part1=<b>/...` dirs,
    * one (table-relative path, COMPOSITE label) pair per file. The
    * composite label percent-encodes each column's string value and
    * joins with ',' — unambiguous for values containing the separator.
    * Null values carry Hive's default-partition token like the
    * single-column path.
    */
  private[graft] def stagePartitionedBatchMulti(df: DataFrame,
      table: String, pcols: Seq[String],
      clusterSort: Seq[Column] = Nil): Seq[(String, String)] =
    stageLabeledBatchMulti(df, table,
      pcols.map(c => col(s"`$c`").cast("string")), clusterSort)

  /** The generalized multi-label staging: each label column DERIVES a
    * partition label from the row (identity tables pass the raw value
    * cast to string; transform-partitioned tables pass the transform's
    * label derivation — see [[PartitionTransforms]]).
    */
  private[graft] def stageLabeledBatchMulti(df: DataFrame,
      table: String, labelCols: Seq[Column],
      clusterSort: Seq[Column] = Nil): Seq[(String, String)] = {
    val batch = "b-" + java.util.UUID.randomUUID().toString
    val dir = s"$table/data/$batch"
    val partNames = labelCols.indices.map(i => s"__part$i")
    val withParts = labelCols.zip(partNames).foldLeft(df) {
      case (acc, (c, p)) => acc.withColumn(p, c)
    }
    // range-on-(partitions, cluster key) when clustered — same
    // within-partition file-splitting rationale as the single-column
    // staging path
    (if (clusterSort.isEmpty)
       withParts.repartition(partNames.map(col): _*)
     else withParts
       .repartitionByRange(partNames.map(col) ++ clusterSort: _*)
       .sortWithinPartitions(partNames.map(col) ++ clusterSort: _*))
      .write.mode("error").partitionBy(partNames: _*).parquet(dir)
    val f = fs(df.sparkSession, table)
    def walk(p: Path, depth: Int, rel: String,
        vals: List[String]): Vector[(String, String)] =
      if (depth == labelCols.length)
        f.listStatus(p).iterator.map(_.getPath.getName)
          .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
          .map(n => (s"$rel/$n", vals.reverse.map(enc).mkString(",")))
          .toVector
      else
        f.listStatus(p).iterator.filter(_.isDirectory)
          .filter(_.getPath.getName.startsWith(s"__part$depth="))
          .flatMap { pd =>
            val name = pd.getPath.getName
            val v = unescapePartValue(name.stripPrefix(s"__part$depth="))
            walk(pd.getPath, depth + 1, s"$rel/$name", v :: vals)
          }.toVector
    walk(new Path(dir), 0, s"data/$batch", Nil).sortBy(_._1)
  }

  /** Per-file stats of `statsCols` over a FRESHLY STAGED batch in one
    * codegen pass over the new files only (never the table): min/max
    * rendered as strings (numeric columns re-compare as decimals at
    * prune time; TIMESTAMP columns record epoch-micros so they prune
    * numerically — a zone-dependent string rendering could not), plus
    * the per-file row count and per-column NULL counts as extra
    * attributes (`x=` fields), which let IS [NOT] NULL predicates skip
    * all-null / null-free files. A file whose column is all-NULL omits
    * its min/max — it stays range-unprunable, preserving exactness.
    * Returns (statsOf, extraOf) slices for the staged files.
    */
  private def computeStats(spark: SparkSession, table: String,
      files: Seq[String], statsCols: Seq[String], schema: StructType)
      : (Map[String, Map[String, (String, String)]],
         Map[String, Map[String, String]]) = {
    if (files.isEmpty || statsCols.isEmpty) return (Map.empty, Map.empty)
    def bound(c: String, isMin: Boolean) = {
      val v = schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
        case _ => col(c)
      }
      (if (isMin) min(v) else max(v)).cast("string")
    }
    // six accumulators per column, one pass: min/max bounds and null
    // counts (file skipping), an HLL NDV sketch (lgK=9 ≈ 512 B, ~4%
    // error — per-file sketches UNION into an exact-shape table NDV
    // for CBO with zero re-scan, the Iceberg puffin-ndv design), and
    // length sums/maxes (CBO's avgLen/maxLen — recorded for STRINGS
    // only; fixed-width types publish their type size, like Spark's
    // own ANALYZE, so the hot staging pass pays no per-row length()
    // on them). The sketch hashes int/long/string/binary RAW (the
    // datasketches-supported inputs); other types render to string —
    // distinct values stay distinct either way.
    def sketchable(c: String) = schema(c).dataType match {
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BinaryType => col(c)
      case _ => col(c).cast("string")
    }
    def isStr(c: String) =
      schema(c).dataType == org.apache.spark.sql.types.StringType
    // KLL quantile sketches (CBO equi-height histograms) for the types
    // whose histogram domain is a double — the SAME double the
    // estimator converts predicates into (timestamps: epoch micros,
    // dates: epoch days, numerics: the value)
    def kllInput(c: String): Option[Column] =
      schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          Some(unix_micros(col(c)).cast("double"))
        case org.apache.spark.sql.types.DateType =>
          Some(unix_date(col(c)).cast("double"))
        case _: org.apache.spark.sql.types.NumericType =>
          Some(col(c).cast("double"))
        case _ => None
      }
    val kllCols = statsCols.filter(c => kllInput(c).isDefined)
    val kllAgg = udaf(new graft.functions.KllDoubleAgg(128),
      org.apache.spark.sql.Encoders.scalaDouble)
    val aggs = (statsCols.flatMap(c => Seq(
      bound(c, isMin = true).as(s"min_$c"),
      bound(c, isMin = false).as(s"max_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
      base64(hll_sketch_agg(sketchable(c), 9)).as(s"hll_$c"),
      (if (isStr(c))
         coalesce(sum(length(col(c)).cast("long")), lit(0L))
       else lit(0L)).as(s"lensum_$c"),
      (if (isStr(c))
         coalesce(max(length(col(c)).cast("long")), lit(0L))
       else lit(0L)).as(s"lenmax_$c"))) :+
      count(lit(1L)).as("__rows")) ++
      // NaN marks NULL for the sketch (skipped in the reducer): a raw
      // null through the udaf's primitive input would inject 0.0
      kllCols.map(c => base64(kllAgg(coalesce(kllInput(c).get,
        lit(Double.NaN)))).as(s"kll_$c"))
    val rows = spark.read.schema(schema)
      .parquet(files.map(f => s"$table/$f"): _*)
      .groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val fileSet = files.toSet
    val W = 6 // accumulators per column
    val kllBase = 2 + W * statsCols.size // first kll slot
    val perFile = rows.flatMap { r =>
      // O(1) key extraction per row (extract-then-decode), not an
      // O(files) endsWith scan — and exact for URI-special characters
      relKeyFromUri(r.getString(0)).filter(fileSet).map { rel =>
        val stats = statsCols.zipWithIndex.flatMap { case (c, i) =>
          val mn = r.getString(1 + W * i)
          val mx = r.getString(2 + W * i)
          if (mn == null || mx == null) None else Some(c -> ((mn, mx)))
        }.toMap
        val extras =
          Map("rows" -> r.getLong(1 + W * statsCols.size).toString) ++
          statsCols.zipWithIndex.flatMap { case (c, i) =>
            Seq(s"nulls.$c" -> r.getLong(3 + W * i).toString,
              s"lensum.$c" -> r.getLong(5 + W * i).toString,
              s"lenmax.$c" -> r.getLong(6 + W * i).toString) ++
              Option(r.getString(4 + W * i)).map(s"hll.$c" -> _)
          } ++
          kllCols.zipWithIndex.flatMap { case (c, j) =>
            Option(r.getString(kllBase + j)).map(s"kll.$c" -> _)
          }
        (rel, stats, extras)
      }
    }
    (perFile.map { case (rel, st, _) => rel -> st }.toMap,
      perFile.map { case (rel, _, x) => rel -> x }.toMap)
  }

  /** String order matching how string stats were RECORDED: Spark's
    * min/max on strings orders by UTF8String binary comparison, which
    * equals code-point order — while Java's String <= orders by UTF-16
    * code units. The two disagree whenever a supplementary character
    * (>= U+10000, surrogate-encoded) meets U+E000..U+FFFF, and a wrong
    * order here silently EXCLUDES a file that contains matching rows —
    * the worst failure mode a skipping layer can have. Compare by code
    * point.
    */
  private[graft] def codePointLe(x: String, y: String): Boolean = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val a = x.codePointAt(i)
      val b = y.codePointAt(j)
      if (a != b) return a < b
      i += Character.charCount(a)
      j += Character.charCount(b)
    }
    i >= x.length // x exhausted first (or equal) => x <= y
  }

  /** An observed long metric, null-safe (a sum over zero rows is null)
    * — with a FALLBACK job for the case where the metric was LOST:
    * AQE's runtime empty-relation propagation replaces a subtree whose
    * shuffle output turned out empty (e.g. a delete that leaves no
    * survivors) and the final adaptive plan then no longer contains the
    * CollectMetrics node, so the observation resolves to an EMPTY map
    * even though the scan ran (reproduced on 4.1.2). The fast path
    * stays job-free; the rare lost path recomputes.
    */
  private[sources] def observedLong(metrics: Map[String, Any], name: String)(
      fallback: => Long): Long =
    metrics.get(name) match {
      case Some(null) => 0L
      case Some(n: java.lang.Long) => n.longValue
      case Some(other) => other.toString.toLong
      case None => fallback
    }

  private def declaredStatsCols(snap: Snapshot): Seq[String] =
    snap.meta.get("statsCols").toSeq
      .flatMap(_.split(',').toSeq).filter(_.nonEmpty)

  /** Manifest-aggregated PER-COLUMN statistics for the CBO
    * ([[org.apache.spark.sql.catalyst.catalog.CatalogColumnStat]]):
    * min/max fold the per-file bounds, null counts sum, NDV merges the
    * per-file HLL sketches (sketch union — exact-shape, zero data IO;
    * the Iceberg puffin-theta design at lgK=9), and string avg/max
    * lengths derive from the recorded length sums. Honesty rules match
    * the table-level row count: a column publishes a piece only when
    * EVERY live file carries what that piece needs (a file whose
    * values are all null legitimately has no bounds — its null count
    * vouches for it), and nothing publishes over outstanding deletion
    * vectors. min/max render in `CatalogColumnStat.fromExternalString`
    * v2 form: numerics as recorded, timestamps as the epoch micros the
    * stats already use, dates converted ISO → epoch days; string
    * bounds are not published (Spark's own ANALYZE doesn't either).
    */
  private[graft] def manifestColumnStats(snap: Snapshot)
      : Map[String, org.apache.spark.sql.catalyst.catalog
        .CatalogColumnStat] = {
    import org.apache.spark.sql.types._
    if (snap.deleteFiles.nonEmpty || snap.files.isEmpty) return Map.empty
    val files = snap.files
    def extraLongs(key: String): Option[Seq[Long]] = {
      val per = files.map(f => snap.extraOf.get(f).flatMap(_.get(key))
        .flatMap(s => scala.util.Try(s.toLong).toOption))
      if (per.forall(_.isDefined)) Some(per.flatten) else None
    }
    val rowsPer = extraLongs("rows")
    declaredStatsCols(snap).filter(snap.schema.fieldNames.contains)
      .flatMap { c =>
        val dt = snap.schema(c).dataType
        val nullsPer = extraLongs(s"nulls.$c")
        val nullCount = nullsPer.map(ns => BigInt(ns.sum))
        // NDV: union the per-file sketches driver-side
        val ndv: Option[BigInt] = {
          val sk = files.map(f =>
            snap.extraOf.get(f).flatMap(_.get(s"hll.$c")))
          if (!sk.forall(_.isDefined)) None
          else scala.util.Try {
            val u = new org.apache.datasketches.hll.Union(9)
            sk.flatten.foreach(b64 =>
              // MIME decoder: Spark's base64() chunk-wraps long output
              // with newlines (RFC 2045), which the basic decoder
              // rejects
              u.update(org.apache.datasketches.hll.HllSketch.heapify(
                java.util.Base64.getMimeDecoder.decode(b64))))
            BigInt(math.round(u.getEstimate))
          }.toOption
        }
        // bounds: every file must either carry them or be all-null
        // (its recorded null count equals its recorded row count)
        val boundsOk = (nullsPer, rowsPer) match {
          case (Some(ns), Some(rs)) =>
            files.lazyZip(ns).lazyZip(rs).forall { (f, n, r) =>
              snap.statsOf.get(f).exists(_.contains(c)) || n == r
            }
          case _ => false
        }
        val recorded = files.flatMap(f =>
          snap.statsOf.get(f).flatMap(_.get(c)))
        val numericLike = dt.isInstanceOf[NumericType] ||
          dt == TimestampType
        val (mnOpt, mxOpt): (Option[String], Option[String]) =
          if (!boundsOk || recorded.isEmpty) (None, None)
          else if (numericLike) {
            val ds = recorded.flatMap { case (a, b) =>
              scala.util.Try((BigDecimal(a), BigDecimal(b))).toOption }
            if (ds.size != recorded.size) (None, None)
            else (Some(ds.map(_._1).min.toString),
              Some(ds.map(_._2).max.toString))
          } else if (dt == DateType) {
            scala.util.Try {
              val lo = recorded.map(_._1).map(java.time.LocalDate.parse)
                .min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
              val hi = recorded.map(_._2).map(java.time.LocalDate.parse)
                .max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
              (Some(lo.toEpochDay.toString), Some(hi.toEpochDay.toString))
            }.getOrElse((None, None))
          } else if (dt == BooleanType) {
            (recorded.map(_._1).reduceOption((a, b) =>
               if (codePointLe(a, b)) a else b),
             recorded.map(_._2).reduceOption((a, b) =>
               if (codePointLe(a, b)) b else a))
          } else (None, None)
        // lengths: recorded for strings; fixed-width types use the
        // type's size like Spark's own ANALYZE
        val (avgLen, maxLen): (Option[Long], Option[Long]) =
          if (dt == StringType) {
            val lens = extraLongs(s"lensum.$c")
            val lmax = extraLongs(s"lenmax.$c")
            val nonNull = for (r <- rowsPer; n <- nullsPer)
              yield r.sum - n.sum
            (for (ls <- lens; nn <- nonNull; if nn > 0)
               yield ls.sum / nn,
             lmax.map(_.max))
          } else (Some(dt.defaultSize.toLong),
            Some(dt.defaultSize.toLong))
        // EQUI-HEIGHT HISTOGRAM from the per-file KLL quantile
        // sketches (mergeable, like the HLL-NDV): bin endpoints are
        // the merged sketch's quantile ladder in the estimator's
        // double domain, so a SKEWED predicate's selectivity tracks
        // the true fraction — a heavy value spans many single-value
        // bins (lo == hi, ndv 1), which min/max/NDV alone flattens to
        // the uniform estimate. Per-bin NDV for mixed bins is the
        // uniform share of the sketch-union NDV (bins hold equal row
        // counts; lo==hi bins are exact at 1).
        val histogram: Option[org.apache.spark.sql.catalyst.plans
          .logical.Histogram] =
          if (!(numericLike || dt == DateType)) None
          else scala.util.Try {
            val per = files.map(f =>
              snap.extraOf.get(f).flatMap(_.get(s"kll.$c")))
            // every file must carry a sketch or be all-null
            val ok = (nullsPer, rowsPer) match {
              case (Some(ns), Some(rs)) =>
                files.lazyZip(ns).lazyZip(rs).lazyZip(per).toList
                  .forall { case (_, n, r, s) => s.isDefined || n == r }
              case _ => false
            }
            if (!ok) None
            else {
              val merged = org.apache.datasketches.kll
                .KllDoublesSketch.newHeapInstance(128)
              per.flatten.foreach(b64 => merged.merge(
                org.apache.datasketches.kll.KllDoublesSketch.heapify(
                  org.apache.datasketches.memory.Memory.wrap(
                    java.util.Base64.getMimeDecoder.decode(b64)))))
              val totalNonNull = (for (r <- rowsPer; n <- nullsPer)
                yield r.sum - n.sum).getOrElse(0L)
              if (merged.isEmpty || totalNonNull <= 0) None
              else {
                val numBins = math.max(1, math.min(
                  org.apache.spark.sql.internal.SQLConf.get
                    .histogramNumBins, totalNonNull).toInt)
                val qs = (0 to numBins).map { i =>
                  if (i == 0) merged.getMinItem
                  else if (i == numBins) merged.getMaxItem
                  else merged.getQuantile(i.toDouble / numBins)
                }
                val ndvShare = math.max(1L,
                  ndv.map(_.toLong).getOrElse(numBins.toLong) /
                    numBins)
                val bins = (0 until numBins).map { i =>
                  val (lo, hi) = (qs(i), qs(i + 1))
                  org.apache.spark.sql.catalyst.plans.logical
                    .HistogramBin(lo, hi,
                      if (lo == hi) 1L else ndvShare)
                }.toArray
                Some(org.apache.spark.sql.catalyst.plans.logical
                  .Histogram(totalNonNull.toDouble / numBins, bins))
              }
            }
          }.toOption.flatten
        val any = ndv.isDefined || nullCount.isDefined ||
          mnOpt.isDefined || mxOpt.isDefined
        if (!any) None
        else Some(c -> org.apache.spark.sql.catalyst.catalog
          .CatalogColumnStat(ndv, mnOpt, mxOpt, nullCount,
            avgLen, maxLen, histogram))
      }.toMap
  }

  private def declaredBloomCols(snap: Snapshot): Seq[String] =
    snap.meta.get("bloomCols").toSeq
      .flatMap(_.split(',').toSeq).filter(_.nonEmpty)

  /** The table's declared clustering key (`clusterCols` metadata, set
    * by [[createClustered]] or a clustered [[compact]]): staging sorts
    * every fresh batch within partitions on it — appends and mutation
    * rewrites keep per-file min/max ranges tight — and maintenance
    * compaction range-resorts the whole table on it.
    */
  private def declaredClusterCols(snap: Snapshot): Seq[String] =
    snap.meta.get("clusterCols").toSeq
      .flatMap(_.split(',').toSeq).filter(_.nonEmpty)

  private def bloomSidecarPath(table: String, batch: String,
      col: String): Path =
    new Path(s"$table/data/$batch",
      "bloom-" + java.net.URLEncoder.encode(col, "UTF-8") + ".idx")

  private val BloomMarker = "graft-bloom-1"

  /** Per-file bloom sidecars for a FRESHLY STAGED batch: one
    * aggregation pass over the new files (grouped by provenance, custom
    * mergeable bloom aggregate — never a job per file), one small
    * sidecar text file per (batch, column) next to the data. Sidecars
    * are immutable like the data files they index: carried-over files
    * keep their original batch's sidecar, so mutations never degrade
    * index coverage, and batch-dir GC removes index and data together.
    */
  private def writeBloomSidecars(spark: SparkSession, table: String,
      files: Seq[String], bloomCols: Seq[String], schema: StructType,
      fpp: Double = 0.01): Unit = {
    if (files.isEmpty || bloomCols.isEmpty) return
    import spark.implicits._
    val batches = files.map(_.split('/')(1)).distinct
    val rowsPerFile = math.max(1024L,
      spark.read.schema(schema).parquet(files.map(f => s"$table/$f"): _*)
        .count() / files.size)
    val agg = new graft.functions.BloomLongAgg(rowsPerFile * 2, fpp)
    bloomCols.foreach { c =>
      require(schema(c).dataType ==
        org.apache.spark.sql.types.LongType,
        s"bloom index requires a BIGINT column, got ${schema(c).dataType} for $c")
      val perFile = spark.read.schema(schema)
        .parquet(files.map(f => s"$table/$f"): _*)
        .select(input_file_name().as("__f"), col(c).as("__v"))
        .filter(col("__v").isNotNull)
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg.toColumn.name("bloom"))
        .collect()
      val fileSet = files.toSet
      val byBatch = perFile.flatMap { case (abs, bytes) =>
        relKeyFromUri(abs).filter(fileSet)
          .map(rel => (rel.split('/')(1), rel, bytes))
      }.groupBy(_._1)
      batches.foreach { b =>
        val entries = byBatch.getOrElse(b, Array.empty)
        val body = (BloomMarker +: entries.sortBy(_._2).map { case (_, rel, bytes) =>
          rel + "\t" + java.util.Base64.getEncoder.encodeToString(bytes)
        }.toSeq).mkString("\n")
        val out = fs(spark, table).create(bloomSidecarPath(table, b, c), true)
        try out.write(body.getBytes("UTF-8")) finally out.close()
      }
    }
  }

  /** Load the bloom for each of `files` on `column`, reading each
    * distinct batch's sidecar ONCE (metadata-tier IO: one small file per
    * batch). Files without an entry map to None — they stay unprunable,
    * preserving exactness.
    */
  private def loadBlooms(spark: SparkSession, table: String,
      files: Seq[String], column: String)
      : Map[String, org.apache.spark.util.sketch.BloomFilter] = {
    val f = fs(spark, table)
    files.map(_.split('/')(1)).distinct.flatMap { b =>
      val p = bloomSidecarPath(table, b, column)
      if (!f.exists(p)) Nil
      else {
        val in = f.open(p)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
          finally in.close()
        if (!lines.headOption.contains(BloomMarker)) Nil
        else lines.drop(1).filter(_.nonEmpty).map { l =>
          val Array(rel, b64) = l.split('\t')
          rel -> org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(
              java.util.Base64.getDecoder.decode(b64)))
        }
      }
    }.toMap
  }

  /** Create a table with per-file BLOOM SIDECAR indexes on `bloomCols`
    * (BIGINT columns): point lookups on those columns skip files
    * WITHOUT any clustering requirement — a specific key lives in ~1 of
    * N hash-distributed files, and the bloom proves absence for the
    * rest (min/max stats are useless there: every file spans the whole
    * key range). The sidecars live beside their batch's data files, so
    * the manifest stays file-list-sized; every mutation re-indexes its
    * staged batch ([[stageFor]]), so coverage never degrades.
    */
  def createBloomIndexed(spark: SparkSession, table: String, df: DataFrame,
      bloomCols: Seq[String], numFiles: Int = 8): Long = {
    require(currentVersion(spark, table) == 0,
      s"$table already has committed snapshots")
    val files = stageBatch(df.repartition(numFiles), table)
    writeBloomSidecars(spark, table, files, bloomCols, df.schema)
    commitManifest(spark, table, df.schema, files, 0L,
      Map("bloomCols" -> bloomCols.mkString(",")))
  }

  /** Point-lookup read on a bloom-indexed column: prune every file
    * whose bloom rejects ALL probe values (no false negatives — a
    * skipped file provably holds none of them), then apply the exact
    * residual filter to the survivors. False positives only widen the
    * scan, never the result.
    */
  def readWherePoint(spark: SparkSession, table: String, column: String,
      values: Set[Long], version: Option[Long] = None): DataFrame = {
    val snap = version match {
      case Some(v) => readManifest(spark, table, v)
      case None => loadCurrent(spark, table)
    }
    // sidecar files are immutable and keyed by the column name AT
    // WRITE TIME: after a rename, pre-rename batches hold
    // `bloom-<formerName>.idx` — probe the whole name lineage so
    // point-lookup pruning survives metadata-only renames (first hit
    // wins; each batch wrote exactly one generation)
    val lineage = column +: colMapOf(snap).getOrElse(column, Nil)
    val blooms = lineage.foldLeft(
        Map.empty[String, org.apache.spark.util.sketch.BloomFilter]) {
      (acc, name) => loadBlooms(spark, table, snap.files, name)
        .foldLeft(acc) { case (a, (k, v)) =>
          if (a.contains(k)) a else a + (k -> v) }
    }
    val kept = snap.files.filter { rel =>
      blooms.get(rel) match {
        case Some(bf) => values.exists(bf.mightContainLong)
        case None => true
      }
    }
    readFilesDv(spark, table, snap, kept)
      .filter(col(column).isin(values.toSeq: _*))
  }

  /** Stage `df` respecting the table's declared layout metadata: a
    * partitioned table keeps EVERY new batch partition-labeled, a
    * stats-tracking table re-computes per-file min/max for its declared
    * columns, and a bloom-indexed table writes fresh sidecars for the
    * staged batch — mutations never degrade manifest pruning or the
    * point-lookup index.
    */
  private def stageFor(snap: Snapshot, df: DataFrame, table: String)
      : (Seq[String], Map[String, String],
         Map[String, Map[String, (String, String)]],
         Map[String, Map[String, String]]) = {
    // identity-TIMESTAMP partition labels derive via cast-to-string,
    // which renders in the SESSION zone — a batch staged under a zone
    // different from the table's pinned staging zone would label files
    // in a second domain, silently excluded by every later
    // label-rendered comparison. Fail loudly instead.
    snap.meta.get("stagingTz").foreach { tz =>
      val cur = df.sparkSession.sessionState.conf.sessionLocalTimeZone
      require(cur == tz,
        s"session timezone $cur differs from $table's pinned staging " +
          s"timezone $tz — identity TIMESTAMP partition labels would " +
          s"mix derivation domains; set spark.sql.session.timeZone=$tz " +
          "to write this table")
    }
    // CHECK constraints ride the staging write as observed metrics (no
    // extra pass): a row violates when its predicate is false OR null
    // (the Delta rule). Violations surface AFTER the batch is staged
    // but BEFORE anything is committed — the staged files are deleted
    // and the verb throws, so the table is untouched.
    val cons = constraintsOf(snap)
    val (df1, obs) =
      if (cons.isEmpty) (df, None)
      else {
        val o = org.apache.spark.sql.Observation()
        val aggs = cons.map { case (n, e) =>
          sum(when(coalesce(expr(e), lit(false)), 0L).otherwise(1L)).as(n)
        }
        (df.observe(o, aggs.head, aggs.tail: _*), Some(o))
      }
    // declared clustering: every fresh batch sorts within its write
    // tasks on the cluster key (batch-local, no extra shuffle), so
    // per-file min/max ranges stay tight and range pruning keeps
    // working as the table mutates — full re-clustering is compact()'s
    // job, this keeps the decay slow between compactions
    val clusterSort = declaredClusterCols(snap).map(c => col(s"`$c`"))
    // a clustered PARTITIONED batch range-partitions, and
    // repartitionByRange SAMPLES its input in a separate job — any
    // Observation riding the plan (the constraint metrics above, or
    // the verbs' inserted/matched/deleted counts attached upstream)
    // would fire twice and report doubled counts. Barrier once (same
    // recipe as assignIdentity) so the observed plan executes exactly
    // once and the range shuffle reads the checkpointed rows.
    val rangeStaged = clusterSort.nonEmpty &&
      (snap.meta.contains("partitionCols") ||
        snap.meta.contains("partitionCol"))
    val dfIn = if (rangeStaged) df1.localCheckpoint() else df1
    val (files, labels) =
      if (bucketSpecOf(snap).isDefined &&
          (snap.meta.contains("partitionSpec") ||
            snap.meta.contains("partitionCols"))) {
        // PARTITION × BUCKET: relabel through the declared transforms
        // AND re-bucket, so both the pruning tuples and the BucketSpec
        // stay true through every mutation
        val Some((bcols, n)) = bucketSpecOf(snap)
        val sortWithin =
          if (clusterSort.nonEmpty) clusterSort
          else bucketSortOf(snap).map(c => col(s"`$c`"))
        val staged = stagePartitionedBucketedBatch(dfIn, table,
          partitionTransformsOf(snap).map(t =>
            t.labelCol(col(s"`${t.source}`"))), bcols, n, sortWithin)
        (staged.map(_._1), staged.toMap)
      } else if (snap.meta.contains("partitionSpec")) {
        // hidden partitioning: every staged batch re-derives labels
        // from row values through the declared transforms, so
        // mutations and appends can never drift from the spec
        val staged = stageLabeledBatchMulti(dfIn, table,
          partitionSpecOf(snap).map(t =>
            t.labelCol(col(s"`${t.source}`"))), clusterSort)
        (staged.map(_._1), staged.toMap)
      } else if (snap.meta.contains("partitionCols")) {
        val staged = stagePartitionedBatchMulti(dfIn, table,
          partitionColsOf(snap), clusterSort)
        (staged.map(_._1), staged.toMap)
      } else snap.meta.get("partitionCol") match {
        case Some(pc) =>
          val staged = stagePartitionedBatch(dfIn, table, pc, clusterSort)
          (staged.map(_._1), staged.toMap)
        case None => bucketSpecOf(snap) match {
          case Some((bc, n)) =>
            // bucketed layout: EVERY batch re-buckets (and re-sorts
            // within buckets when a bucket sort is declared), so the
            // declared BucketSpec stays true for the whole file list
            // and the shuffle-free join property never degrades
            val sortWithin =
              if (clusterSort.nonEmpty) clusterSort
              else bucketSortOf(snap).map(c => col(s"`$c`"))
            (stageBucketedBatch(dfIn, table, bc, n, sortWithin),
              Map.empty[String, String])
          case None =>
            val arranged =
              if (clusterSort.isEmpty) dfIn
              else dfIn.sortWithinPartitions(clusterSort: _*)
            (stageBatch(arranged, table), Map.empty[String, String])
        }
      }
    // the staged parquet now holds the rows — release the barrier copy
    // instead of waiting for the ContextCleaner
    if (rangeStaged) dfIn.unpersist(blocking = false)
    obs.foreach { o =>
      val m = o.get
      val viol = cons.map { case (n, _) =>
        n -> (m.get(n) match {
          case Some(x: java.lang.Number) => x.longValue
          case _ => 0L
        })
      }.filter(_._2 > 0)
      if (viol.nonEmpty) {
        dropStagedBatches(df.sparkSession, table, files)
        throw new ConstraintViolationException(
          s"batch rejected by CHECK constraint(s): " +
            viol.map { case (n, c) => s"$n ($c rows)" }.mkString(", "))
      }
    }
    val (stats, extras) = computeStats(df.sparkSession, table, files,
      declaredStatsCols(snap), snap.schema)
    writeBloomSidecars(df.sparkSession, table, files,
      declaredBloomCols(snap), snap.schema)
    (files, labels, stats, extras)
  }

  /** SQL's unresolved-column rule for UPDATE: every SET target must
    * name an existing top-level column — a typo'd assignment silently
    * dropped (files rewritten unchanged, success reported) is the
    * worst failure mode a mutation verb can have.
    */
  private def requireAssignable(schema: StructType,
      assignments: Map[String, Column]): Unit = {
    val known = schema.fieldNames.toSet
    val unknown = assignments.keys.filterNot(known)
    require(unknown.isEmpty,
      s"UPDATE assigns unknown column(s): ${unknown.mkString(", ")} " +
        s"(table columns: ${schema.fieldNames.mkString(", ")})")
  }

  /** Remove a set of staged-but-unwanted files' whole BATCH DIRS
    * (recursive — part files, _SUCCESS, checksums, partition subdirs):
    * the one cleanup shape shared by the constraint-rejection path and
    * the all-deleted / nothing-inserted no-op paths.
    */
  private def dropStagedBatches(spark: SparkSession, table: String,
      files: Seq[String]): Unit = {
    val f = fs(spark, table)
    files.map(_.split('/')(1)).distinct.foreach(b =>
      f.delete(new Path(s"$table/data/$b"), true))
  }

  private def constraintsOf(snap: Snapshot): Seq[(String, String)] =
    snap.meta.toSeq.collect {
      case (k, v) if k.startsWith("constraint.") =>
        k.stripPrefix("constraint.") -> v
    }.sortBy(_._1)

  /** Add a CHECK constraint (the Delta `ALTER TABLE ADD CONSTRAINT`
    * shape): existing data is validated in one DV-aware scan, then the
    * predicate commits as table metadata — every subsequent mutation
    * verb enforces it on its staged batch via an observed metric
    * riding the stage write (violating batches are rejected atomically,
    * staged files cleaned, table untouched).
    */
  def addConstraint(spark: SparkSession, table: String, name: String,
      predicateSql: String): Long = {
    // `graft__` prefixes the engine's OWN constraints (SET NOT NULL
    // sugar) — a user constraint there could collide with, or be
    // silently dropped by, DROP NOT NULL
    require(!name.startsWith("graft__"),
      s"constraint names starting with graft__ are reserved for the " +
        s"engine (got '$name')")
    addConstraintInternal(spark, table, name, predicateSql)
  }

  private def addConstraintInternal(spark: SparkSession, table: String,
      name: String, predicateSql: String): Long = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"constraint name must be [A-Za-z0-9_]+, got '$name'")
    require(!predicateSql.exists(c => c == '\n' || c == '\r'),
      "constraint predicate must be single-line")
    val snap = loadCurrent(spark, table)
    val bad = readFilesDv(spark, table, snap, snap.files)
      .filter(!coalesce(expr(predicateSql), lit(false))).count()
    if (bad > 0) throw new ConstraintViolationException(
      s"existing data violates $name: $bad rows")
    commitManifest(spark, table, snap.schema, snap.files, snap.version,
      snap.meta + (s"constraint.$name" -> predicateSql),
      snap.partitionOf, snap.statsOf, snap.deleteFiles, Some(snap),
      snap.extraOf)
  }

  /** Drop a CHECK constraint — a metadata-only commit. */
  def dropConstraint(spark: SparkSession, table: String,
      name: String): Long = {
    val snap = loadCurrent(spark, table)
    commitManifest(spark, table, snap.schema, snap.files, snap.version,
      snap.meta - s"constraint.$name",
      snap.partitionOf, snap.statsOf, snap.deleteFiles, Some(snap),
      snap.extraOf)
  }

  private def fileLine(p: String, partitionOf: Map[String, String],
      statsOf: Map[String, Map[String, (String, String)]],
      extraOf: Map[String, Map[String, String]]): String = {
    def enc(x: String) = java.net.URLEncoder.encode(x, "UTF-8")
    val partField = partitionOf.get(p).map(v => s"p=$v")
    val statField = statsOf.get(p).filter(_.nonEmpty).map(st =>
      "s=" + st.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
        s"${enc(c)}|${enc(mn)}|${enc(mx)}"
      }.mkString(";"))
    val extraField = extraOf.get(p).filter(_.nonEmpty).map(x =>
      "x=" + x.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${enc(k)}|${enc(v)}"
      }.mkString(";"))
    (p +: (partField.toSeq ++ statField.toSeq ++ extraField.toSeq))
      .mkString("\t")
  }

  private def renderManifest(schema: StructType, files: Seq[String],
      meta: Map[String, String],
      partitionOf: Map[String, String],
      statsOf: Map[String, Map[String, (String, String)]],
      deleteFiles: Seq[String] = Nil,
      extraOf: Map[String, Map[String, String]] = Map.empty): Array[Byte] =
    (Seq(Marker, "schema:" + schema.json) ++
      meta.toSeq.sortBy(_._1).map { case (k, v) => s"meta:$k=$v" } ++
      deleteFiles.map(d => s"dv:$d") ++
      files.map(p => fileLine(p, partitionOf, statsOf, extraOf)))
      .mkString("\n").getBytes("UTF-8")

  /** A DELTA manifest: adds/removes against `baseVersion` instead of
    * the full file list — commit metadata cost O(churn), not O(table
    * files). Meta and the DV list are still written whole (both are
    * small/churn-sized and each manifest stays authoritative for them).
    */
  private def renderDelta(schema: StructType, baseVersion: Long,
      depth: Int, meta: Map[String, String], deleteFiles: Seq[String],
      removed: Seq[String], added: Seq[String],
      partitionOf: Map[String, String],
      statsOf: Map[String, Map[String, (String, String)]],
      extraOf: Map[String, Map[String, String]]): Array[Byte] =
    (Seq(Marker, "schema:" + schema.json,
      s"base:$baseVersion", s"depth:$depth") ++
      meta.toSeq.sortBy(_._1).map { case (k, v) => s"meta:$k=$v" } ++
      deleteFiles.map(d => s"dv:$d") ++
      removed.map(r => s"rm:$r") ++
      added.map(p => fileLine(p, partitionOf, statsOf, extraOf)))
      .mkString("\n").getBytes("UTF-8")

  /** Delta chains re-anchor with a full manifest after this many links
    * so resolution stays O(1) small reads and expiry retains a bounded
    * tail of chain manifests.
    */
  private val MaxChainDepth = 16

  /** Partitioned tables at or above this many files anchor as GROUPED
    * (two-tier) manifests: scan planning with a pruning predicate then
    * reads only the matching partition groups' metadata, and the
    * periodic re-anchor rewrites only churned groups. Below it a
    * single manifest file is cheaper than one-file-per-group IO.
    */
  private[sources] val GroupedManifestMinFiles = 48

  private def partitionLayout(meta: Map[String, String]): Boolean =
    meta.contains("partitionCol") || meta.contains("partitionCols") ||
      meta.contains("partitionSpec")

  private def shouldGroup(meta: Map[String, String], nFiles: Int)
      : Boolean =
    nFiles >= GroupedManifestMinFiles &&
      (partitionLayout(meta) || meta.contains("clusterCols"))

  /** Cluster-range chunk width: an UNPARTITIONED CLUSTERED table's
    * grouped anchor chunks each write batch's (range-sorted) file run
    * into groups of this many files — a clustered compact's output is
    * range-disjoint, so consecutive chunks carry disjoint cluster-key
    * bounds and a narrow range predicate admits ~one chunk.
    */
  private[sources] val ClusterGroupChunk = 16

  private def batchDirOf(rel: String): String = rel.split('/')(1)

  /** Synthetic cluster-chunk group label: `#<batch>#<index>`. Purely a
    * group identity for reuse tracking — never a partition value, and
    * admission never treats it as one.
    */
  private def chunkLabel(batch: String, idx: Int): String = s"#$batch#$idx"

  private def chunkBatchOf(label: String): Option[String] =
    if (label.startsWith("#")) label.split('#').lift(1) else None

  private def sha1hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Inject per-file on-disk sizes (the `bytes` extra attribute) for
    * entries lacking one — one listStatus per batch DIR, never a
    * per-file RPC. Recorded sizes let scan planning build FileStatus
    * from the manifest alone (zero filesystem listing on the read
    * path — the Delta/Iceberg "the metadata IS the listing" shape)
    * and give grouped anchors their per-group byte totals.
    */
  private def withFileBytes(spark: SparkSession, table: String,
      paths: Seq[String],
      extraOf: Map[String, Map[String, String]])
      : Map[String, Map[String, String]] = {
    val missing = paths.filterNot(p =>
      extraOf.get(p).exists(_.contains("bytes")))
    if (missing.isEmpty) return extraOf
    val f = fs(spark, table)
    val byDir = missing.groupBy(r =>
      r.split('/').dropRight(1).mkString("/"))
    val found = byDir.keysIterator.flatMap { dir =>
      try f.listStatus(new Path(table, dir)).iterator
        .filter(_.isFile)
        .map(st => s"$dir/${st.getPath.getName}" -> st.getLen)
      catch { // a path outside the expected layout: stay lazy for it
        case _: java.io.FileNotFoundException =>
          Iterator.empty[(String, Long)]
      }
    }.toMap
    missing.foldLeft(extraOf) { (acc, p) =>
      found.get(p) match {
        case Some(len) => acc + (p ->
          (acc.getOrElse(p, Map.empty) + ("bytes" -> len.toString)))
        case None => acc
      }
    }
  }

  /** Write a GROUPED (two-tier) full manifest: file entries grouped by
    * partition label into CONTENT-ADDRESSED group files under
    * `_manifests/groups/`, the anchor carrying one
    * `grp:<file> <label> <count> <bytes>` line per group. Groups whose
    * membership (and per-file stats) the chain since the previous
    * anchor did not touch are REUSED from `base.cleanGroups` without
    * re-rendering or re-writing — the every-MaxChainDepth re-anchor
    * costs O(churned partitions), not O(table files); content
    * addressing additionally dedupes identical groups across anchors,
    * restores and time travel. Returns the anchor body.
    */
  private def renderGroupedManifest(spark: SparkSession, table: String,
      schema: StructType, files: Seq[String], meta: Map[String, String],
      partitionOf: Map[String, String],
      statsOf: Map[String, Map[String, (String, String)]],
      deleteFiles: Seq[String],
      extraOf: Map[String, Map[String, String]],
      base: Option[Snapshot]): Array[Byte] = {
    val f = fs(spark, table)
    val gDir = new Path(manifestDir(table), "groups")
    f.mkdirs(gDir)
    val clusterMode = !partitionLayout(meta)
    // labels reusable from the base's anchor: untouched through the
    // chain (cleanGroups) AND untouched by THIS commit's add/remove
    // AND carrying unchanged per-file stats/extras (a stats backfill
    // re-publishes the label's group — stale stats are a silent
    // mis-pruning hazard). Cluster-chunk labels dirty at BATCH
    // granularity: chunk membership is a function of the batch's
    // surviving sorted file run, so any touched file invalidates every
    // chunk of its batch (a shifted run could otherwise alias an old
    // chunk's count).
    val reusable: Map[String, GroupRef] = base match {
      case Some(b) if b.cleanGroups.nonEmpty =>
        val baseSet = b.files.toSet
        val targetSet = files.toSet
        val touched = b.files.filterNot(targetSet) ++
          files.filterNot(baseSet) ++
          files.filter(p => baseSet(p) &&
            (statsOf.get(p) != b.statsOf.get(p) ||
              extraOf.get(p) != b.extraOf.get(p)))
        val dirty =
          if (clusterMode) {
            val dirtyBatches = touched.map(batchDirOf).toSet
            b.cleanGroups.keySet.filter(l =>
              chunkBatchOf(l).exists(dirtyBatches.contains))
          } else touched.flatMap(partitionOf.get).toSet
        b.cleanGroups -- dirty
      case _ => Map.empty
    }
    // group-level column BOUNDS folded over the members' recorded
    // stats: a column participates only when EVERY member carries it
    // (a missing member bound makes the group bound unknowable) and,
    // for numeric/timestamp columns, every value parses (an
    // unparseable bound could silently mis-prune). Soundness first:
    // omitted columns simply don't prune at group level.
    def groupStats(members: Seq[String])
        : Map[String, (String, String)] = {
      val perFile = members.map(p => statsOf.getOrElse(p,
        Map.empty[String, (String, String)]))
      if (perFile.exists(_.isEmpty)) return Map.empty
      val common = perFile.map(_.keySet).reduce(_ intersect _)
      common.iterator.flatMap { c =>
        val numeric = schema.fieldNames.contains(c) &&
          (schema(c).dataType
            .isInstanceOf[org.apache.spark.sql.types.NumericType] ||
            schema(c).dataType ==
              org.apache.spark.sql.types.TimestampType)
        val bounds = perFile.map(_(c))
        if (numeric) {
          try {
            val mns = bounds.map(b => BigDecimal(b._1) -> b._1)
            val mxs = bounds.map(b => BigDecimal(b._2) -> b._2)
            Some(c -> ((mns.minBy(_._1)._2, mxs.maxBy(_._1)._2)))
          } catch { case _: NumberFormatException => None }
        } else Some(c -> ((
          bounds.map(_._1).reduce((a, x) =>
            if (codePointLe(a, x)) a else x),
          bounds.map(_._2).reduce((a, x) =>
            if (codePointLe(a, x)) x else a))))
      }.toMap
    }
    // PARTITIONED: one group per partition label. CLUSTERED
    // (unpartitioned): each batch's sorted file run chunked — a
    // clustered compact writes range-disjoint files, so chunks carry
    // tight disjoint bounds; batches are immutable, so chunk identity
    // is stable for reuse
    val byGroup: Seq[(Option[String], Seq[String])] =
      if (clusterMode)
        files.groupBy(batchDirOf).toSeq.sortBy(_._1).flatMap {
          case (b, fs0) =>
            fs0.sorted.grouped(ClusterGroupChunk).zipWithIndex.map {
              case (chunk, i) => (Some(chunkLabel(b, i)), chunk)
            }
        }
      else files.groupBy(partitionOf.get).toSeq
        .sortBy(_._1.getOrElse(""))
    val refs = byGroup.map { case (label, members) =>
      label.flatMap(reusable.get)
        .filter(_.count == members.size) match {
        case Some(ref) => ref
        case None =>
          val content = (GroupMarker +: members.sorted.map(p =>
            fileLine(p, partitionOf, statsOf, extraOf)))
            .mkString("\n").getBytes("UTF-8")
          val rel = s"groups/g-${sha1hex(content)}.grp"
          val gp = new Path(manifestDir(table), rel)
          if (!f.exists(gp)) {
            // content-addressed: two racing writers of the same name
            // hold identical bytes, so whoever renames first wins and
            // the loser's file is already correct on disk
            val tmp = new Path(gDir,
              s".tmp-${java.util.UUID.randomUUID()}")
            val out = f.create(tmp, false)
            try out.write(content) finally out.close()
            if (!f.rename(tmp, gp)) {
              f.delete(tmp, false)
              require(f.exists(gp), s"cannot publish group $rel")
            }
          }
          val bytes = members.foldLeft(0L) { (s, p) =>
            if (s < 0) s
            else extraOf.get(p).flatMap(_.get("bytes"))
              .flatMap(v => scala.util.Try(v.toLong).toOption) match {
              case Some(b) => s + b
              case None => -1L // unknown member: group total unknown
            }
          }
          GroupRef(rel, label, members.size, bytes,
            groupStats(members))
      }
    }
    (Seq(Marker, "schema:" + schema.json) ++
      meta.toSeq.sortBy(_._1).map { case (k, v) => s"meta:$k=$v" } ++
      deleteFiles.map(d => s"dv:$d") ++
      refs.map(g => s"grp:${g.rel}\t" +
        s"${g.label.map(l => "v" + enc(l)).getOrElse("-")}\t" +
        s"${g.count}\t${g.bytes}" +
        (if (g.stats.isEmpty) ""
         else "\ts=" + g.stats.toSeq.sortBy(_._1).map {
           case (c, (mn, mx)) => s"${enc(c)}|${enc(mn)}|${enc(mx)}"
         }.mkString(";"))))
      .mkString("\n").getBytes("UTF-8")
  }

  /** The IDENTITY partition sources a layout meta declares (transform
    * items like `days(ts)` derive zone-free labels and are excluded;
    * only bare identity columns render labels via the zone-dependent
    * cast-to-string).
    */
  private def identityPartitionSources(
      meta: Map[String, String]): Seq[String] =
    meta.get("partitionSpec") match {
      case Some(spec) => spec.split(",", -1).map(dec).map(_.trim)
        .filterNot(_.contains("(")).toSeq
      case None => meta.get("partitionCols")
        .map(_.split(",", -1).map(dec).toSeq)
        .orElse(meta.get("partitionCol").map(Seq(_)))
        .getOrElse(Nil)
    }

  /** Does this (schema, meta) pair need a pinned staging timezone it
    * does not have yet? True iff some identity partition source is a
    * TIMESTAMP column — the one label derivation that depends on the
    * session zone.
    */
  private def wantsStagingTz(schema: StructType,
      meta: Map[String, String]): Boolean =
    !meta.contains("stagingTz") &&
      identityPartitionSources(meta).exists(c =>
        schema.fieldNames.contains(c) && schema(c).dataType ==
          org.apache.spark.sql.types.TimestampType)

  /** The zone identity-timestamp partition labels were derived in:
    * the pinned staging zone when the manifest records one, else the
    * current session zone (pre-pin tables — unchanged behavior).
    */
  private[sources] def stagingTzOf(spark: SparkSession,
      snap: Snapshot): String =
    snap.meta.getOrElse("stagingTz",
      spark.sessionState.conf.sessionLocalTimeZone)

  /** The commit point: publish `files` as version `expected + 1`. Fails
    * (leaving staged files orphaned, all snapshots intact) if another
    * writer committed first — optimistic concurrency on the manifest
    * publish.
    *
    * O(churn) metadata: when the caller supplies the `base` snapshot it
    * mutated (every verb has it in hand), the manifest is written as a
    * DELTA — adds/removes against the base version — whenever that is
    * smaller than re-listing the table (it always is for a bounded
    * mutation of a large table) and the chain is shorter than
    * [[MaxChainDepth]]; otherwise a full manifest re-anchors the chain.
    * A 1-file append to an 800k-file table therefore writes O(1)
    * manifest bytes, not tens of MB (the Iceberg manifest-list shape,
    * collapsed to one level). Readers resolve the chain in
    * [[readManifest]]; [[compact]] naturally re-anchors (its delta
    * would exceed the full list); [[expireSnapshots]] retains chain
    * manifests that kept versions still resolve through.
    */
  private[graft] def commitManifest(spark: SparkSession, table: String,
      schema: StructType, files: Seq[String], expected: Long,
      meta0: Map[String, String] = Map.empty,
      partitionOf: Map[String, String] = Map.empty,
      statsOf: Map[String, Map[String, (String, String)]] = Map.empty,
      deleteFiles: Seq[String] = Nil, base: Option[Snapshot] = None,
      extraOf: Map[String, Map[String, String]] = Map.empty)
      : Long = {
    require(meta0.forall { case (k, v) =>
      !k.contains('=') && !(k + v).exists(c => c == '\n' || c == '\r') },
      "manifest meta keys/values must be line-safe and '='-free keys")
    require(partitionOf.values.forall(v =>
      !v.exists(c => c == '\n' || c == '\r' || c == '\t')),
      "partition values must be line- and tab-safe")
    // TIMESTAMP identity-partition labels are rendered by
    // cast-to-string, which is SESSION-TIMEZONE dependent — pin the
    // derivation timezone in the manifest at the commit that DECLARES
    // such a layout (create, or a layout change), so (a) later writes
    // under a DIFFERENT session zone fail loudly in stageFor instead
    // of silently mixing label domains, and (b) read-side literal
    // rendering (partitionLabelsWhere, the FileIndex identity-equality
    // path) uses the zone the labels were actually derived in — a zone
    // change between write and read must never exclude matching files.
    // DECLARATION-TIME ONLY (the r19 legacy-adoption fix): a
    // pre-existing table whose labels were derived under earlier,
    // possibly different session zones must NOT get pinned to whatever
    // zone the next commit happens to run under — that would codify a
    // wrong derivation zone, refuse writes from the original zone and
    // mis-render read literals. Such tables stay unpinned (session-zone
    // reads, the pre-pin behavior) until a layout redeclaration.
    val declaresLayout = expected == 0 || base.exists(b =>
      identityPartitionSources(b.meta) != identityPartitionSources(meta0))
    val meta = if (wantsStagingTz(schema, meta0) && declaresLayout) meta0 +
      ("stagingTz" -> spark.sessionState.conf.sessionLocalTimeZone)
    else meta0
    val next = expected + 1
    val f = fs(spark, table)
    f.mkdirs(manifestDir(table))
    // inside withBranch the commit targets the next staged-branch
    // manifest; branch heads are always FULL manifests (a delta's base
    // pointer resolves against MAIN's v<N> chain, which a branch head
    // must stay independent of)
    val branchOf = scopedBranch(table)
    // stamp on-disk sizes for this commit's NEW files (one listStatus
    // per fresh batch dir — O(churn)); scan planning then never lists
    val extraOf1 = withFileBytes(spark, table,
      base match {
        case Some(b) => files.filterNot(b.files.toSet)
        case None => files
      }, extraOf)
    def renderFull(): Array[Byte] =
      if (branchOf.isEmpty && shouldGroup(meta, files.size))
        renderGroupedManifest(spark, table, schema, files, meta,
          partitionOf, statsOf, deleteFiles,
          // one-time upgrade as a legacy table crosses the grouping
          // threshold: every group member gets its size recorded
          withFileBytes(spark, table, files, extraOf1), base)
      else renderManifest(schema, files, meta, partitionOf, statsOf,
        deleteFiles, extraOf1)
    val body: Array[Byte] = base match {
      case Some(b) if branchOf.isEmpty && b.version == expected &&
          expected > 0 && b.depth + 1 <= MaxChainDepth =>
        val baseSet = b.files.toSet
        val targetSet = files.toSet
        val removed = b.files.filterNot(targetSet)
        val added = files.filterNot(baseSet)
        if (removed.size + added.size < b.files.size)
          renderDelta(schema, expected, b.depth + 1, meta, deleteFiles,
            removed, added, partitionOf, statsOf, extraOf1)
        else renderFull()
      case _ => renderFull()
    }
    val tmp = new Path(manifestDir(table),
      s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(body)
    finally out.close()
    val target = branchOf match {
      case Some(n) => branchManifestPath(table, n, next.toInt)
      case None => manifestPath(table, next)
    }
    // the catalog seam: publish is delegated to the pluggable
    // CommitCatalog (default: the cross-process lockfile CAS below); a
    // real multi-driver deployment can point it at a catalog endpoint.
    // A PER-TABLE in-process lock stays as a cheap fast-path
    // serializer for same-process writers (it spares them the FS lock
    // contention). Per-table, not JVM-wide: catalog.publish can poll a
    // contended or stale filesystem lock for up to its full wait
    // budget, and one table's contention must not head-of-line-block
    // commits to every other table in the process.
    val won = commitLockFor(table).synchronized {
      catalog.publish(f, tmp, target)
    }
    if (!won) {
      f.delete(tmp, false)
      throw new CommitConflictException(
        s"concurrent commit detected at $table v$next (current is " +
          s"${currentVersion(spark, table)}); staged files left orphaned")
    }
    next
  }

  /** The commit point abstraction: atomically publish `tmp` as `target`
    * iff `target` does not exist yet, returning whether this writer
    * won. Implementations must be safe across PROCESSES, not just
    * threads — the one property SQLite gave the 656-LoC reference for
    * free (database.py:32 commit) and a bare exists+rename cannot
    * provide (POSIX rename overwrites).
    */
  trait CommitCatalog {
    def publish(fs: FileSystem, tmp: Path, target: Path): Boolean
  }

  /** The default catalog: an exclusive-create LOCKFILE serializes the
    * check-then-rename pair across processes. On a local filesystem the
    * lock uses `Files.createFile` (true O_CREAT|O_EXCL atomicity —
    * Hadoop's RawLocalFileSystem `create(overwrite=false)` is itself
    * check-then-act); on HDFS `create(overwrite=false)` is
    * server-side-atomic already. A holder that died mid-commit leaves a
    * stale lock, broken after `staleMs`; a writer that cannot acquire
    * within `waitMs` throws the retryable [[CommitConflictException]].
    * Exercised cross-JVM by SnapshotSuite's forked-process race test.
    */
  final class LockFileCatalog(staleMs: Long = 60000L,
      waitMs: Long = 30000L) extends CommitCatalog {

    /** Exclusive-create the lock WITH an owner token inside: release
      * and the pre-rename ownership check compare the token, so a
      * writer can never release (or commit under) a lock it no longer
      * owns after a stale-break + re-acquire crossed its stall.
      */
    private def atomicCreate(fs: FileSystem, p: Path,
        token: String): Boolean =
      if ("file".equalsIgnoreCase(
          Option(fs.getUri.getScheme).getOrElse("file"))) {
        // write the token to a private temp, then HARD-LINK it into
        // place: link(2) is exclusive AND the lock is born with its
        // owner token, so no crash window can leave an empty ownerless
        // lock that blocks writers for the full staleMs
        val lock = java.nio.file.Paths.get(p.toUri.getPath)
        val tmp = lock.resolveSibling(
          lock.getFileName.toString + ".tmp-" +
            java.util.UUID.randomUUID().toString)
        // FS without hard links: CREATE_NEW is one open(O_EXCL) +
        // write in a single call — the narrowest fallback
        def createNewFallback(): Boolean =
          try {
            java.nio.file.Files.write(lock, token.getBytes("UTF-8"),
              java.nio.file.StandardOpenOption.CREATE_NEW)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        try {
          java.nio.file.Files.write(tmp, token.getBytes("UTF-8"))
          try {
            java.nio.file.Files.createLink(lock, tmp)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            case _: UnsupportedOperationException => createNewFallback()
            // link(2) unsupported surfaces as EPERM (FileSystemException,
            // not UnsupportedOperationException) on FAT/exFAT and some
            // NFS/bind mounts — same fallback, not an abort. The
            // FileAlreadyExistsException subclass is matched above.
            case _: java.nio.file.FileSystemException => createNewFallback()
          }
        } finally {
          try java.nio.file.Files.deleteIfExists(tmp)
          catch { case _: java.io.IOException => () }
        }
      } else {
        try {
          val out = fs.create(p, false)
          try out.write(token.getBytes("UTF-8")) finally out.close()
          true
        }
        catch { case _: java.io.IOException => false }
      }

    private def ownsLock(fs: FileSystem, p: Path,
        token: String): Boolean =
      try {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        new String(bytes, "UTF-8") == token
      } catch { case _: java.io.IOException => false }

    override def publish(fs: FileSystem, tmp: Path,
        target: Path): Boolean = {
      val lock = new Path(target.getParent, "commit.lock")
      val token = java.util.UUID.randomUUID().toString
      val deadline = System.currentTimeMillis() + waitMs
      var held = false
      while (!held) {
        held = atomicCreate(fs, lock, token)
        if (!held) {
          // stale-lock break: the holder died between acquire and
          // release (its commit either renamed or it didn't — both are
          // consistent states; only the lock itself is debris)
          val stale =
            try fs.getFileStatus(lock).getModificationTime <
              System.currentTimeMillis() - staleMs
            catch { case _: java.io.FileNotFoundException => false }
          if (stale) {
            // CLAIM the stale lock by atomic rename to a unique debris
            // name — exactly ONE waiter wins the break (a loser's
            // rename fails, source gone) and the winner removes the
            // debris. Deleting in place would let two waiters both
            // "break": the second delete could remove the winner's
            // FRESH lock and put two writers inside the critical
            // section. If the claimed lock turns out NOT stale after
            // all (the stat-to-rename window crossed a release +
            // re-acquire), put it back.
            val debris = new Path(lock.getParent,
              s".lock-broken-${java.util.UUID.randomUUID()}")
            try {
              if (fs.rename(lock, debris)) {
                val freshAfterAll =
                  try fs.getFileStatus(debris).getModificationTime >=
                    System.currentTimeMillis() - staleMs
                  catch { case _: java.io.FileNotFoundException => false }
                if (freshAfterAll) { fs.rename(debris, lock); () }
                else { fs.delete(debris, false); () }
              }
            } catch { case _: java.io.IOException => () }
          }
          else if (System.currentTimeMillis() > deadline)
            throw new CommitConflictException(
              s"commit lock wait timed out at $lock")
          else Thread.sleep(20L)
        }
      }
      try {
        // ownership re-check right before the commit point: if this
        // writer stalled past staleMs inside the critical section, a
        // waiter broke the lock and another commit may have published
        // — renaming now could overwrite it. Losing ownership means
        // losing the race, never data.
        if (!ownsLock(fs, lock, token))
          throw new CommitConflictException(
            s"commit lock at $lock was broken while held (stall " +
              "exceeded the stale threshold); commit aborted")
        if (fs.exists(target)) false
        else fs.rename(tmp, target)
      } finally {
        // release only OUR lock: after a break, the path may hold a
        // successor's fresh lock — deleting it would let yet another
        // writer into the successor's critical section
        if (ownsLock(fs, lock, token)) { fs.delete(lock, false); () }
      }
    }
  }

  /** The pluggable commit catalog — swap for a real catalog/CAS
    * endpoint in a multi-driver deployment.
    */
  @volatile var catalog: CommitCatalog = new LockFileCatalog()

  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def commitLockFor(table: String): Object =
    commitLocks.computeIfAbsent(table, _ => new Object)

  /** Create the table from `df` as version 1 (`numFiles` data files so
    * mutation tests/benchmarks exercise file granularity).
    */
  def create(spark: SparkSession, table: String, df: DataFrame,
      numFiles: Int = 8): Long = {
    require(currentVersion(spark, table) == 0,
      s"$table already has committed snapshots")
    val files = stageBatch(df.repartition(numFiles), table)
    commitManifest(spark, table, df.schema, files, 0L)
  }

  /** Create a PARTITIONED table: files are laid out and
    * manifest-labeled by `pcol`'s string value, enabling [[readWhere]]'s
    * manifest-level pruning — scan planning touches no data file of an
    * excluded partition (the Iceberg metadata-pruning shape). The
    * partition column stays a normal data column too, so every existing
    * reader/mutator works unchanged.
    */
  def createPartitioned(spark: SparkSession, table: String, df: DataFrame,
      pcol: String): Long = {
    require(currentVersion(spark, table) == 0,
      s"$table already has committed snapshots")
    val staged = stagePartitionedBatch(df, table, pcol)
    commitManifest(spark, table, df.schema, staged.map(_._1), 0L,
      Map("partitionCol" -> pcol), staged.toMap)
  }

  /** MULTI-COLUMN partitioning: files live in nested Hive-style dirs
    * (`__part0=<a>/__part1=<b>/...`) and each carries the COMPOSITE
    * label (per-column values, percent-encoded and comma-joined) in
    * the manifest, so scan planning prunes on a predicate over ANY
    * subset of the partition columns — first, last, or both — without
    * opening an excluded file (the Iceberg partition-tuple shape, a
    * strict superset of Hive's prefix-only pruning because the
    * manifest holds full tuples, not a directory trie).
    */
  def createPartitioned(spark: SparkSession, table: String, df: DataFrame,
      pcols: Seq[String]): Long = {
    require(pcols.nonEmpty, "PARTITIONED BY needs at least one column")
    val transforms = PartitionTransforms.parse(pcols, df.schema)
    if (transforms.exists(!_.isIdentity))
      return createTransformPartitioned(spark, table, df, transforms)
    val idCols = transforms.map(_.source)
    if (idCols.length == 1)
      return createPartitioned(spark, table, df, idCols.head)
    require(currentVersion(spark, table) == 0,
      s"$table already has committed snapshots")
    val staged = stagePartitionedBatchMulti(df, table, idCols)
    commitManifest(spark, table, df.schema, staged.map(_._1), 0L,
      Map("partitionCols" -> idCols.map(enc).mkString(",")),
      staged.toMap)
  }

  /** HIDDEN partitioning (Iceberg partition transforms): the spec list
    * may mix `days(ts)`/`hours(ts)`/`months(ts)`/`years(ts)`,
    * `bucket(n, c)`, `truncate(w, c)` and bare identity columns — see
    * [[PartitionTransforms]]. The manifest stores the canonical spec
    * under `partitionSpec` plus the SOURCE columns under
    * `partitionCols` (so every consumer that reasons about "the
    * partition columns" — rename/drop guards, DESCRIBE, readWhere —
    * sees the raw columns a user filters on), and each file carries
    * the TRANSFORMED label tuple. Writers derive labels from row
    * values; queries filter the raw column and the scan prunes the
    * predicate through the transform.
    */
  private def createTransformPartitioned(spark: SparkSession,
      table: String, df: DataFrame,
      transforms: Seq[PartitionTransform]): Long = {
    require(currentVersion(spark, table) == 0,
      s"$table already has committed snapshots")
    val staged = stageLabeledBatchMulti(df, table,
      transforms.map(t => t.labelCol(col(s"`${t.source}`"))))
    commitManifest(spark, table, df.schema, staged.map(_._1), 0L,
      Map(
        "partitionSpec" -> transforms.map(t => enc(t.spec)).mkString(","),
        "partitionCols" ->
          transforms.map(t => enc(t.source)).mkString(",")),
      staged.toMap)
  }

  /** The table's partition TRANSFORMS, aligned with [[partitionColsOf]]
    * — empty when the table is unpartitioned or plainly (identity-)
    * partitioned in the pre-transform meta format.
    */
  private[graft] def partitionSpecOf(snap: Snapshot)
      : Seq[PartitionTransform] =
    snap.meta.get("partitionSpec").toSeq.flatMap(v =>
      v.split(',').filter(_.nonEmpty).toSeq.map(s =>
        PartitionTransforms.parseOne(dec(s), snap.schema)))

  /** The partition layout as transforms regardless of meta vintage:
    * the declared spec when present, otherwise the identity columns.
    */
  private[graft] def partitionTransformsOf(snap: Snapshot)
      : Seq[PartitionTransform] = {
    val specs = partitionSpecOf(snap)
    if (specs.nonEmpty) specs
    else partitionColsOf(snap).map(PartitionTransforms.PIdentity)
  }

  /** Create a BUCKETED table: every batch — the create, appends,
    * mutation rewrites, compaction — hash-repartitions into exactly
    * `numBuckets` bucket-tagged files ([[stageBucketedBatch]]), and
    * the Catalyst relations declare the matching `BucketSpec`, so a
    * join between two graft tables bucketed the same way on the join
    * key plans WITHOUT a shuffle on either side (Spark's v1 bucketed
    * scan — the co-located-join layout that at 100 TB turns the
    * biggest fact-fact joins from two full exchanges into zero).
    * Bucketing composes with stats/bloom declarations and identity,
    * but not with Hive partitioning (one physical layout per table).
    */
  def createBucketed(spark: SparkSession, table: String, df: DataFrame,
      bucketCol: String, numBuckets: Int,
      sortCols: Seq[String] = Nil): Long =
    createBucketed(spark, table, df, Seq(bucketCol), numBuckets,
      sortCols, Nil)

  /** Multi-column buckets (Spark's own `bucketBy(n, a, b)` shape) and
    * — via `partitionBy` — the PARTITION × BUCKET composition:
    * `partitionBy` takes identity columns or transform specs
    * ([[PartitionTransforms]]), so `createBucketed(t, df, Seq("k"), 32,
    * partitionBy = Seq("days(ts)"))` is the canonical date-partitioned,
    * key-bucketed large fact. Partition pruning and the exchange-free
    * bucket join compose: rows of one key hash to the same bucket id
    * inside every partition dir.
    */
  def createBucketed(spark: SparkSession, table: String, df: DataFrame,
      bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String], partitionBy: Seq[String]): Long = {
    require(currentVersion(spark, table) == 0,
      s"$table already has committed snapshots")
    require(bucketCols.nonEmpty, "bucketed layout needs bucket columns")
    (bucketCols ++ sortCols).foreach(c =>
      require(df.columns.contains(c),
        s"bucket/sort column $c is not in the frame " +
          s"(${df.columns.mkString(", ")})"))
    require(numBuckets > 0 && numBuckets <= 100000,
      s"numBuckets must be in [1, 100000], got $numBuckets")
    val transforms = PartitionTransforms.parse(partitionBy, df.schema)
    transforms.foreach(t => require(!bucketCols.contains(t.source) ||
      !t.isIdentity,
      s"${t.source} cannot be both a bucket column and an identity " +
        "partition column"))
    val bucketMeta =
      Map("bucketCols" -> bucketCols.map(enc).mkString(","),
        "bucketN" -> numBuckets.toString) ++
        (if (sortCols.isEmpty) Map.empty[String, String]
         else Map("bucketSort" -> sortCols.map(enc).mkString(",")))
    if (transforms.isEmpty) {
      val files = stageBucketedBatch(df, table, bucketCols, numBuckets,
        sortCols.map(c => col(s"`$c`")))
      commitManifest(spark, table, df.schema, files, 0L, bucketMeta)
    } else {
      val staged = stagePartitionedBucketedBatch(df, table,
        transforms.map(t => t.labelCol(col(s"`${t.source}`"))),
        bucketCols, numBuckets, sortCols.map(c => col(s"`$c`")))
      val pmeta =
        if (transforms.exists(!_.isIdentity))
          Map("partitionSpec" ->
            transforms.map(t => enc(t.spec)).mkString(","),
            "partitionCols" ->
              transforms.map(t => enc(t.source)).mkString(","))
        else Map("partitionCols" ->
          transforms.map(t => enc(t.source)).mkString(","))
      commitManifest(spark, table, df.schema, staged.map(_._1), 0L,
        bucketMeta ++ pmeta, staged.toMap)
    }
  }

  /** The declared bucket layout, when the table has one (multi-column
    * tables store the encoded list under `bucketCols`, pre-existing
    * single-column ones the bare name under `bucketCol` — both read).
    */
  private[graft] def bucketSpecOf(snap: Snapshot)
      : Option[(Seq[String], Int)] =
    for {
      c <- snap.meta.get("bucketCols")
        .map(_.split(',').filter(_.nonEmpty).map(dec).toSeq)
        .orElse(snap.meta.get("bucketCol").map(Seq(_)))
      n <- snap.meta.get("bucketN")
    } yield (c, n.toInt)

  /** Declared within-bucket sort columns (`bucketBy + sortBy`'s role):
    * staged batches sort inside each bucket, and the relations declare
    * them in the BucketSpec — Spark trusts the ordering exactly when a
    * bucket is ONE file (its own single-file check), so after a
    * compact() the sort-merge join plans with NO SortExec on the graft
    * sides either: zero exchanges AND zero sorts.
    */
  private[graft] def bucketSortOf(snap: Snapshot): Seq[String] =
    snap.meta.get("bucketSort").toSeq
      .flatMap(_.split(',').filter(_.nonEmpty).map(dec))

  /** The table's partition columns: multi-column tables store the
    * encoded list under `partitionCols`, single-column ones the bare
    * name under `partitionCol` (the pre-existing format — both read).
    */
  private[graft] def partitionColsOf(snap: Snapshot): Seq[String] =
    snap.meta.get("partitionCols")
      .map(_.split(',').filter(_.nonEmpty).map(dec).toSeq)
      .getOrElse(snap.meta.get("partitionCol").toSeq)

  /** A file's partition values, aligned with [[partitionColsOf]]. */
  private[sources] def partValuesOf(snap: Snapshot,
      file: String): Option[Seq[String]] =
    snap.partitionOf.get(file).map { l =>
      if (snap.meta.contains("partitionCols"))
        l.split(",", -1).map(dec).toSeq
      else Seq(l)
    }

  /** Read only the partitions in `values`: the file list is pruned on
    * manifest metadata ALONE — no data-file footer of an excluded
    * partition is ever opened (suite-asserted via inputFiles).
    */
  def readWhere(spark: SparkSession, table: String, values: Set[String],
      version: Option[Long] = None): DataFrame = {
    val snap = version match {
      case Some(v) => readManifest(spark, table, v)
      case None => loadCurrent(spark, table)
    }
    val pcols = partitionColsOf(snap)
    require(pcols.nonEmpty,
      s"$table is not partitioned - use read + a filter")
    // the bare-values signature names no column, so it is only
    // well-defined on a SINGLE-column layout — on a multi-column
    // table it would silently consult one arbitrary column (and a
    // caller passing second-column values would get an empty, WRONG
    // result); require the explicit column->values form there
    require(pcols.size == 1,
      s"$table is partitioned by (${pcols.mkString(", ")}) — use " +
        "readWhere(table, Map(column -> values)) to name the " +
        "column(s), or read + a filter (the scan prunes on the full " +
        "composite tuple)")
    val files = snap.files.filter(f =>
      partValuesOf(snap, f).flatMap(_.headOption).exists(values))
    readFilesDv(spark, table, snap, files)
  }

  /** Read only the files whose partition tuple matches `colValues` on
    * EVERY named column — any subset of the partition columns, in any
    * order. Pruning is manifest-metadata-only, like the single-column
    * form: no excluded file is opened.
    */
  def readWhere(spark: SparkSession, table: String,
      colValues: Map[String, Set[String]],
      version: Option[Long]): DataFrame = {
    val snap = version match {
      case Some(v) => readManifest(spark, table, v)
      case None => loadCurrent(spark, table)
    }
    val pcols = partitionColsOf(snap)
    require(pcols.nonEmpty,
      s"$table is not partitioned - use read + a filter")
    val unknown = colValues.keys.filterNot(pcols.contains)
    require(unknown.isEmpty,
      s"not partition column(s) of $table: ${unknown.mkString(", ")} " +
        s"(partitioned by ${pcols.mkString(", ")})")
    val wanted = pcols.map(colValues.get) // aligned with the tuple
    val files = snap.files.filter(f =>
      partValuesOf(snap, f).exists(tuple =>
        tuple.lazyZip(wanted).forall((v, w) => w.forall(_ (v)))))
    readFilesDv(spark, table, snap, files)
  }

  def readWhere(spark: SparkSession, table: String,
      colValues: Map[String, Set[String]]): DataFrame =
    readWhere(spark, table, colValues, None)

  /** Create a CLUSTERED table: rows are range-partitioned and sorted on
    * `clusterCol` so each file covers a tight, near-disjoint value
    * range, and per-file min/max for `statsCols` (default: the cluster
    * column) are recorded in the manifest — the data-skipping layout
    * (Iceberg/Delta OPTIMIZE ZORDER's one-dimension case; compose with
    * ScalePatterns.withZValue for a multi-column z-order cluster key).
    */
  def createClustered(spark: SparkSession, table: String, df: DataFrame,
      clusterCol: String, numFiles: Int = 8,
      statsCols: Seq[String] = Nil): Long = {
    require(currentVersion(spark, table) == 0,
      s"$table already has committed snapshots")
    val sc = if (statsCols.isEmpty) Seq(clusterCol) else statsCols
    val arranged = df
      .repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(col(clusterCol))
    val files = stageBatch(arranged, table)
    val (stats, extras) = computeStats(spark, table, files, sc, df.schema)
    // the clustering key is DECLARED table metadata: staging keeps
    // later batches batch-locally sorted on it and compact()/maintain()
    // re-cluster the whole table on it (see declaredClusterCols)
    commitManifest(spark, table, df.schema, files, 0L,
      Map("statsCols" -> sc.mkString(","),
        "clusterCols" -> clusterCol), Map.empty, stats, Nil,
      None, extras)
  }

  /** Read only the files whose recorded [min,max] for `column` can
    * intersect [lo, hi] — FILE SKIPPING on manifest stats alone, no
    * excluded file's footer is opened (suite-asserted via inputFiles).
    * Files without stats for the column are kept (unprunable — a
    * safety property, never a correctness one: callers still apply
    * their row-level filter; skipping only shrinks the scan). Numeric
    * columns compare as decimals, everything else as strings (exact
    * for fixed-width renderings like ISO timestamps).
    */
  def readWhereRange(spark: SparkSession, table: String, column: String,
      lo: Any, hi: Any, version: Option[Long] = None): DataFrame = {
    val snap = version match {
      case Some(v) => readManifest(spark, table, v)
      case None => loadCurrent(spark, table)
    }
    val isTimestamp = snap.schema(column).dataType ==
      org.apache.spark.sql.types.TimestampType
    val numeric = isTimestamp || snap.schema(column).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    // an unparseable numeric stat (a NaN/Infinity max is committable —
    // Spark's max treats NaN as largest) must degrade to keep-the-file,
    // never to an exception that makes the column unqueryable
    def le(x: String, y: String) =
      if (numeric)
        try BigDecimal(x) <= BigDecimal(y)
        catch { case _: NumberFormatException => true }
      else codePointLe(x, y) // stats were recorded in UTF8String order
    // timestamp stats are recorded as epoch MICROS — accept bounds as
    // Timestamp/Instant/numeric micros and compare in that space
    def render(x: Any): String = x match {
      case t: java.sql.Timestamp if isTimestamp =>
        (t.getTime * 1000L + (t.getNanos % 1000000) / 1000L).toString
      case i: java.time.Instant if isTimestamp =>
        (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
      case other => other.toString
    }
    val (loS, hiS) = (render(lo), render(hi))
    val files = snap.files.filter { f =>
      snap.statsOf.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx)) => le(loS, mx) && le(mn, hiS)
        case None => true // no stats recorded: cannot skip safely
      }
    }
    readFilesDv(spark, table, snap, files)
  }

  /** ADDITIVE schema evolution without rewriting a byte: commit a
    * manifest whose schema appends `newFields`; every existing file
    * reads the new columns as NULL (parquet by-name resolution), later
    * writes carry them. Drops/renames are deliberately not offered —
    * they need a rewrite (or Iceberg-style field ids) to be safe.
    *
    * `defaults` (column -> SQL LITERAL text) declares Iceberg-v3-style
    * `initial-default` + `write-default` semantics for a subset of the
    * added columns: rows in files that PREDATE the evolution read the
    * default (they were committed when the column didn't exist), SQL
    * INSERTs that omit the column fill it with the default, and an
    * explicit NULL written after the evolution stays NULL (the read
    * rewrite is file-scoped, never a blanket coalesce). Mechanics: the
    * default rides the manifest meta, every file alive at the
    * evolution commit is marker-tagged, and reads rewrite only rows
    * from marked batches ([[withInitialDefaults]]) — no byte is
    * rewritten here either; compaction materializes the default and
    * sheds the marker. Time travel to a pre-evolution version reads
    * the old schema (no column at all), exactly as committed.
    */
  def addColumns(spark: SparkSession, table: String,
      newFields: Seq[org.apache.spark.sql.types.StructField],
      defaults: Map[String, String] = Map.empty): Long = {
    val snap = loadCurrent(spark, table)
    require(newFields.forall(f => !snap.schema.fieldNames
      .exists(_.equalsIgnoreCase(f.name))),
      "added columns must not collide with existing ones (resolution " +
        "is case-insensitive)")
    require(newFields.forall(_.nullable),
      "added columns must be nullable (existing files have no values)")
    val retired = retiredNames(snap)
    val reused = newFields.map(_.name)
      .filter(n => retired.exists(_.equalsIgnoreCase(n)))
    require(reused.isEmpty,
      s"column name(s) ${reused.mkString(", ")} were renamed away or " +
        "dropped — old files still hold values under them, and by-name " +
        "parquet resolution would resurrect that data; pick fresh names")
    defaults.keys.foreach(c => require(
      newFields.exists(_.name == c),
      s"DEFAULT declared for $c, which is not among the added columns"))
    defaults.foreach { case (c, d) =>
      requireConstantDefault(spark, c, d,
        newFields.find(_.name == c).get.dataType)
    }
    val metaUp = defaults.map { case (c, d) =>
      s"colDefault.${enc(c)}" -> enc(d)
    }
    // tag every file alive NOW: these are exactly the files whose rows
    // must read the default (the column is physically absent in them);
    // files staged later always carry the column (writers fill it)
    val markers = defaults.keys.map(c => s"predates.${enc(c)}" -> "1")
    val extras =
      if (defaults.isEmpty) snap.extraOf
      else snap.files.map { f =>
        f -> (snap.extraOf.getOrElse(f, Map.empty) ++ markers)
      }.toMap
    // a default-declaring evolution re-tags EVERY live file, so the
    // manifest must be written FULL: a delta records per-file attrs
    // only for added files, and the markers would silently drop. Rare
    // DDL — the O(files) manifest write is the honest cost here.
    commitManifest(spark, table,
      StructType(snap.schema.fields ++ newFields), snap.files,
      snap.version, snap.meta ++ metaUp, snap.partitionOf, snap.statsOf,
      snap.deleteFiles, if (defaults.isEmpty) Some(snap) else None,
      extras)
  }

  /** Declared column defaults: logical name -> SQL literal text. */
  private[graft] def defaultsOf(snap: Snapshot): Map[String, String] =
    snap.meta.collect { case (k, v) if k.startsWith("colDefault.") =>
      dec(k.stripPrefix("colDefault.")) -> dec(v)
    }

  /** A default must be a CONSTANT: it is evaluated per-read forever,
    * so a non-foldable expression (rand(), current_timestamp()) would
    * make two reads of one committed row disagree. Constant-folding
    * must collapse the WHOLE expression to a Literal — rand()'s SEED
    * is a literal leaf, so a mere leaf check would pass it. The fold
    * check runs on the OPTIMIZED plan, where ComputeCurrentTime has
    * already frozen now()/current_date()/… to literals — so time- and
    * session-context-dependent expressions must be rejected FIRST, on
    * the ANALYZED tree where they are still themselves: the stored
    * text is re-evaluated per read, so a default that folds to "now"
    * would drift across reads and compact() would freeze whatever
    * maintenance-time evaluation produced.
    */
  private def requireConstantDefault(spark: SparkSession, c: String,
      d: String, dt: org.apache.spark.sql.types.DataType): Unit = {
    val qe = spark.range(1)
      .select(expr(d).cast(dt).as("d")).queryExecution
    val contextDep = Set("CurrentTimestamp", "CurrentDate", "Now",
      "LocalTimestamp", "CurrentTimeZone", "CurrentUser",
      "CurrentDatabase", "CurrentCatalog", "SparkVersion", "Uuid")
    val hit = qe.analyzed.expressions.flatMap(_.collect {
      case e if contextDep.contains(e.getClass.getSimpleName) =>
        e.getClass.getSimpleName
    }).headOption
    require(hit.isEmpty, s"DEFAULT for $c must be a constant: '$d' " +
      s"contains ${hit.getOrElse("")}, whose value depends on when/" +
      "where the read runs — it would evaluate differently on every " +
      "read of the same committed row")
    val folded = qe.optimizedPlan.expressions
    require(folded.forall {
      case a: org.apache.spark.sql.catalyst.expressions.Alias =>
        a.child.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.Literal]
      case e => e.foldable
    }, s"DEFAULT for $c must be a constant literal castable to " +
      s"$dt, got '$d'")
  }

  /** Write-default on an EXISTING column (Delta `ALTER COLUMN … SET
    * DEFAULT` semantics): future INSERTs that omit the column fill
    * the literal; existing rows are NOT rewritten or re-read — a
    * retroactive initial-default would silently change what committed
    * history means. Refused while the column still carries LIVE
    * initial-default markers (it was ADDED with a default and
    * pre-evolution files still read it): changing that literal would
    * flip those rows' values — Iceberg freezes initial-defaults at add
    * time for exactly this reason; `compact()` materializes them,
    * after which the write-default is freely settable. Metadata-only,
    * one commit.
    */
  def setColumnDefault(spark: SparkSession, table: String,
      column: String, defaultSql: String): Long = {
    val snap = loadCurrent(spark, table)
    val f = snap.schema.fields.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(s"no such column $column"))
    // a write-default on the identity column would fill omitted
    // INSERTs with a non-null id the generated-always guard rejects
    require(!snap.meta.get("identityCol")
      .exists(_.equalsIgnoreCase(column)),
      s"$column is GENERATED ALWAYS AS IDENTITY — it cannot also " +
        "declare a DEFAULT")
    requireConstantDefault(spark, column, defaultSql, f.dataType)
    require(!hasLiveDefaultFor(snap, column),
      s"$column still carries a LIVE initial default on pre-evolution " +
        "files — compact() to materialize it, then SET DEFAULT")
    require(!defaultSql.exists(c => c == '\n' || c == '\r'),
      "default must be single-line")
    commitManifest(spark, table, snap.schema, snap.files, snap.version,
      snap.meta + (s"colDefault.${enc(column)}" -> enc(defaultSql)),
      snap.partitionOf, snap.statsOf, snap.deleteFiles, Some(snap),
      snap.extraOf)
  }

  /** Drop a column's write-default — future INSERTs that omit it fill
    * NULL again. Refused while initial-default markers live (dropping
    * the literal would flip pre-evolution rows back to NULL — those
    * rows' values are committed history, not a setting).
    */
  def dropColumnDefault(spark: SparkSession, table: String,
      column: String): Long = {
    val snap = loadCurrent(spark, table)
    require(snap.schema.fieldNames.contains(column),
      s"no such column $column")
    require(!hasLiveDefaultFor(snap, column),
      s"$column still carries a LIVE initial default on pre-evolution " +
        "files — compact() to materialize it, then DROP DEFAULT")
    commitManifest(spark, table, snap.schema, snap.files, snap.version,
      snap.meta - s"colDefault.${enc(column)}",
      snap.partitionOf, snap.statsOf, snap.deleteFiles, Some(snap),
      snap.extraOf)
  }

  private def hasLiveDefaultFor(snap: Snapshot, column: String): Boolean =
    snap.extraOf.values.exists(_.contains(s"predates.${enc(column)}"))

  /** Declared NOT NULL as CHECK-constraint sugar (`ALTER COLUMN c SET
    * NOT NULL`): validates existing data in one DV-aware scan like any
    * ADD CONSTRAINT (NULL counts as a violation — the Delta rule
    * already matches NOT NULL semantics exactly), then every staged
    * batch enforces it via the observed-metric pass. `DROP NOT NULL`
    * drops the constraint. The schema field stays declared-nullable —
    * enforcement is the constraint's job, and flipping parquet
    * nullability on files written nullable would be a lie the
    * vectorized reader could trip over.
    */
  def setNotNull(spark: SparkSession, table: String,
      column: String): Long = {
    val snap = loadCurrent(spark, table)
    require(snap.schema.fieldNames.contains(column),
      s"no such column $column")
    require(column.matches("[A-Za-z0-9_]+"),
      s"SET NOT NULL needs a [A-Za-z0-9_]+ column name, got '$column'")
    // reserved graft__ namespace: a USER constraint can never be
    // named graft__nn_<col> (addConstraint rejects the prefix), so
    // SET NOT NULL cannot collide with — and DROP NOT NULL cannot
    // silently drop — an unrelated user constraint
    addConstraintInternal(spark, table, s"graft__nn_$column",
      s"$column IS NOT NULL")
  }

  def dropNotNull(spark: SparkSession, table: String,
      column: String): Long =
    dropConstraint(spark, table, s"graft__nn_$column")

  /** True while any file still PREDATES a defaulted column — such
    * files need the read-side default rewrite, which the raw FileIndex
    * scan cannot express. Compaction rewrites them (materializing the
    * default) and this flips back false, like the DV / column-mapping
    * honesty rules.
    */
  private[graft] def hasLiveDefaults(snap: Snapshot): Boolean = {
    val defs = defaultsOf(snap)
    defs.nonEmpty && {
      val markers = defs.keys.map(c => s"predates.${enc(c)}").toSet
      snap.extraOf.values.exists(x => markers.exists(x.contains))
    }
  }

  /** True when the raw manifest-FileIndex scan is EXACT for this
    * snapshot: no deletion vectors, no column mapping, no live
    * initial-default markers — each needs a frame-level rewrite the
    * bare parquet scan lacks.
    */
  private[graft] def fileIndexExact(snap: Snapshot): Boolean =
    snap.deleteFiles.isEmpty && colMapOf(snap).isEmpty &&
      !hasLiveDefaults(snap)

  /** Total on-disk bytes of a snapshot's data files — one listStatus
    * per batch DIR, never one getFileStatus RPC per file (at
    * production file counts the per-file round trip is the metadata
    * bottleneck). Feeds compact()'s output sizing and the relations'
    * `sizeInBytes` statistic, so Catalyst's broadcast-threshold check
    * sees the real table size instead of defaultSizeInBytes — a small
    * graft dimension then broadcasts without a hint.
    */
  private[graft] def dataBytesOf(spark: SparkSession, table: String,
      snap: Snapshot): Long =
    bytesOfFiles(spark, table, snap.files)

  // public: the change-feed source (org.apache.spark.sql bridge
  // package) sizes pending versions' added files with it
  def bytesOfFiles(spark: SparkSession, table: String,
      files: Seq[String]): Long = {
    val f = fs(spark, table)
    files
      .groupBy(r => r.substring(0, r.lastIndexOf('/')))
      .iterator.map { case (dir, rels) =>
        val names = rels.map(r => r.substring(r.lastIndexOf('/') + 1)).toSet
        f.listStatus(new Path(table, dir)).iterator
          .filter(st => st.isFile && names(st.getPath.getName))
          .map(_.getLen).sum
      }.sum
  }

  /** Rewrite rows from PRE-EVOLUTION files to their column defaults.
    * A batch directory commits atomically, so marker-tagged files
    * group into whole batches; membership is one codegen'd
    * regexp-extract + isin over that (commit-bounded, compaction-
    * shrinking) batch set — per-file exactness without splitting the
    * scan or joining a file list. `pathCol` must render the file's
    * path/key with its `data/<batch>/` segment (the uuid batch name
    * never percent-encodes, so URI and raw spaces agree on it).
    */
  private def withInitialDefaults(df: DataFrame, snap: Snapshot,
      files: Seq[String], pathCol: Column): DataFrame = {
    val defs = defaultsOf(snap)
    if (defs.isEmpty) return df
    val fset = files.toSet
    val rewrites = defs.flatMap { case (c, d) =>
      val marker = s"predates.${enc(c)}"
      val preBatches = snap.extraOf.iterator.collect {
        case (f, x) if fset(f) && x.contains(marker) =>
          f.split('/')(1) // "data/<batch>/..." -> batch dir
      }.toSet
      if (preBatches.isEmpty) None else Some((c, d, preBatches))
    }
    if (rewrites.isEmpty) return df
    val batchOf = regexp_extract(pathCol,
      "^.*data/(b-[^/]+)/.*$", 1)
    rewrites.foldLeft(df) { case (acc, (c, d, pre)) =>
      acc.withColumn(c, when(batchOf.isin(pre.toSeq: _*),
        expr(d).cast(snap.schema(c).dataType))
        .otherwise(col(s"`$c`")))
    }
  }

  /** A constraint that mentions `name` blocks renaming/dropping it —
    * the stored predicate is a SQL string over logical names and would
    * silently bind to nothing (or the wrong column) afterwards.
    */
  private def requireUnconstrained(snap: Snapshot, name: String,
      what: String): Unit = {
    val hit = constraintsOf(snap).collect {
      case (n, e) if ("(?i)\\b" + java.util.regex.Pattern.quote(name) +
        "\\b").r.findFirstIn(e).isDefined => n
    }
    require(hit.isEmpty,
      s"cannot $what column $name: referenced by CHECK constraint(s) " +
        s"${hit.mkString(", ")} — drop them first")
  }

  /** METADATA-ONLY column rename: no file is rewritten. The committed
    * manifest renames the schema field, re-keys the column's per-file
    * stats/null-counts, updates the partition/stats/bloom declarations,
    * and records the old name as a FORMER name so reads coalesce it
    * out of pre-rename files ([[mappedScan]]). Old snapshots
    * time-travel with their original names (each manifest carries its
    * own schema + mapping). The former name is retired forever (see
    * [[addColumns]]' reuse guard).
    */
  def renameColumn(spark: SparkSession, table: String, from: String,
      to: String): Long = {
    val snap = loadCurrent(spark, table)
    require(snap.schema.fieldNames.contains(from),
      s"no such column $from")
    // guards are CASE-INSENSITIVE like Spark's read resolution: a
    // collision differing only in case would make mappedScan request
    // two same-named-ci read columns and brick every read under the
    // default spark.sql.caseSensitive=false
    val caseOnly = to.equalsIgnoreCase(from) && to != from
    require(caseOnly || !snap.schema.fieldNames
      .exists(_.equalsIgnoreCase(to)),
      s"column $to already exists")
    require(caseOnly ||
      !retiredNames(snap).exists(_.equalsIgnoreCase(to)),
      s"column name $to was renamed away or dropped — old files still " +
        "hold values under it; pick a fresh name")
    requireUnconstrained(snap, from, "rename")
    val cm = colMapOf(snap)
    // a case-ONLY rename needs no former-name entry: parquet by-name
    // resolution is case-insensitive under the default config, so old
    // files' `f` column answers a requested `F` directly — and a
    // colmap entry would put both casings in one read schema
    val newCm =
      if (caseOnly) // carry any existing lineage forward, no new entry
        (cm - from) ++ cm.get(from).map(l => to -> l)
      else (cm - from) + (to -> (from +: cm.getOrElse(from, Nil)))
    val newSchema = StructType(snap.schema.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f))
    def rekey(m: Map[String, (String, String)]) =
      m.map { case (k, v) => (if (k == from) to else k) -> v }
    def rekeyExtra(m: Map[String, String]) =
      m.map { case (k, v) =>
        (if (k == s"nulls.$from") s"nulls.$to"
         else if (k == s"predates.${enc(from)}") s"predates.${enc(to)}"
         else k) -> v }
    def rekeyList(v: String) =
      v.split(',').map(c => if (c == from) to else c).mkString(",")
    val newMeta = snap.meta
      .map {
        case ("partitionCol", `from`) => "partitionCol" -> to
        case ("partitionCols", v) => "partitionCols" ->
          v.split(',').map(c => if (dec(c) == from) enc(to) else c)
            .mkString(",")
        case ("partitionSpec", v) => "partitionSpec" ->
          v.split(',').map { s =>
            val t = PartitionTransforms.parseOne(dec(s), snap.schema)
            if (t.source == from) enc(t.withSource(to).spec) else s
          }.mkString(",")
        case ("statsCols", v) => "statsCols" -> rekeyList(v)
        case ("bucketCol", `from`) => "bucketCol" -> to
        case ("bucketCols", v) => "bucketCols" ->
          v.split(',').map(c => if (dec(c) == from) enc(to) else c)
            .mkString(",")
        case ("bucketSort", v) => "bucketSort" ->
          v.split(',').map(c => if (dec(c) == from) enc(to) else c)
            .mkString(",")
        case ("bloomCols", v) => "bloomCols" -> rekeyList(v)
        case ("clusterCols", v) => "clusterCols" -> rekeyList(v)
        case ("identityCol", `from`) => "identityCol" -> to
        case ("identitySort", v) => "identitySort" ->
          v.split(',').map(c => if (dec(c) == from) enc(to) else c)
            .mkString(",")
        case (k, v) if k == s"colDefault.${enc(from)}" =>
          s"colDefault.${enc(to)}" -> v
        case kv => kv
      } + ("colmap" -> encodeColMap(newCm))
    // FULL manifest, not a delta: this commit re-keys the per-file
    // stats/extras of every UNCHANGED file, and a delta encodes
    // per-file attributes only for added files — the re-keyed entries
    // would silently drop and post-rename range pruning on the new
    // name would find no stats. Rare DDL; O(files) write is honest.
    commitManifest(spark, table, newSchema, snap.files, snap.version,
      newMeta, snap.partitionOf,
      snap.statsOf.map { case (f, m) => f -> rekey(m) },
      snap.deleteFiles, None,
      snap.extraOf.map { case (f, m) => f -> rekeyExtra(m) })
  }

  /** METADATA-ONLY column drop: the data stays in existing files and
    * is simply never requested again (explicit-schema parquet reads
    * ignore extra file columns). The name — and its whole former-name
    * lineage — is retired so it can never be re-added over stale data.
    */
  def dropColumn(spark: SparkSession, table: String,
      name: String): Long = dropColumns(spark, table, Seq(name))

  /** Drop several columns in ONE manifest commit. Every per-column
    * guard (existence, partition membership, CHECK-constraint
    * reference) plus the remaining-column count AFTER all drops is
    * pre-flighted against the starting schema before anything commits
    * — a multi-column `ALTER TABLE DROP COLUMN (a, b)` either applies
    * completely or leaves version AND schema untouched, never
    * half-applies (the reference's DDL is likewise
    * statement-atomic through SQLite, database.py:75-110).
    */
  def dropColumns(spark: SparkSession, table: String,
      names: Seq[String]): Long = {
    val snap = loadCurrent(spark, table)
    val distinct = names.distinct
    require(distinct.nonEmpty, "DROP COLUMN needs at least one column")
    // ---- pre-flight EVERY guard for EVERY name before the commit ----
    distinct.foreach { name =>
      require(snap.schema.fieldNames.contains(name),
        s"no such column $name")
      require(!snap.meta.get("partitionCol").contains(name) &&
        !partitionColsOf(snap).contains(name),
        s"cannot drop partition column $name")
      // bucket membership guards like partition membership: dropping a
      // bucket (or within-bucket sort) column would leave the manifest
      // declaring a BucketSpec over a nonexistent column, breaking
      // every subsequent scan — rebucketTable is the evolution verb
      require(!bucketSpecOf(snap).exists(_._1.contains(name)),
        s"cannot drop bucket column $name — rebucket first " +
          "(rebucketTable)")
      require(!bucketSortOf(snap).contains(name),
        s"cannot drop bucket-sort column $name — rebucket first " +
          "(rebucketTable)")
      requireUnconstrained(snap, name, "drop")
    }
    require(snap.schema.length > distinct.size,
      s"cannot drop ${if (distinct.size == 1) "the only column"
        else "every column"} of $table")
    val nameSet = distinct.toSet
    val cm = colMapOf(snap)
    val lineage = distinct.flatMap(n => n +: cm.getOrElse(n, Nil))
    val dropped = (snap.meta.get("droppedCols").toSeq
      .flatMap(_.split(',').filter(_.nonEmpty)) ++ lineage.map(enc))
      .distinct.mkString(",")
    def strip(v: String) =
      v.split(',').filterNot(nameSet).mkString(",")
    // the identity column is undroppable like a partition column: the
    // mark/assignment machinery would dangle (and ids are the one
    // column a user cannot rebuild)
    distinct.foreach { name =>
      require(!snap.meta.get("identityCol").contains(name),
        s"cannot drop identity column $name")
      require(!snap.meta.get("identitySort").toSeq
        .flatMap(_.split(',').filter(_.nonEmpty).map(dec))
        .contains(name),
        s"cannot drop $name: it orders identity assignment " +
          "(identitySort)")
    }
    val base = (snap.meta.map {
      case ("statsCols", v) => "statsCols" -> strip(v)
      case ("bloomCols", v) => "bloomCols" -> strip(v)
      case ("clusterCols", v) => "clusterCols" -> strip(v)
      case kv => kv
    } -- distinct.map(n => s"colDefault.${enc(n)}")) +
      ("droppedCols" -> dropped)
    val newCm = cm -- nameSet
    val newMeta =
      if (newCm.isEmpty) base - "colmap"
      else base + ("colmap" -> encodeColMap(newCm))
    // FULL manifest for the same reason as renameColumn: the dropped
    // column's per-file stats/extras are scrubbed on every unchanged
    // file, which a delta cannot carry
    commitManifest(spark, table,
      StructType(snap.schema.fields.filterNot(f => nameSet(f.name))),
      snap.files, snap.version, newMeta, snap.partitionOf,
      snap.statsOf.map { case (f, m) => f -> (m -- nameSet) },
      snap.deleteFiles, None,
      snap.extraOf.map { case (f, m) =>
        f -> (m -- nameSet.map(n => s"nulls.$n")
          -- nameSet.map(n => s"predates.${enc(n)}")) })
  }

  /** METADATA-ONLY type widening (int -> long, float -> double): the
    * committed schema carries the wider type; Spark 4's parquet
    * readers up-convert the narrow physical values of pre-widening
    * files at scan time (both the vectorized and row-based paths), and
    * post-widening writes stage the wide type natively. Recorded
    * min/max stats compare as decimals, so file skipping is unaffected.
    */
  /** Pre-flight the widening rules without committing — lets a
    * multi-spec ALTER statement validate every spec before its first
    * commit (never half-apply then error).
    */
  private[sources] def requireWidenable(schema: StructType, name: String,
      to: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types.{DoubleType, FloatType,
      IntegerType, LongType}
    val f = schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no such column $name"))
    val ok = (f.dataType, to) match {
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
    require(ok, s"unsupported widening ${f.dataType.simpleString} -> " +
      s"${to.simpleString}: only int->bigint and float->double are " +
      "lossless at the parquet reader")
  }

  def widenColumn(spark: SparkSession, table: String, name: String,
      to: org.apache.spark.sql.types.DataType): Long =
    widenColumns(spark, table, Seq(name -> to))

  /** Widen several columns in ONE manifest commit. Each spec is
    * validated against the schema AS EVOLVED by the specs before it —
    * so two specs touching the same column fail the whole statement up
    * front (the second would be widening an already-widened type),
    * never after a first spec has committed.
    */
  def widenColumns(spark: SparkSession, table: String,
      widens: Seq[(String, org.apache.spark.sql.types.DataType)]): Long = {
    val snap = loadCurrent(spark, table)
    require(widens.nonEmpty, "ALTER COLUMN needs at least one spec")
    val newSchema = widens.foldLeft(snap.schema) { case (sch, (name, to)) =>
      requireWidenable(sch, name, to)
      StructType(sch.fields.map(x =>
        if (x.name == name) x.copy(dataType = to) else x))
    }
    commitManifest(spark, table, newSchema,
      snap.files, snap.version, snap.meta, snap.partitionOf,
      snap.statsOf, snap.deleteFiles, Some(snap), snap.extraOf)
  }

  /** Table history (the DESCRIBE HISTORY shape): one row per retained
    * version with its commit time (manifest mtime), file counts, and
    * the manifest-diff churn vs the predecessor — derived entirely
    * from the metadata tier (N manifest reads, zero data IO).
    * `files_added`/`files_removed` are NULL for a version whose
    * predecessor has been expired (no base to diff against).
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, table)
    val mDir = manifestDir(table)
    val versions =
      if (!f.exists(mDir)) Vector.empty[Long]
      else f.listStatus(mDir).iterator.map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
          n.stripPrefix("v").stripSuffix(".manifest").toLong
        }.toVector.sorted
    // chain-retained manifests below the retention floor are not
    // readable versions (their data files were expired) — exclude them
    val floor = retentionFloor(spark, table)
    val readable = versions.filter(_ >= floor)
    // memoized chain loader: N versions over a depth-d chain parse
    // each manifest ONCE (O(N + d) small-file reads), not once per
    // version's chain walk (O(N * d))
    val raw = scala.collection.mutable.Map.empty[Long, RawManifest]
    def rawOf(v: Long): RawManifest = raw.getOrElseUpdate(v,
      parseManifestFile(spark, table, manifestPath(table, v), v))
    val snaps = readable.map(v =>
      v -> resolveChain(rawOf(v), rawOf)).toMap
    readable.map { v =>
      val cur = snaps(v)
      val curSet = cur.files.toSet
      val prevSet = snaps.get(v - 1).map(_.files.toSet)
      (v,
        new java.sql.Timestamp(
          f.getFileStatus(manifestPath(table, v)).getModificationTime),
        cur.files.size,
        prevSet.map(p => (curSet -- p).size),
        prevSet.map(p => (p -- curSet).size),
        cur.deleteFiles.size, cur.depth > 0)
    }.toDF("version", "committed_at", "n_files", "files_added",
      "files_removed", "delete_files", "is_delta")
      .orderBy(col("version").asc_nulls_first)
  }

  /** A BRANCH head's history — the staged commit sequence a long-lived
    * WAP branch accumulated, previously unreachable from SQL (history
    * was main-line only): one row per live branch manifest (a re-seed
    * deletes consumed sequences, so gaps are normal), with the same
    * add/remove churn columns as [[history]] plus the fork base.
    * Metadata-tier only.
    */
  def branchHistory(spark: SparkSession, table: String,
      name: String): DataFrame = {
    import spark.implicits._
    requireRefName(name)
    require(branchHeadSeq(spark, table, name).isDefined,
      s"no branch $name on $table")
    val f = fs(spark, table)
    val seqs = f.listStatus(manifestDir(table)).iterator
      .map(_.getPath.getName)
      .collect { case BranchManifestRe(n, s) if n == name => s.toInt }
      .toVector.sorted
    val snaps = seqs.map(k => k -> readManifestAt(spark, table,
      branchManifestPath(table, name, k), k.toLong)).toMap
    seqs.map { k =>
      val cur = snaps(k)
      val curSet = cur.files.toSet
      val prevSet = snaps.get(k - 1).map(_.files.toSet)
      (k.toLong,
        new java.sql.Timestamp(f.getFileStatus(
          branchManifestPath(table, name, k)).getModificationTime),
        cur.files.size,
        prevSet.map(p => (curSet -- p).size),
        prevSet.map(p => (p -- curSet).size),
        cur.deleteFiles.size,
        cur.meta.get("branchBase").map(_.toLong))
    }.toDF("seq", "committed_at", "n_files", "files_added",
      "files_removed", "delete_files", "branch_base")
      .orderBy(col("seq").asc_nulls_first)
  }

  /** [[detail]] of a BRANCH head (same columns; `version` is the head
    * sequence): the explicit-scope redirect IS the implementation.
    */
  def branchDetail(spark: SparkSession, table: String,
      name: String): DataFrame =
    withBranch(spark, table, name)(detail(spark, table))

  /** `TIMESTAMP AS OF` resolution: the LATEST readable version whose
    * commit time (manifest mtime — the same clock [[history]] reports
    * as `committed_at`) is at or before `tsMillis`. Delta/Iceberg
    * boundary semantics: a timestamp equal to a commit's time reads
    * THAT commit; a timestamp after the last commit reads the latest
    * version; a timestamp before the first READABLE commit errors
    * (below it there is either nothing or only expired versions whose
    * data files are gone — resolving to them would fail mid-scan).
    * Metadata-tier only: one manifest-dir listing, no data IO.
    */
  def versionAtTimestamp(spark: SparkSession, table: String,
      tsMillis: Long): Long = {
    val f = fs(spark, table)
    val mDir = manifestDir(table)
    require(f.exists(mDir), s"no committed snapshot at $table")
    val floor = retentionFloor(spark, table)
    val committed = f.listStatus(mDir).iterator
      .filter(st => st.getPath.getName.startsWith("v") &&
        st.getPath.getName.endsWith(".manifest"))
      .map(st => (st.getPath.getName.stripPrefix("v")
        .stripSuffix(".manifest").toLong, st.getModificationTime))
      .filter(_._1 >= floor)
      .toVector.sortBy(_._1)
    require(committed.nonEmpty, s"no committed snapshot at $table")
    val eligible = committed.filter(_._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"timestamp ${new java.sql.Timestamp(tsMillis)} is before the " +
        s"earliest available version of $table (v${committed.head._1} " +
        s"committed at ${new java.sql.Timestamp(committed.head._2)})")
    eligible.last._1
  }

  /** The session's local timezone as a ZoneId — how Spark itself
    * anchors zone-free datetime text (`spark.sql.session.timeZone`).
    * Every graft surface that parses a zone-free timestamp rendering
    * resolves it here, so a string option, a string literal, and a
    * typed `TIMESTAMP '…'` literal for the same wall-clock time all
    * name the same instant (Delta's contract). The JVM default zone is
    * never consulted.
    */
  private[graft] def sessionZone(spark: SparkSession): java.time.ZoneId =
    org.apache.spark.sql.catalyst.util.DateTimeUtils
      .getZoneId(spark.sessionState.conf.sessionLocalTimeZone)

  // zone-free SQL timestamp/date text (`uuuu-M-d[ H:m:s[.f…]]`) as
  // LOCAL datetime fields — the zone is applied by the caller, never
  // the JVM default (java.sql.Timestamp.valueOf's trap)
  private val localTsFmt: java.time.format.DateTimeFormatter = {
    import java.time.temporal.ChronoField._
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("uuuu-M-d")
      .optionalStart().appendLiteral(' ').appendPattern("H:m")
      .optionalStart().appendPattern(":s")
      .optionalStart()
      .appendFraction(NANO_OF_SECOND, 1, 9, true)
      .optionalEnd().optionalEnd().optionalEnd()
      .parseDefaulting(HOUR_OF_DAY, 0)
      .parseDefaulting(MINUTE_OF_HOUR, 0)
      .parseDefaulting(SECOND_OF_MINUTE, 0)
      .parseDefaulting(NANO_OF_SECOND, 0)
      .toFormatter(java.util.Locale.ROOT)
  }

  /** A user-supplied `timestampAsOf` rendering as epoch millis: epoch
    * millis directly, a SQL timestamp (`yyyy-MM-dd HH:mm:ss[.f…]`), a
    * bare date, or an ISO-8601 instant. Zone-free formats (SQL
    * timestamp / date) are interpreted in the SESSION timezone —
    * matching how a typed `TIMESTAMP '…'` literal resolves, so both
    * renderings of the same wall-clock time pick the same version.
    */
  private[graft] def parseTsMillis(spark: SparkSession, s: String)
      : Long = {
    val t = s.trim
    if (t.nonEmpty && t.forall(c => c.isDigit || c == '-') &&
        t.count(_ == '-') <= (if (t.startsWith("-")) 1 else 0))
      return t.toLong
    try java.time.LocalDateTime.parse(t, localTsFmt)
      .atZone(sessionZone(spark)).toInstant.toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        try java.time.Instant.parse(t).toEpochMilli
        catch {
          case _: java.time.format.DateTimeParseException =>
            throw new IllegalArgumentException(
              s"cannot parse timestamp '$s' — pass epoch millis, " +
                "'yyyy-MM-dd[ HH:mm:ss[.f]]', or an ISO-8601 instant")
        }
    }
  }

  /** DESCRIBE DETAIL (the Delta shape): one row of table-level
    * metadata — version, file/delete-file counts, the declared layout
    * (partition / cluster / identity / stats / bloom / constraints),
    * manifest-chain shape, and the retention floor. Entirely
    * metadata-tier: one manifest chain read, no data IO.
    */
  def detail(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val snap = loadCurrent(spark, table)
    // materialized-view observability: its source, the refresh mark,
    // the source's CURRENT version (one manifest-dir listing) and the
    // derived staleness — the row an operator's "which MVs need a
    // refresh" sweep reads, and what maintain() keys its refresh on
    val mvSource = snap.meta.get("mvSource")
    val mvUpTo =
      if (mvSource.isDefined) snap.meta.get("cdcUpTo").map(_.toLong)
      else None
    val mvSrcVersion = mvSource.map(s => currentVersion(spark, s))
    val mvStale = (mvUpTo, mvSrcVersion) match {
      case (Some(u), Some(c)) => Some(c > u)
      case _ => None
    }
    Seq((
      "graft-snapshot", table, snap.version,
      snap.files.size, snap.deleteFiles.size,
      // transform-partitioned tables show the SPEC (days(ts), ...);
      // identity tables the bare column list — both read back through
      // repartitionTable / createPartitioned unchanged
      (if (snap.meta.contains("partitionSpec"))
         partitionSpecOf(snap).map(_.spec)
       else partitionColsOf(snap)).mkString(","),
      declaredClusterCols(snap).mkString(","),
      bucketSpecOf(snap).map(_._1.mkString(",")),
      snap.meta.get("bucketN").map(_.toInt),
      snap.meta.get("identityCol"),
      snap.meta.get("identityHwm").map(_.toLong),
      declaredStatsCols(snap).mkString(","),
      declaredBloomCols(snap).mkString(","),
      constraintsOf(snap).size,
      snap.depth > 0,
      retentionFloor(spark, table),
      mvSource, mvUpTo, mvSrcVersion, mvStale))
      .toDF("format", "location", "version", "num_files",
        "num_delete_files", "partition_columns", "cluster_columns",
        "bucket_column", "num_buckets",
        "identity_column", "identity_hwm", "stats_columns",
        "bloom_columns", "num_constraints", "is_delta_manifest",
        "retention_floor",
        "mv_source", "mv_up_to", "mv_source_version", "mv_stale")
  }

  /** Remove staged-but-never-committed batch dirs older than `graceMs`
    * — crash debris from writers that died before their commit rename
    * (whose files NO manifest of any version references). The grace
    * period protects a live writer between staging and committing; run
    * under the same no-concurrent-writer discipline as
    * [[expireSnapshots]]. Returns batch dirs removed.
    */
  def vacuumOrphans(spark: SparkSession, table: String,
      graceMs: Long = 3600000L): Int = {
    val f = fs(spark, table)
    val mDir = manifestDir(table)
    if (!f.exists(mDir)) return 0
    val versions = f.listStatus(mDir).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong
      }.toVector
    // unpublished WAP candidates reference their staged batches — they
    // are pending commits under audit, not crash debris
    val stagedRefs = f.listStatus(mDir).iterator.map(_.getPath)
      .filter(p => p.getName.startsWith("staged-") &&
        p.getName.endsWith(".manifest"))
      .flatMap { p =>
        val m = readManifestAt(spark, table, p, -1L)
        m.files ++ m.deleteFiles
      }.toVector
    val referenced = (versions
      .flatMap { v =>
        // readManifestAt, not readManifest: the reachability walk must
        // also see chain-retained manifests BELOW the retention floor
        val m = readManifestAt(spark, table, manifestPath(table, v), v)
        m.files ++ m.deleteFiles
      } ++ stagedRefs)
      .map(_.split('/')(1)).toSet // batch dir component of data/<b>/<f>
    val dataDir = new Path(table, "data")
    if (!f.exists(dataDir)) return 0
    val cutoff = System.currentTimeMillis() - graceMs
    var removed = 0
    f.listStatus(dataDir).filter(_.isDirectory).foreach { b =>
      if (!referenced.contains(b.getPath.getName) &&
          b.getModificationTime < cutoff) {
        f.delete(b.getPath, true)
        removed += 1
      }
    }
    removed + sweepOrphanGroups(spark, table, graceMs)
  }

  /** Append `df` as new files — no existing file is touched, the
    * manifest grows by the new batch (the R22 verb, snapshot-committed).
    */
  def append(spark: SparkSession, table: String, df: DataFrame): Long =
    append(spark, table, df, mergeSchema = false)

  /** Append with OPT-IN write-time schema evolution (the Delta
    * `mergeSchema` shape): when `mergeSchema` is true, source columns
    * the table lacks are added — NULLABLE, in the SAME atomic commit
    * as the data (existing files read them as NULL via parquet by-name
    * resolution, exactly like [[addColumns]]), and the frame is
    * aligned-by-name against the evolved schema (unknown-column drift
    * still errors when the option is off; retired names still error
    * always — evolution must never resurrect renamed/dropped data).
    */
  def append(spark: SparkSession, table: String, df: DataFrame,
      mergeSchema: Boolean): Long = {
    val snap0 = loadCurrent(spark, table)
    val (snap, batch0) =
      if (!mergeSchema) (snap0, df)
      else {
        val s = evolvedFor(snap0, df.schema, "append(mergeSchema)")
        (s, GraftDml.alignByName(df, writeSchemaFor(s, df),
          "append frame", allowSubset = false))
      }
    val (batch, metaUp) = identityFor(snap, batch0)
    val (files, labels, stats, extras) = stageFor(snap, batch, table)
    commitManifest(spark, table, snap.schema, snap.files ++ files,
      snap.version, snap.meta ++ metaUp, snap.partitionOf ++ labels,
      snap.statsOf ++ stats, snap.deleteFiles, Some(snap0),
      snap.extraOf ++ extras)
  }

  /** The snapshot with its schema evolved to append `src`'s NEW
    * columns (case-insensitive match; forced nullable — existing files
    * have no values). Enforces [[addColumns]]' retired-name guard: a
    * renamed-away or dropped name would resurrect stale file data.
    */
  private def evolvedFor(snap: Snapshot,
      src: org.apache.spark.sql.types.StructType,
      what: String): Snapshot = {
    val have = snap.schema.fieldNames.map(_.toLowerCase).toSet
    val fresh = src.fields.filter(f => !have(f.name.toLowerCase))
    if (fresh.isEmpty) return snap
    val retired = retiredNames(snap)
    val reused = fresh.map(_.name)
      .filter(n => retired.exists(_.equalsIgnoreCase(n)))
    require(reused.isEmpty,
      s"$what: column name(s) ${reused.mkString(", ")} were renamed " +
        "away or dropped — old files still hold values under them, and " +
        "by-name parquet resolution would resurrect that data; pick " +
        "fresh names")
    require(fresh.map(_.name.toLowerCase).distinct.length == fresh.length,
      s"$what: new columns collide case-insensitively: " +
        fresh.map(_.name).mkString(", "))
    snap.copy(schema = StructType(snap.schema.fields ++
      fresh.map(_.copy(nullable = true))))
  }

  /** Atomic whole-table replace (the INSERT OVERWRITE verb): stage the
    * new contents and commit ONE snapshot listing only the fresh files
    * — readers see old-or-new, never a mix, and the replaced version
    * stays time-travelable until [[expireSnapshots]]. Deletion vectors
    * are dropped (they target replaced files); partition labels, stats
    * and bloom sidecars are rebuilt by the staging pass like every
    * other mutation, so skipping never degrades. Stream high-water
    * marks carry over — a replace must not re-open the exactly-once
    * replay window (the [[restore]] rule).
    */
  /** PARTITION-SPEC EVOLUTION as an honest staged full rewrite: the
    * table's rows restage under `newPartitionCols` (one or several;
    * empty de-partitions) and ONE atomic manifest commit publishes the
    * new layout — readers see the old layout or the new, never a mix,
    * and a crash mid-stage leaves only an orphaned batch dir for
    * [[vacuumOrphans]]. Old versions keep time-traveling with THEIR
    * layout (each manifest carries its own labels). Identity,
    * constraints, clustering, stats/bloom declarations, column
    * defaults and stream marks all carry over; the rewrite
    * materializes deletion vectors, column mappings and initial
    * defaults exactly like [[compact]]. The alternative design —
    * Iceberg's spec-versioned manifests, where a new spec applies only
    * to future files — avoids the rewrite but makes every scan plan
    * against a UNION of specs; at this layer's one-level manifest the
    * staged rewrite is the honest shape, and it prices the operation
    * truthfully (a layout change IS a full shuffle of the data).
    */
  def repartitionTable(spark: SparkSession, table: String,
      newPartitionCols: Seq[String]): Long = {
    val snap = loadCurrent(spark, table)
    // spec items may be transforms (days(ts), bucket(n, c), ...) —
    // parse validates sources against the schema
    val transforms =
      PartitionTransforms.parse(newPartitionCols, snap.schema)
    val sources = transforms.map(_.source)
    require(newPartitionCols.distinct.size == newPartitionCols.size,
      "partition spec items must be distinct")
    snap.meta.get("identityCol").foreach(idc =>
      require(!sources.exists(_.equalsIgnoreCase(idc)),
        s"cannot partition by the identity column $idc"))
    // a declared bucket layout SURVIVES partition-spec evolution: the
    // staged rewrite re-derives labels AND re-buckets (partition ×
    // bucket composes; see createBucketed's partitionBy)
    // rewrite = materialization (DVs, colmap, initial defaults), same
    // as compact — so the evolved manifest sheds them
    val df = readFilesDv(spark, table, snap, snap.files)
    val newMeta0 =
      snap.meta - "partitionCol" - "partitionCols" - "partitionSpec" -
        "colmap" - "droppedCols" - "stagingTz"
    val newMeta =
      if (transforms.exists(!_.isIdentity))
        newMeta0 +
          ("partitionSpec" ->
            transforms.map(t => enc(t.spec)).mkString(",")) +
          ("partitionCols" -> sources.map(enc).mkString(","))
      else sources match {
        case Nil => newMeta0
        // a BUCKETED table must carry `partitionCols` even for one
        // identity column: stageFor's partition × bucket composed
        // branch (and partValuesOf's label decode) key on
        // partitionCols/partitionSpec — the legacy bare key would
        // stage partition-only files with NO bucket tags under a
        // manifest that still declares a BucketSpec ("Invalid bucket
        // file" on the next bucketed scan)
        case Seq(one) if bucketSpecOf(snap).isDefined =>
          newMeta0 + ("partitionCols" -> enc(one))
        case Seq(one) => newMeta0 + ("partitionCol" -> one)
        case many =>
          newMeta0 + ("partitionCols" -> many.map(enc).mkString(","))
      }
    val target = snap.copy(meta = newMeta)
    val (files, labels, stats, extras) = stageFor(target, df, table)
    commitManifest(spark, table, snap.schema, files, snap.version,
      newMeta, labels, stats, Nil, Some(snap), extras)
  }

  /** BUCKET-LAYOUT evolution: move a table that outgrew its bucket
    * count to a new one (or new bucket columns / within-bucket sort)
    * without recreate — a staged FULL rewrite, the honest shape like
    * [[repartitionTable]] (a bucket-count change IS a full shuffle of
    * the data; Iceberg's spec-versioned alternative avoids the rewrite
    * but then every scan plans against a union of incompatible hash
    * layouts and the exchange-free join property is lost until
    * rewrite anyway). Old versions time-travel with THEIR layout; the
    * new manifest immediately reports the new BucketSpec, so an
    * equal-bucketed join at the new count plans with zero exchanges.
    * Composes with a declared partition layout (labels re-derive in
    * the same rewrite) and materializes DVs/colmap/defaults like
    * compact. Defaults: keep the current bucket columns and sort.
    */
  def rebucketTable(spark: SparkSession, table: String,
      numBuckets: Int, bucketCols: Seq[String] = Nil,
      sortCols: Seq[String] = Nil): Long = {
    val snap = loadCurrent(spark, table)
    val cur = bucketSpecOf(snap)
    val cols =
      if (bucketCols.nonEmpty) bucketCols
      else cur.map(_._1).getOrElse(Seq.empty)
    require(cols.nonEmpty,
      s"$table is not bucketed — pass bucketCols to introduce a " +
        "bucket layout")
    (cols ++ sortCols).foreach(c =>
      require(snap.schema.fieldNames.contains(c),
        s"bucket/sort column $c is not a table column " +
          s"(${snap.schema.fieldNames.mkString(", ")})"))
    require(numBuckets > 0 && numBuckets <= 100000,
      s"numBuckets must be in [1, 100000], got $numBuckets")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketSortOf(snap)
    val df = readFilesDv(spark, table, snap, snap.files)
    // a table carrying the legacy single `partitionCol` key upgrades
    // to `partitionCols` here: the bucket layout being introduced (or
    // rewritten) stages through the partition × bucket composed branch,
    // which keys on partitionCols/partitionSpec and writes enc'd
    // composite labels — leaving the bare key would stage partition
    // files with no bucket tags under a manifest declaring a BucketSpec
    val meta0 = snap.meta.get("partitionCol") match {
      case Some(pc) =>
        (snap.meta - "partitionCol") + ("partitionCols" -> enc(pc))
      case None => snap.meta
    }
    val newMeta = (meta0 - "bucketCol" - "bucketSort" - "colmap" -
      "droppedCols") +
      ("bucketCols" -> cols.map(enc).mkString(",")) +
      ("bucketN" -> numBuckets.toString) ++
      (if (sorts.isEmpty) Map.empty[String, String]
       else Map("bucketSort" -> sorts.map(enc).mkString(",")))
    val target = snap.copy(meta = newMeta)
    val (files, labels, stats, extras) = stageFor(target, df, table)
    commitManifest(spark, table, snap.schema, files, snap.version,
      newMeta, labels, stats, Nil, Some(snap), extras)
  }

  def replaceContents(spark: SparkSession, table: String,
      df: DataFrame): Long =
    replaceContents(spark, table, df, mergeSchema = false)

  /** As the two-arg overload; `mergeSchema` opts into write-time
    * schema evolution (see [[append]]'s four-arg doc) — new nullable
    * source columns are added in the same atomic replace commit.
    */
  def replaceContents(spark: SparkSession, table: String,
      df: DataFrame, mergeSchema: Boolean): Long = {
    val snap0 = loadCurrent(spark, table)
    val snap =
      if (mergeSchema) evolvedFor(snap0, df.schema, "replace(mergeSchema)")
      else snap0
    // identity tables: the replacement rows get FRESH ids continuing
    // from the mark (it never resets — the AUTOINCREMENT rule), so the
    // frame may omit the column like any other append-shaped write
    val batch0 =
      if (mergeSchema) GraftDml.alignByName(df, writeSchemaFor(snap, df),
        "replace frame", allowSubset = false)
      else if (snap.meta.contains("identityCol")) df
      else df.select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
    val (batch, metaUp) = identityFor(snap, batch0)
    val (files, labels, stats, extras) = stageFor(snap, batch, table)
    // every surviving row is freshly staged under CURRENT column names,
    // so the replace clears the column mapping exactly like compact()
    // — the raw FileIndex fast path resumes and retired names free up.
    // The identity mark update MUST ride this commit: dropping it
    // would hand the replaced rows' ids out again on the next append
    commitManifest(spark, table, snap.schema, files, snap.version,
      snap.meta - "colmap" - "droppedCols" ++ metaUp, labels, stats, Nil,
      Some(snap0), extras)
  }

  /** CREATE with an IDENTITY column (the reference's `INTEGER PRIMARY
    * KEY AUTOINCREMENT`, database.py:78,83 — every reference table
    * leads with one): the table carries `identityCol` metadata and a
    * HIGH-WATER MARK in the manifest, and every append-shaped write
    * (library append, SQL INSERT, the streaming sink, MERGE inserts)
    * assigns the next `n` ids — monotonic, gap-free within a batch,
    * never reused (the mark only ratchets; [[restore]] keeps the max).
    *
    * Assignment is the parallel global-rank pattern
    * ([[graft.operators.ScalePatterns.withGlobalRank]] — prefix-sum of
    * partition counts, NO single-task window), offset by the mark read
    * from the CURRENT manifest; the new mark commits in the SAME
    * atomic manifest as the data, so ids are exactly-once across
    * commit-conflict retries: a loser re-reads the winner's mark and
    * re-assigns from there — two appends can never share ids.
    *
    * Within-batch ORDER: ascending `sortCols` when declared (the
    * deterministic, testable shape — e.g. event time); otherwise
    * xxhash64 of the row (content-determined, shuffle-independent).
    * The column is GENERATED ALWAYS: explicit values are rejected
    * loudly (an all-NULL column — the INSERT-column-subset fill — is
    * re-assigned). Declared nullable so INSERT column lists may omit
    * it; it is never actually null.
    */
  def createWithIdentity(spark: SparkSession, table: String,
      df: DataFrame, idCol: String = "id", sortCols: Seq[String] = Nil,
      numFiles: Int = 8, partitionCols: Seq[String] = Nil): Long = {
    require(currentVersion(spark, table) == 0,
      s"$table already has committed snapshots")
    require(!df.columns.exists(_.equalsIgnoreCase(idCol)),
      s"the create frame already carries $idCol — identity values are " +
        "GENERATED ALWAYS, never supplied")
    sortCols.foreach(c => require(df.columns.contains(c),
      s"identity sort column $c is not in the frame " +
        s"(${df.columns.mkString(", ")})"))
    // items may be transforms (days(ts), bucket(n, c), ...) — identity
    // composes with hidden partitioning like with identity columns
    val transforms = PartitionTransforms.parse(partitionCols, df.schema)
    require(!transforms.exists(_.source.equalsIgnoreCase(idCol)),
      s"cannot partition by the identity column $idCol — its values " +
        "are assigned at commit, after the layout is chosen")
    val schema = StructType(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType, nullable = true) +:
        df.schema.fields)
    val meta = Map("identityCol" -> idCol, "identityHwm" -> "0") ++
      (if (sortCols.isEmpty) Map.empty[String, String]
       else Map("identitySort" -> sortCols.map(enc).mkString(","))) ++
      (if (transforms.exists(!_.isIdentity))
         Map("partitionSpec" ->
           transforms.map(t => enc(t.spec)).mkString(","),
           "partitionCols" ->
             transforms.map(t => enc(t.source)).mkString(","))
       else transforms.map(_.source) match {
        case Nil => Map.empty[String, String]
        case Seq(one) => Map("partitionCol" -> one)
        case many => Map("partitionCols" -> many.map(enc).mkString(","))
      })
    val snap0 = Snapshot(0L, schema, Nil, meta)
    val (assigned, hwm) = assignIdentity(snap0, df)
    if (partitionCols.isEmpty) {
      val files = stageBatch(assigned.repartition(numFiles), table)
      commitManifest(spark, table, schema, files, 0L,
        meta + ("identityHwm" -> hwm.toString))
    } else {
      // identity + partitioned: ids are assigned globally FIRST (the
      // rank pipeline is layout-independent), then the assigned rows
      // stage through the shared layout-aware path — every later
      // append verb already composes identityFor with stageFor, so
      // create was the only missing combination
      val (files, labels, stats, extras) = stageFor(snap0, assigned,
        table)
      commitManifest(spark, table, schema, files, 0L,
        meta + ("identityHwm" -> hwm.toString), labels, stats, Nil,
        None, extras)
    }
  }

  /** Assign `hwm+1 .. hwm+n` to the table's identity column (see
    * [[createWithIdentity]]). Returns the frame in schema order and
    * the new high-water mark. The ranked input is localCheckpoint'ed
    * by withGlobalRank, so the staged data and the returned mark are
    * computed from ONE materialization — a non-deterministic upstream
    * cannot make them disagree.
    */
  private def assignIdentity(snap: Snapshot, df: DataFrame)
      : (DataFrame, Long) = {
    val idc = snap.meta("identityCol")
    val hwm = snap.meta.getOrElse("identityHwm", "0").toLong
    val base = df.columns.find(_.equalsIgnoreCase(idc)) match {
      case Some(actual) =>
        require(df.filter(col(s"`$actual`").isNotNull).isEmpty,
          s"column $idc is GENERATED ALWAYS AS IDENTITY — explicit " +
            "values are not accepted; omit the column")
        df.drop(actual)
      case None => df
    }
    val order = snap.meta.get("identitySort")
      .map(_.split(',').filter(_.nonEmpty).toSeq
        .map(c => col(s"`${dec(c)}`")))
      .getOrElse(Seq(xxhash64(
        base.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)))
    val rank = "__graft_identity_rank"
    require(!base.columns.contains(rank),
      s"the frame may not carry the reserved column $rank")
    // materialize ONCE before ranking: withGlobalRank's
    // repartitionByRange SAMPLES its input in a separate job, so an
    // upstream Observation (the verbs' inserted-count metrics) would
    // fire twice and report a doubled count — the barrier makes every
    // caller's observed plan execute exactly once, and the rank
    // pipeline reads the checkpointed rows
    val once = base.localCheckpoint()
    val ranked = graft.operators.ScalePatterns
      .withGlobalRank(once, rank, order: _*)
    val assigned = ranked.withColumn(idc, col(rank) + lit(hwm)).drop(rank)
      .select(snap.schema.fieldNames
        .map(n => col(s"`$n`")).toIndexedSeq: _*)
    val n = ranked.agg(coalesce(max(col(rank)), lit(0L))).head().getLong(0)
    // withGlobalRank's own (eager) checkpoint now holds the ranked
    // rows — release the barrier copy instead of waiting for the
    // ContextCleaner, or a long-lived writer session accumulates a
    // dead batch copy in block storage per identity write
    once.unpersist(blocking = false)
    (assigned, hwm + n)
  }

  /** The identity-aware append pre-pass shared by every append-shaped
    * verb: assigns ids and returns the manifest-meta update carrying
    * the new high-water mark (empty when the table has no identity).
    */
  private def identityFor(snap: Snapshot, batch: DataFrame)
      : (DataFrame, Map[String, String]) =
    if (!snap.meta.contains("identityCol")) (batch, Map.empty)
    else {
      val (assigned, hwm) = assignIdentity(snap, batch)
      (assigned, Map("identityHwm" -> hwm.toString))
    }

  /** The align-by-name target for a write into an identity table: the
    * schema minus the identity column when the frame doesn't carry it
    * — the column is ASSIGNED at commit, not supplied, so the writer's
    * every-column-present rule must not demand it.
    */
  private[sources] def writeSchemaFor(snap: Snapshot,
      df: DataFrame): StructType =
    snap.meta.get("identityCol") match {
      case Some(c) if !df.columns.exists(_.equalsIgnoreCase(c)) =>
        StructType(snap.schema.filterNot(_.name.equalsIgnoreCase(c)))
      case _ => snap.schema
    }

  /** GENERATED ALWAYS enforcement for the mutation verbs: UPDATE /
    * MERGE assignments may never target the identity column.
    */
  private def requireNotIdentity(snap: Snapshot,
      assigned: Iterable[String], what: String): Unit =
    snap.meta.get("identityCol").foreach { idc =>
      require(!assigned.exists(_.equalsIgnoreCase(idc)),
        s"column $idc is GENERATED ALWAYS AS IDENTITY — $what may " +
          "not assign it")
    }

  /** Table-relative paths of the files that contain rows matching
    * `predicate` — a pushed-down scan reading only the predicate's
    * columns plus file provenance; the heart of file-granular mutation.
    */
  private def affectedFiles(spark: SparkSession, table: String,
      snap: Snapshot, predicate: Column): Seq[String] = {
    if (snap.files.isEmpty) return Nil
    // DV-applied provenance scan: a file whose only matching rows are
    // already vector-deleted is NOT affected (rewriting it would be
    // wasted IO, though never wrong)
    // __fk is the manifest-relative path in URI-ENCODED space — decode
    // the (file-count-bounded) collected set on the driver before
    // matching the raw manifest paths, or files in partitions whose
    // value carries a URI-special character silently never match
    val keys = readFilesDvProv(spark, table, snap, snap.files)
      .filter(predicate)
      .select(col("__fk")).distinct()
      .collect().map(r => pctDecode(r.getString(0))).toSet
    snap.files.filter(keys)
  }

  /** File-granular R23: rewrite ONLY the files containing matching rows,
    * commit a manifest that swaps them for the rewritten batch. Returns
    * (new version, matched row count, files rewritten).
    */
  def updateWhere(spark: SparkSession, table: String, predicate: Column,
      assignments: Map[String, Column]): (Long, Long, Int) = {
    val snap = loadCurrent(spark, table)
    val hit = affectedFiles(spark, table, snap, predicate)
    if (hit.isEmpty) return (snap.version, 0L, 0)
    // DV-applied: a rewrite materializes the touched files' deletion
    // vectors (their dead rows must not resurrect); stale DV entries
    // pointing at the replaced files match nothing afterwards.
    // The matched count rides the rewrite pass as an observed metric
    // (CollectMetrics — Delta's merge-metrics shape) instead of a
    // separate count() job over the touched files.
    val obs = org.apache.spark.sql.Observation(
      s"graft-upd-${java.util.UUID.randomUUID()}")
    val touched = readFilesDv(spark, table, snap, hit)
      .observe(obs, sum(when(predicate, 1L).otherwise(0L)).as("matched"))
    // ONE simultaneous select, never a withColumn fold: SQL UPDATE
    // semantics bind every assignment RHS and the predicate against
    // the OLD row. A sequential fold would let later assignments (and
    // the re-evaluated predicate) see already-updated values — `SET
    // a = b, b = a` must swap, and `SET a = 0, c = 1 WHERE a > 5`
    // must update c on exactly the rows that matched on the old a.
    // Every assignment CASTS to the column's declared type (the same
    // rule as INSERT/MERGE): an uncast RHS would let CaseWhen type
    // promotion stage parquet whose type differs from the manifest
    // schema — committing a version the schema'd reader cannot open.
    requireAssignable(snap.schema, assignments)
    requireNotIdentity(snap, assignments.keys, "UPDATE")
    val rewritten = touched.select(snap.schema.map { f =>
      assignments.get(f.name) match {
        case Some(v) =>
          when(predicate, v.cast(f.dataType))
            .otherwise(col(f.name)).as(f.name)
        case None => col(f.name)
      }
    }.toIndexedSeq: _*)
    val (fresh, labels, stats, extras) = stageFor(snap, rewritten, table)
    val matched = observedLong(obs.get, "matched")(
      readFilesDv(spark, table, snap, hit).filter(predicate).count())
    val keep = snap.files.filterNot(hit.contains)
    val v = commitManifest(spark, table, snap.schema, keep ++ fresh,
      snap.version, snap.meta, (snap.partitionOf -- hit) ++ labels,
      (snap.statsOf -- hit) ++ stats, snap.deleteFiles, Some(snap),
      (snap.extraOf -- hit) ++ extras)
    (v, matched, hit.size)
  }

  /** File-granular R24: rewrite only the files containing matching rows,
    * keeping their non-matching rows; a file whose rows all match simply
    * leaves the manifest (no rewrite output). Returns (new version,
    * deleted row count, files rewritten).
    */
  def deleteWhere(spark: SparkSession, table: String,
      predicate: Column): (Long, Long, Int) = {
    val snap = loadCurrent(spark, table)
    val matches = coalesce(predicate, lit(false))
    val hit = affectedFiles(spark, table, snap, matches)
    if (hit.isEmpty) return (snap.version, 0L, 0)
    // both counts ride the survivor-rewrite pass as observed metrics
    // (the CollectMetrics node sits below the filter, so it sees every
    // touched row) — no separate count() job before the write
    val obs = org.apache.spark.sql.Observation(
      s"graft-del-${java.util.UUID.randomUUID()}")
    val touched = readFilesDv(spark, table, snap, hit)
      .observe(obs,
        sum(when(matches, 1L).otherwise(0L)).as("deleted"),
        sum(when(matches, 0L).otherwise(1L)).as("kept"))
    val survivors = touched.filter(!matches)
    val (staged, labels, stats, extras) = stageFor(snap, survivors, table)
    val mm = obs.get
    lazy val recount = readFilesDv(spark, table, snap, hit)
      .agg(coalesce(sum(when(matches, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(matches, 0L).otherwise(1L)), lit(0L))).head()
    val deleted = observedLong(mm, "deleted")(recount.getLong(0))
    // every touched row matched: the staged batch holds only Spark's
    // schema-carrying empty file — drop it; the fully-deleted files
    // simply leave the manifest with no replacement
    val fresh =
      if (observedLong(mm, "kept")(recount.getLong(1)) > 0L) staged
      else { dropStagedBatches(spark, table, staged); Nil }
    val keep = snap.files.filterNot(hit.contains)
    val v = commitManifest(spark, table, snap.schema, keep ++ fresh,
      snap.version, snap.meta, (snap.partitionOf -- hit) ++ labels,
      (snap.statsOf -- hit) ++ stats, snap.deleteFiles, Some(snap),
      (snap.extraOf -- hit) ++ extras)
    (v, deleted, hit.size)
  }

  /** File-granular MERGE (upsert): rows of `source` whose `key` exists
    * in the table update their row in place (source columns win); new
    * keys append as a fresh batch. Only files CONTAINING matched keys
    * are rewritten — unmatched files carry over verbatim, and the
    * matched-key probe is an equi-join on the key column only (column
    * pruning reaches the scan). One commit publishes both halves
    * atomically. Update semantics are column-wise source-wins with NULL
    * falling back to the target value (the foreachBatch upsert sink's
    * semantics — with a NULL-free source this is row replacement).
    * Duplicate source keys collapse to one arbitrary row
    * (dropDuplicates); pass a pre-deduped source for determinism.
    * Returns (new version, rows updated, rows inserted, files
    * rewritten).
    */
  def mergeInto(spark: SparkSession, table: String, source: DataFrame,
      key: String): (Long, Long, Long, Int) = {
    val snap = loadCurrent(spark, table)
    // identity tables: the column is GENERATED ALWAYS — the upsert
    // source must not carry it; matched rows keep their target id,
    // inserted rows draw fresh ones below
    val idcOpt = snap.meta.get("identityCol")
    idcOpt.foreach { idc =>
      require(!source.columns.exists(_.equalsIgnoreCase(idc)),
        s"column $idc is GENERATED ALWAYS AS IDENTITY — the merge " +
          "source must not carry it (matched rows keep their id, " +
          "inserts draw fresh ones)")
      require(!key.equalsIgnoreCase(idc),
        s"cannot merge on identity column $idc — its values are " +
          "generated, a source cannot address them")
    }
    val srcSchema = snap.schema.filterNot(f =>
      idcOpt.exists(_.equalsIgnoreCase(f.name)))
    val cols = snap.schema.fieldNames
    // CAST to the table schema, not just select: a source whose column
    // types differ (e.g. an int literal for a bigint key) would
    // otherwise stage mistyped parquet the schema'd reader cannot open
    // — committing an unreadable table version (the INSERT path casts
    // for exactly this reason)
    val src = source.select(srcSchema.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      .dropDuplicates(key)
    val cur = readFilesDv(spark, table, snap, snap.files)
    val srcKeys = src.select(col(key))
    // files holding at least one matched LIVE key (pruned scan: key +
    // provenance). The file key is captured by the provenance read
    // BEFORE the semi join — after it, the plan has two sources and a
    // bare input_file_name would be rejected as ambiguous.
    val hitKeys = readFilesDvProv(spark, table, snap, snap.files)
      .select(col(key), col("__fk"))
      .join(srcKeys, Seq(key), "left_semi")
      .select(col("__fk")).distinct()
      .collect().map(r => pctDecode(r.getString(0))).toSet
    val hit = snap.files.filter(hitKeys)
    val (rewrittenFiles, updated) = if (hit.isEmpty)
      ((Nil: Seq[String], Map.empty[String, String],
        Map.empty[String, Map[String, (String, String)]],
        Map.empty[String, Map[String, String]]), 0L)
    else {
      // the updated count rides the rewrite pass as an observed metric
      // (every touched row flows through the CollectMetrics node; the
      // __k probe marks the matched ones) — no separate semi-join job
      val obs = org.apache.spark.sql.Observation(
        s"graft-mrg-${java.util.UUID.randomUUID()}")
      val touched = readFilesDv(spark, table, snap, hit)
      val s2 = src.select(
        col(key).as("__k") +: srcSchema.map(_.name).filterNot(_ == key)
          .map(c => col(c).as(s"__s_$c")).toIndexedSeq: _*)
      val merged = touched
        .join(s2, touched(key) === col("__k"), "left_outer")
        .observe(obs,
          sum(when(col("__k").isNotNull, 1L).otherwise(0L)).as("updated"))
        .select(cols.map(c =>
          if (c == key) col(key)
          // a matched row KEEPS its identity value — the source has
          // no say over a generated column
          else if (idcOpt.exists(_.equalsIgnoreCase(c))) col(c)
          else coalesce(when(col("__k").isNotNull, col(s"__s_$c")),
            col(c)).as(c)).toIndexedSeq: _*)
      val staged = stageFor(snap, merged, table)
      val nUpd = observedLong(obs.get, "updated")(
        readFilesDv(spark, table, snap, hit)
          .join(srcKeys, Seq(key), "left_semi").count())
      (staged, nUpd)
    }
    // the inserted count likewise rides the insert-batch write; a
    // no-insert merge stages only Spark's schema-carrying empty file,
    // which is dropped again below
    val obsIns = org.apache.spark.sql.Observation(
      s"graft-ins-${java.util.UUID.randomUUID()}")
    val inserts = src.join(
      cur.select(col(key)).distinct(), Seq(key), "left_anti")
      .observe(obsIns, sum(lit(1L)).as("inserted"))
    // inserted rows draw fresh identity values; the new mark rides the
    // same atomic commit as the upsert
    val (insertRows, idMeta) = identityFor(snap, inserts)
    val (insertFiles0, insertLabels, insertStats, insertExtras) =
      stageFor(snap, insertRows, table)
    val nIns = observedLong(obsIns.get, "inserted")(
      src.join(cur.select(col(key)).distinct(), Seq(key), "left_anti")
        .count())
    val insertFiles =
      if (nIns > 0) insertFiles0
      else { dropStagedBatches(spark, table, insertFiles0); Nil }
    if (updated == 0 && nIns == 0) return (snap.version, 0L, 0L, 0)
    val keep = snap.files.filterNot(hit.contains)
    val v = commitManifest(spark, table, snap.schema,
      keep ++ rewrittenFiles._1 ++ insertFiles, snap.version,
      snap.meta ++ (if (nIns > 0) idMeta else Map.empty),
      (snap.partitionOf -- hit) ++ rewrittenFiles._2 ++ insertLabels,
      (snap.statsOf -- hit) ++ rewrittenFiles._3 ++ insertStats,
      snap.deleteFiles, Some(snap),
      (snap.extraOf -- hit) ++ rewrittenFiles._4 ++ insertExtras)
    (v, updated, nIns, hit.size)
  }

  /** One WHEN clause of a general MERGE (matched or not-matched-by-
    * source side): `set` None = THEN DELETE, Some = THEN UPDATE SET
    * (empty map is legal and means "no column changes"); `condition`
    * None = unconditional. Target columns are plain `col(name)`; source
    * columns are [[srcRef]].
    */
  final case class MergeWhen(condition: Option[Column],
      set: Option[Map[String, Column]])

  /** One WHEN NOT MATCHED clause: insert `values` (target column ->
    * source-side expression; omitted nullable columns fill with typed
    * NULLs) when `condition` (source-side) holds.
    */
  final case class MergeInsert(condition: Option[Column],
      values: Map[String, Column])

  /** A SOURCE column inside a [[MergeWhen]]/[[MergeInsert]] expression
    * (the merge join prefixes source columns to keep the two
    * namespaces disjoint).
    */
  def srcRef(name: String): Column = col(s"`__s_$name`")

  /** General MERGE with the full Delta clause surface: conditional
    * matched clauses, `WHEN MATCHED THEN DELETE`, column-level
    * `UPDATE SET c = expr`, `WHEN NOT MATCHED [AND cond] THEN INSERT`,
    * `WHEN NOT MATCHED BY SOURCE` update/delete, multi-column equality
    * ON. Clause PRECEDENCE is Delta's: within each category clauses
    * evaluate in declaration order and the FIRST one whose condition
    * holds acts; a row no clause claims carries over (matched / not
    * matched by source) or is discarded (not matched).
    *
    * Execution stays file-granular: touched files = files holding at
    * least one row a matched or not-matched-by-source clause could
    * claim (key semi-join + target-only clause predicates, pruned
    * provenance scan); each touched file's rows rewrite in ONE
    * simultaneous select (every assignment binds against the OLD row
    * and CASTS to the declared column type — the UPDATE discipline);
    * inserts stage as one fresh batch; ONE atomic commit publishes all
    * of it. IO ∝ matches, never table size.
    *
    * The Delta cardinality rule is enforced: a target row matching
    * MORE THAN ONE source row is ambiguous (which clause update wins
    * would be nondeterministic) and raises rather than guessing.
    *
    * Returns (new version, updated, deleted, inserted, files
    * rewritten).
    */
  def mergeIntoFull(spark: SparkSession, table: String, source: DataFrame,
      on: Seq[(String, String)], matched: Seq[MergeWhen],
      notMatchedBySource: Seq[MergeWhen], notMatched: Seq[MergeInsert])
      : (Long, Long, Long, Long, Int) =
    mergeIntoFull(spark, table, source, on, matched, notMatchedBySource,
      notMatched, mergeSchema = false)

  /** As the seven-arg overload; `mergeSchema` opts into Delta-style
    * autoMerge: SOURCE columns the target lacks are added — nullable,
    * in the SAME atomic commit as the merge itself. Rewritten target
    * rows read the new columns as NULL unless a clause assigns them;
    * insert clauses may assign them like any other column. The
    * retired-name guard still applies (see [[addColumns]]).
    */
  def mergeIntoFull(spark: SparkSession, table: String, source: DataFrame,
      on: Seq[(String, String)], matched: Seq[MergeWhen],
      notMatchedBySource: Seq[MergeWhen], notMatched: Seq[MergeInsert],
      mergeSchema: Boolean)
      : (Long, Long, Long, Long, Int) = {
    val snap0 = loadCurrent(spark, table)
    // the evolved snapshot threads through the WHOLE merge: target
    // scans read the new columns as NULL (explicit-schema parquet
    // by-name resolution), clause validation and the rewrite/insert
    // projections see the expanded schema, and the single commit
    // publishes it — evolution and mutation are one atomic step
    val snap =
      if (mergeSchema) evolvedFor(snap0, source.schema, "MERGE source")
      else snap0
    val schema = snap.schema
    require(on.nonEmpty, "MERGE ON must contain at least one " +
      "target = source column equality")
    on.foreach { case (t, s) =>
      require(schema.fieldNames.contains(t),
        s"MERGE ON names unknown target column $t")
      require(source.columns.contains(s),
        s"MERGE ON names unknown source column $s")
    }
    require(!schema.fieldNames.exists(c =>
      c.startsWith("__s_") || c == "__m" || c == "__mk"),
      "target columns may not use the reserved __s_/__m prefixes")
    (matched ++ notMatchedBySource).flatMap(_.set).foreach { m =>
      requireAssignable(schema, m)
      requireNotIdentity(snap, m.keys, "MERGE UPDATE")
    }
    notMatched.foreach { i =>
      requireAssignable(schema, i.values)
      requireNotIdentity(snap, i.values.keys, "MERGE INSERT")
      val omittedNonNull = schema.filter(f =>
        !f.nullable && !i.values.contains(f.name))
      require(omittedNonNull.isEmpty,
        "MERGE INSERT omits non-nullable columns: " +
          omittedNonNull.map(_.name).mkString(", "))
    }
    val srcP = source.select(source.columns.map(c =>
      col(s"`$c`").as(s"__s_$c")).toIndexedSeq: _*)
      .withColumn("__m", lit(true))
    val sKeys = on.map { case (_, s) => col(s"`__s_$s`") }
    // Delta cardinality rule: error ONLY when a TARGET row would match
    // more than one source row (that update would be
    // nondeterministic). Duplicate source keys that match nothing —
    // including NULL keys, which never equi-match — are legal and
    // simply flow to the insert clauses, so the dup candidates are
    // semi-joined against the live target keys before raising. The
    // check is skipped outright when no clause can claim a matched row.
    // the distinct live target-key projection serves BOTH the
    // cardinality check and the insert anti-join — computed once and
    // cached when both need it, never scanned twice
    val needCardCheck = matched.nonEmpty || notMatchedBySource.nonEmpty
    val targetKeys: Option[DataFrame] =
      if (!needCardCheck && notMatched.isEmpty) None
      else {
        val k = readFilesDv(spark, table, snap, snap.files)
          .select(on.map { case (t, _) => col(s"`$t`") }.toIndexedSeq: _*)
          .distinct()
        Some(if (needCardCheck && notMatched.nonEmpty)
          k.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else k)
      }
    // every exit — including a cardinality-rule violation or a staging
    // failure — releases the cached key projection
    try {
    if (needCardCheck) {
      val dupKeys = srcP.groupBy(sKeys: _*).count()
        .filter(col("count") > 1).drop("count")
      val tKeys = targetKeys.get
      val offending = dupKeys.join(tKeys,
        on.map { case (t, s) => col(s"`__s_$s`") === tKeys(t) }
          .reduce(_ && _), "left_semi")
      require(offending.limit(1).count() == 0L,
        "MERGE source has multiple rows per ON key for a matched " +
          "target row — the update would be nondeterministic (the " +
          "Delta cardinality rule); de-duplicate the source first")
    }
    def condOf(c: Option[Column]): Column =
      c.map(x => coalesce(x, lit(false))).getOrElse(lit(true))
    // first-match-wins fold: when(c1, v1).otherwise(when(c2, v2)...)
    def firstWhen[A](clauses: Seq[A], cond: A => Column, value: A => Column,
        default: Column): Column =
      clauses.foldRight(default)((cl, els) =>
        when(cond(cl), value(cl)).otherwise(els))

    // ----- touched files: rows a matched / NMBS clause could claim.
    // The probe joins the FULL prefixed source (not just its keys) so
    // conditional matched clauses prune too: a file whose matches all
    // fail every clause condition is never rewritten.
    val hit: Seq[String] =
      if (matched.isEmpty && notMatchedBySource.isEmpty) Nil
      else {
        val prov = readFilesDvProv(spark, table, snap, snap.files)
        val joinedProv = prov.join(srcP,
          on.map { case (t, s) => prov(t) === col(s"`__s_$s`") }
            .reduce(_ && _), "left_outer")
        val matchedAny = matched
          .map(c => condOf(c.condition)).reduceOption(_ || _)
        val nmbsAny = notMatchedBySource
          .map(c => condOf(c.condition)).reduceOption(_ || _)
        val affected =
          matchedAny.map(c => col("__m").isNotNull && c)
            .getOrElse(lit(false)) ||
            nmbsAny.map(c => col("__m").isNull && c).getOrElse(lit(false))
        val hitKeys = joinedProv.filter(affected)
          .select(col("__fk")).distinct()
          .collect().map(r => pctDecode(r.getString(0))).toSet
        snap.files.filter(hitKeys)
      }

    // ----- rewrite pass over touched files: one simultaneous select
    val isM = col("__m").isNotNull
    val obs = org.apache.spark.sql.Observation(
      s"graft-mrgf-${java.util.UUID.randomUUID()}")
    val (rewritten, nUpd, nDel) = if (hit.isEmpty)
      ((Nil: Seq[String], Map.empty[String, String],
        Map.empty[String, Map[String, (String, String)]],
        Map.empty[String, Map[String, String]]), 0L, 0L)
    else {
      val touched = readFilesDv(spark, table, snap, hit)
      val joined = touched.join(srcP,
        on.map { case (t, s) => touched(t) === col(s"`__s_$s`") }
          .reduce(_ && _), "left_outer")
      val delM = firstWhen[MergeWhen](matched, c => condOf(c.condition),
        c => lit(c.set.isEmpty), lit(false))
      val delN = firstWhen[MergeWhen](notMatchedBySource,
        c => condOf(c.condition), c => lit(c.set.isEmpty), lit(false))
      val appliedM = firstWhen[MergeWhen](matched,
        c => condOf(c.condition), _ => lit(true), lit(false))
      val appliedN = firstWhen[MergeWhen](notMatchedBySource,
        c => condOf(c.condition), _ => lit(true), lit(false))
      val deleteRow = when(isM, delM).otherwise(delN)
      val observed = joined.observe(obs,
        sum(when(isM && appliedM && !delM, 1L).otherwise(0L)
          + when(!isM && appliedN && !delN, 1L).otherwise(0L))
          .as("updated"),
        sum(when(isM && delM, 1L).otherwise(0L)
          + when(!isM && delN, 1L).otherwise(0L)).as("deleted"),
        sum(when(deleteRow, 0L).otherwise(1L)).as("kept"))
      def valueFor(f: org.apache.spark.sql.types.StructField,
          clauses: Seq[MergeWhen]): Column =
        firstWhen[MergeWhen](clauses, c => condOf(c.condition),
          c => c.set.flatMap(_.get(f.name))
            .map(_.cast(f.dataType)).getOrElse(col(s"`${f.name}`")),
          col(s"`${f.name}`"))
      val out = observed.filter(!deleteRow)
        .select(schema.map { f =>
          when(isM, valueFor(f, matched))
            .otherwise(valueFor(f, notMatchedBySource))
            .cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
      val staged = stageFor(snap, out, table)
      lazy val re = readFilesDv(spark, table, snap, hit).join(srcP,
        on.map { case (t, s) => col(s"`$t`") === col(s"`__s_$s`") }
          .reduce(_ && _), "left_outer")
        .agg(
          coalesce(sum(when(isM && appliedM && !delM, 1L).otherwise(0L)
            + when(!isM && appliedN && !delN, 1L).otherwise(0L)), lit(0L)),
          coalesce(sum(when(isM && delM, 1L).otherwise(0L)
            + when(!isM && delN, 1L).otherwise(0L)), lit(0L)),
          coalesce(sum(when(deleteRow, 0L).otherwise(1L)), lit(0L))).head()
      val m = obs.get
      val upd = observedLong(m, "updated")(re.getLong(0))
      val del = observedLong(m, "deleted")(re.getLong(1))
      val kept = observedLong(m, "kept")(re.getLong(2))
      val fresh =
        if (kept > 0L) staged
        else {
          dropStagedBatches(spark, table, staged._1)
          (Nil: Seq[String], Map.empty[String, String],
            Map.empty[String, Map[String, (String, String)]],
            Map.empty[String, Map[String, String]])
        }
      (fresh, upd, del)
    }

    // ----- insert pass: source rows matching NO live target row, first
    // applicable NOT MATCHED clause builds the row, unclaimed rows drop
    val (insertStaged, nIns, idMeta) = if (notMatched.isEmpty) {
      ((Nil: Seq[String], Map.empty[String, String],
        Map.empty[String, Map[String, (String, String)]],
        Map.empty[String, Map[String, String]]), 0L,
        Map.empty[String, String])
    } else {
      val curKeys = targetKeys.get
      val unmatched = srcP.join(curKeys,
        on.map { case (t, s) => col(s"`__s_$s`") === curKeys(t) }
          .reduce(_ && _), "left_anti")
      val appliedI = firstWhen[MergeInsert](notMatched,
        c => condOf(c.condition), _ => lit(true), lit(false))
      val obsIns = org.apache.spark.sql.Observation(
        s"graft-mrgfi-${java.util.UUID.randomUUID()}")
      val rows = unmatched.filter(appliedI)
        .observe(obsIns, sum(lit(1L)).as("inserted"))
        .select(schema.map { f =>
          firstWhen[MergeInsert](notMatched, c => condOf(c.condition),
            c => c.values.get(f.name).map(_.cast(f.dataType))
              .getOrElse(lit(null).cast(f.dataType)),
            lit(null).cast(f.dataType)).as(f.name)
        }.toIndexedSeq: _*)
      // identity tables: merge-inserted rows get fresh ids like every
      // append-shaped write (the projection above left the column
      // NULL by construction — MERGE may not assign it — so it is
      // dropped pre-assignment to skip the explicit-values guard's
      // extra pass); the new mark rides the same atomic commit
      val rowsPre = snap.meta.get("identityCol")
        .map(rows.drop(_)).getOrElse(rows)
      val (rowsId, idMetaUp) = identityFor(snap, rowsPre)
      val staged = stageFor(snap, rowsId, table)
      val n = observedLong(obsIns.get, "inserted")(
        unmatched.filter(appliedI).count())
      if (n > 0) (staged, n, idMetaUp)
      else {
        dropStagedBatches(spark, table, staged._1)
        ((Nil: Seq[String], Map.empty[String, String],
          Map.empty[String, Map[String, (String, String)]],
          Map.empty[String, Map[String, String]]), 0L,
          Map.empty[String, String])
      }
    }
    if (nUpd == 0 && nDel == 0 && nIns == 0 && hit.isEmpty)
      return (snap.version, 0L, 0L, 0L, 0)
    val keep = snap.files.filterNot(hit.contains)
    val v = commitManifest(spark, table, schema,
      keep ++ rewritten._1 ++ insertStaged._1, snap.version,
      snap.meta ++ idMeta,
      (snap.partitionOf -- hit) ++ rewritten._2 ++ insertStaged._2,
      (snap.statsOf -- hit) ++ rewritten._3 ++ insertStaged._3,
      snap.deleteFiles, Some(snap),
      (snap.extraOf -- hit) ++ rewritten._4 ++ insertStaged._4)
    (v, nUpd, nDel, nIns, hit.size)
    } finally targetKeys.foreach(_.unpersist(blocking = false))
  }

  /** Small-file compaction as a snapshot commit: rewrite the whole file
    * list into ~`targetMB` files; the PREVIOUS snapshot (and its small
    * files) stays readable until expired. Returns (new version, files
    * before, files after).
    */
  /** `clusterBy` RE-CLUSTERS the rewrite
    * (OPTIMIZE ZORDER's role): the surviving rows range-repartition
    * and sort on the key — per partition for partitioned tables — so
    * a mutated table's decayed clustering is restored, per-file
    * min/max stats re-record tight ranges, and [[readWhereRange]] /
    * planned-file pruning work again on every clustered dimension.
    * The key is recorded as `clusterCols` metadata (staging keeps
    * later batches batch-locally sorted on it) and added to the
    * declared stats columns. An EMPTY `clusterBy` re-clusters on the
    * table's declared key when one exists, so `maintain()`'s periodic
    * compaction automatically repairs clustering instead of letting it
    * decay permanently.
    */
  def compact(spark: SparkSession, table: String,
      targetMB: Int = 128, clusterBy: Seq[String] = Nil,
      numFiles: Int = 0): (Long, Int, Int) = {
    val snap0 = loadCurrent(spark, table)
    if (snap0.files.isEmpty) return (snap0.version, 0, 0)
    val cluster =
      if (clusterBy.nonEmpty) clusterBy else declaredClusterCols(snap0)
    cluster.foreach(c => require(snap0.schema.fieldNames.contains(c),
      s"cluster column $c is not a table column " +
        s"(${snap0.schema.fieldNames.mkString(", ")})"))
    // the evolved declarations ride the compaction commit AND drive
    // its own staging/stats passes (stats must cover the cluster key
    // or range pruning on it has nothing to prune with)
    val snap =
      if (cluster.isEmpty) snap0
      else snap0.copy(meta = snap0.meta +
        ("clusterCols" -> cluster.mkString(",")) +
        ("statsCols" -> (declaredStatsCols(snap0) ++
          cluster.filterNot(declaredStatsCols(snap0).contains))
          .mkString(",")))
    val bytes = dataBytesOf(spark, table, snap)
    // explicit numFiles overrides the size-derived count (small tables
    // whose bytes round to one target-size file can still lay out a
    // multi-file clustered range)
    val nOut =
      if (numFiles > 0) numFiles
      else math.max(1L,
        (bytes + targetMB.toLong * 1024 * 1024 - 1) /
          (targetMB.toLong * 1024 * 1024)).toInt
    // DV-applied: compaction MATERIALIZES the deletion vectors (dead
    // rows drop out of the rewrite) and the new manifest clears the
    // vector list — compact doubles as the DV purge
    val df0 = readFilesDv(spark, table, snap, snap.files)
    // partitioned tables compact per partition (stageFor re-labels),
    // bucketed ones per bucket (stageFor re-buckets — the BucketSpec
    // must stay true through maintenance); unpartitioned ones into
    // ~targetMB files
    val (fresh, labels, stats, extras) =
      if (snap.meta.contains("partitionCols") ||
          bucketSpecOf(snap).isDefined) stageFor(snap, df0, table)
      else snap.meta.get("partitionCol") match {
        case Some(_) => stageFor(snap, df0, table)
        case None =>
          // clustered: a GLOBAL re-sort (the one shuffle this
          // maintenance verb is for). One dimension → range sort (file
          // k holds keys strictly below file k+1 — the tightest
          // min/max layout one dimension allows). SEVERAL numeric
          // dimensions → Z-ORDER (bit-interleaved cells): every file
          // covers a small hyper-rectangle, so a narrow predicate on
          // ANY clustered dimension prunes — lexicographic multi-key
          // sort would cluster only the leading column. Non-numeric
          // multi-column keys fall back to lexicographic (z-cells need
          // a numeric scale).
          val numericZ = cluster.size > 1 && cluster.forall { c =>
            val dt = snap.schema(c).dataType
            dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
              dt == org.apache.spark.sql.types.TimestampType ||
              dt == org.apache.spark.sql.types.DateType
          }
          val arranged =
            if (cluster.isEmpty) df0.repartition(nOut)
            else if (numericZ) {
              require(!snap.schema.fieldNames.contains("__z"),
                "z-order compaction reserves the column name __z")
              graft.operators.ScalePatterns.withZValue(df0, cluster)
                .repartitionByRange(nOut, col("__z"))
                .sortWithinPartitions(col("__z"))
                .drop("__z")
            } else df0
              .repartitionByRange(nOut, cluster.map(col): _*)
              .sortWithinPartitions(cluster.map(col): _*)
          val files = stageBatch(arranged, table)
          // re-index like every other mutation: compaction must not
          // silently degrade bloom point-lookup coverage
          writeBloomSidecars(spark, table, files, declaredBloomCols(snap),
            snap.schema)
          val (st, ex) = computeStats(spark, table, files,
            declaredStatsCols(snap), snap.schema)
          (files, Map.empty[String, String], st, ex)
      }
    // the rewrite lands every row under the CURRENT column names, so
    // compaction clears the column mapping (and un-retires former /
    // dropped names: no current-snapshot file carries them anymore) —
    // the raw FileIndex scan becomes exact again, same as the DV purge
    val v = commitManifest(spark, table, snap.schema, fresh,
      snap.version, snap.meta - "colmap" - "droppedCols", labels, stats,
      Nil, Some(snap), extras)
    (v, snap.files.size, fresh.size)
  }

  /** PARTITION-SCOPED compaction (Delta's `OPTIMIZE t WHERE part = v`):
    * rewrite ONLY the named partitions' files — at 100 TB routine
    * maintenance touches the hot partitions, never the table. The
    * untouched partitions' files carry over VERBATIM (path identity
    * suite-asserted), the rewritten ones restage through the shared
    * layout-aware path (labels, declared cluster sort, stats, blooms),
    * and ONE atomic commit publishes keep ∪ fresh. Initial-default
    * markers materialize on the rewritten files and remain on the
    * untouched ones — exactness is per-file, so a partial rewrite is
    * always safe. Refused while deletion vectors are outstanding: a
    * vector file can span partitions, so a partial rewrite could
    * neither keep nor drop it exactly — purge with compact()/maintain()
    * first (both are DV-materializing), then scope.
    */
  /** The live partition labels (composite, exactly as the manifest
    * stores them) that COULD hold rows matching `column <op> value` —
    * the transform-aware resolution layer for partition-scoped
    * maintenance (`OPTIMIZE … WHERE ts >= …` on a `days(ts)` table
    * must rewrite only the straddling days without the operator
    * hand-rendering labels). RAW-column predicates map through the
    * declared transforms exactly like scan pruning
    * ([[SnapshotScan]]'s boundsAdmit): equality via `applyLiteral`
    * (a bucket equality scopes to ONE bucket), ranges in the label
    * domain for order-preserving transforms, NO verdict = kept — a
    * superset selection only costs extra compaction IO, a lost label
    * would skip data the user asked to rewrite. Identity positions
    * compare against the literal's cast-to-string rendering (the
    * derivation that produced the label); null-token labels never
    * match a comparison, like SQL.
    *
    * `op`: one of `=`, `in`, `>=`, `<=`, `>`, `<` (strict bounds widen
    * to inclusive in the label domain — superset, safe).
    */
  private[graft] def partitionLabelsWhere(spark: SparkSession,
      table: String, column: String, op: String,
      rawValues: Seq[String]): Set[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types.StringType
    val snap = loadCurrent(spark, table)
    require(partitionColsOf(snap).nonEmpty,
      s"$table is not partitioned — use compact()")
    val transforms = partitionTransformsOf(snap)
    val positions = transforms.zipWithIndex
      .filter(_._1.source.equalsIgnoreCase(column)).map(_._2)
    require(positions.nonEmpty,
      s"$column does not source any partition transform of $table " +
        s"(${transforms.map(_.spec).mkString(", ")})")
    require(Seq("=", "in", ">=", "<=", ">", "<").contains(op),
      s"unsupported partition predicate operator $op")
    require(rawValues.nonEmpty, "name at least one value")
    require(op == "=" || op == "in" || rawValues.size == 1,
      s"range operator $op takes exactly one value, " +
        s"got ${rawValues.size}")
    val dt = snap.schema(column).dataType
    // PARSE the user's literal in the SESSION zone (their local-time
    // intent), but RENDER the comparison value in the zone the labels
    // were derived in (the pinned staging zone) — rendering in a
    // session zone that drifted from the writer's would silently
    // exclude matching partitions, breaking the superset-only contract
    val tzParse = Some(spark.sessionState.conf.sessionLocalTimeZone)
    val tzRender = Some(stagingTzOf(spark, snap))
    val lits = rawValues.map { s =>
      val v = Cast(Literal(org.apache.spark.unsafe.types.UTF8String
        .fromString(s), StringType), dt, tzParse).eval()
      require(v != null,
        s"cannot parse '$s' as ${dt.simpleString} for $column")
      Literal(v, dt)
    }
    def rendered(l: Literal): String =
      Cast(l, StringType, tzRender).eval().toString
    val numericCol = dt.isInstanceOf[org.apache.spark.sql.types
      .NumericType]
    def identityLe(a: String, b: String): Boolean =
      if (numericCol)
        scala.util.Try(BigDecimal(a) <= BigDecimal(b)).getOrElse(true)
      else codePointLe(a, b) // ISO time renderings order correctly
    def labelLe(t: PartitionTransform)(a: String, b: String): Boolean =
      if (t.numericLabel)
        scala.util.Try(BigDecimal(a) <= BigDecimal(b)).getOrElse(true)
      else codePointLe(a, b)
    val nullToken = "__HIVE_DEFAULT_PARTITION__"
    def admits(t: PartitionTransform, label: String): Boolean = {
      if (label == nullToken) return false
      def eqOne(l: Literal): Boolean =
        if (t.isIdentity) label == rendered(l)
        else t.applyLiteral(l) match {
          case Some(tl) => label == tl
          case None => true // no mapping -> no verdict -> keep
        }
      op match {
        case "=" | "in" => lits.exists(eqOne)
        case _ =>
          val l = lits.head
          if (t.isIdentity) {
            val r = rendered(l)
            if (op == ">=" || op == ">") identityLe(r, label)
            else identityLe(label, r)
          } else if (!t.monotonic) true // bucket range: no verdict
          else t.applyLiteral(l) match {
            case Some(tl) =>
              if (op == ">=" || op == ">") labelLe(t)(tl, label)
              else labelLe(t)(label, tl)
            case None => true
          }
      }
    }
    snap.partitionOf.values.toSet.filter { composite =>
      val vals =
        if (snap.meta.contains("partitionCols"))
          composite.split(",", -1).map(dec).toSeq
        else Seq(composite)
      positions.forall(pi =>
        vals.lift(pi).forall(v => admits(transforms(pi), v)))
    }
  }

  def compactPartitions(spark: SparkSession, table: String,
      values: Set[String]): (Long, Int, Int) = {
    val snap = loadCurrent(spark, table)
    require(partitionColsOf(snap).nonEmpty,
      s"$table is not partitioned — use compact()")
    require(values.nonEmpty, "name at least one partition value")
    require(snap.deleteFiles.isEmpty,
      s"$table carries deletion vectors — compact()/maintain() purges " +
        "them table-wide first; a partition-scoped rewrite cannot " +
        "split a vector file")
    // single-column tables match the bare value; multi-column tables
    // match the COMPOSITE label (the readWhere(Map) discipline applies
    // — callers name full tuples via the composite encoding)
    val hit = snap.files.filter(f =>
      snap.partitionOf.get(f).exists(values)).toSet
    if (hit.isEmpty) return (snap.version, 0, 0)
    val keep = snap.files.filterNot(hit)
    val df = readFilesDv(spark, table, snap, snap.files.filter(hit))
    val (fresh, labels, stats, extras) = stageFor(snap, df, table)
    val v = commitManifest(spark, table, snap.schema, keep ++ fresh,
      snap.version, snap.meta,
      (snap.partitionOf -- hit) ++ labels,
      (snap.statsOf -- hit) ++ stats, Nil, Some(snap),
      (snap.extraOf -- hit) ++ extras)
    (v, hit.size, fresh.size)
  }

  /** Commit one streaming micro-batch as an append, IDEMPOTENTLY: the
    * batch id is recorded in the manifest metadata by the SAME atomic
    * rename that publishes the data files, so a replayed batch (after a
    * sink crash between data write and checkpoint advance — the classic
    * at-least-once window) is detected and skipped instead of
    * double-appending. This is the exactly-once streaming-sink recipe
    * every transactional table format uses (Delta's txn action); the
    * plain foreachBatch parquet sink (StreamOps.upsertSink) cannot
    * express it because nothing ties "data visible" to "batch id
    * recorded". Returns true if the batch committed, false if it was a
    * replay of an already-committed id.
    */
  def commitStreamBatch(spark: SparkSession, table: String,
      batch: DataFrame, batchId: Long,
      queryKey: String = "stream",
      mergeSchema: Boolean = false): Boolean = {
    val snap0 = loadCurrent(spark, table)
    val metaKey = s"lastBatchId.$queryKey"
    if (snap0.meta.get(metaKey).exists(_.toLong >= batchId)) false
    else {
      // opt-in write-time evolution, same contract as [[append]]: new
      // nullable source columns ride the SAME atomic commit as the
      // batch (and its id) — a drifting stream schema evolves the
      // table exactly once even across replays
      val snap =
        if (mergeSchema) evolvedFor(snap0, batch.schema, "stream batch")
        else snap0
      val batch0 =
        if (mergeSchema) GraftDml.alignByName(batch,
          writeSchemaFor(snap, batch), s"stream batch $batchId",
          allowSubset = false)
        else batch
      // identity tables assign ids here like every append-shaped verb;
      // the mark rides the SAME manifest as the batch id, so a replay
      // skipped by the id check also never re-burns ids
      val (rows, metaUp) =
        if (snap.meta.contains("identityCol")) identityFor(snap, batch0)
        else if (mergeSchema) (batch0, Map.empty[String, String])
        else (batch0.select(
          snap.schema.fieldNames.map(col).toIndexedSeq: _*),
          Map.empty[String, String])
      val (files, labels, stats, extras) = stageFor(snap, rows, table)
      commitManifest(spark, table, snap.schema, snap.files ++ files,
        snap.version,
        snap.meta ++ metaUp + (metaKey -> batchId.toString),
        snap.partitionOf ++ labels, snap.statsOf ++ stats,
        snap.deleteFiles, Some(snap0), snap.extraOf ++ extras)
      true
    }
  }

  /** [[commitStreamBatch]]'s Complete-mode sibling: the micro-batch
    * REPLACES the table contents (one atomic commit, the overwrite
    * semantics a complete-output aggregate stream needs), with the
    * same batch-id-in-manifest idempotency — a replayed batch after a
    * crash between data write and checkpoint advance is skipped.
    * Clears colmap/droppedCols like [[replaceContents]] (every row is
    * freshly staged under current names).
    */
  def replaceStreamBatch(spark: SparkSession, table: String,
      batch: DataFrame, batchId: Long,
      queryKey: String = "stream"): Boolean = {
    val snap = loadCurrent(spark, table)
    val metaKey = s"lastBatchId.$queryKey"
    if (snap.meta.get(metaKey).exists(_.toLong >= batchId)) false
    else {
      val (rows, metaUp) =
        if (snap.meta.contains("identityCol")) identityFor(snap, batch)
        else (batch.select(
          snap.schema.fieldNames.map(col).toIndexedSeq: _*), Map.empty)
      val (files, labels, stats, extras) = stageFor(snap, rows, table)
      commitManifest(spark, table, snap.schema, files, snap.version,
        snap.meta - "colmap" - "droppedCols" ++ metaUp +
          (metaKey -> batchId.toString),
        labels, stats, Nil, Some(snap), extras)
      true
    }
  }

  /** The streaming append sink on the snapshot layer: exactly-once via
    * [[commitStreamBatch]]'s batch-id-in-manifest protocol. The table
    * must already exist (create it from an empty or seed frame).
    */
  def appendSink(stream: DataFrame, table: String, checkpointDir: String,
      queryKey: String = "stream")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    graft.streaming.CheckpointTuning.forLocalCheckpoint(
      stream.sparkSession, checkpointDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitStreamBatch(batch.sparkSession, table, batch, id, queryKey)
        ()
      }
      .start()
  }

  /** The STREAMING change-feed source: tail new snapshot versions and
    * hand each advance's [[changesBetween]] delta frame to `process` —
    * the Delta-CDF-streaming shape, so a downstream incremental
    * consumer no longer polls versions itself. Driven by a rate-source
    * micro-batch clock (the engine's watermark/offset machinery) whose
    * rows are ignored; each tick resolves the current version ONCE and
    * emits one churn-sized delta for the whole advance.
    *
    * Delivery is at-least-once across RESTARTS (the in-memory cursor
    * restarts from `fromVersion`); exactly-once EFFECT comes from the
    * consumer applying idempotently — record the delta's `toVersion`
    * high-water mark transactionally with the output, the same
    * batch-id-in-manifest discipline as [[commitStreamBatch]] (a
    * snapshot-table consumer gets this by committing
    * `meta("cdcUpTo") = toVersion` with its output and skipping deltas
    * at-or-below the mark; StreamingSuite's incremental-view test is
    * the reference implementation).
    *
    * `process(delta, fromVersion, toVersion)`: `delta` has the table
    * schema plus `change_type` ('insert' | 'delete'), netted
    * endpoint-to-endpoint.
    */
  def changesStream(spark: SparkSession, table: String, fromVersion: Long,
      checkpointDir: String, intervalMs: Long = 250L)(
      process: (DataFrame, Long, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val cursor = new java.util.concurrent.atomic.AtomicLong(fromVersion)
    graft.streaming.CheckpointTuning.forLocalCheckpoint(spark, checkpointDir)
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(intervalMs))
      .foreachBatch { (_: DataFrame, _: Long) =>
        val from = cursor.get()
        val cur = currentVersion(spark, table)
        if (cur > from) {
          process(changesBetween(spark, table, from, cur), from, cur)
          cursor.set(cur)
        }
        ()
      }
      .start()
  }

  /** Garbage collection: drop all manifests except the newest
    * `keepLast`, then delete every data file no surviving manifest
    * references (and any emptied batch dirs). Returns (manifests
    * removed, data files removed). Must not run concurrently with a
    * writer mid-commit (staged-but-uncommitted files look unreferenced)
    * — the same discipline real table formats schedule GC under.
    */
  def expireSnapshots(spark: SparkSession, table: String,
      keepLast: Int = 2): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    expireSplit(spark, table, versions =>
      versions.splitAt(math.max(0, versions.size - keepLast)))
  }

  /** AGE-based expiry (Iceberg `expire_snapshots(older_than)` / the
    * `VACUUM … RETAIN` clock): expires the CONTIGUOUS PREFIX of
    * versions whose manifest mtime is older than `cutoffMs` — the
    * current version is always kept regardless of age, and the prefix
    * rule keeps the expired set below the retention floor (a gap-
    * expired newer version would read as a FileNotFound instead of
    * the floor's clear expired-version error).
    */
  def expireSnapshotsOlderThan(spark: SparkSession, table: String,
      cutoffMs: Long): (Int, Int) =
    expireSplit(spark, table, { versions =>
      val f = fs(spark, table)
      val aged = versions.dropRight(1).takeWhile(v =>
        f.getFileStatus(manifestPath(table, v))
          .getModificationTime < cutoffMs)
      (aged, versions.drop(aged.size))
    })

  private def expireSplit(spark: SparkSession, table: String,
      split: Vector[Long] => (Vector[Long], Vector[Long]))
      : (Int, Int) = {
    val f = fs(spark, table)
    val dir = manifestDir(table)
    if (!f.exists(dir)) return (0, 0)
    val versions = f.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong
      }.toVector.sorted
    // TAGS pin history: nothing at or after the OLDEST tagged version
    // expires — the clamp keeps the expired set a contiguous PREFIX,
    // so the retention-floor readability rule stays intact (a
    // mid-history hole would read as FileNotFound instead of the
    // floor's clear error). A forgotten tag therefore pins storage;
    // dropTag releases it — the Iceberg refs-retention caveat.
    val (expire, keep) = {
      val (e0, _) = split(versions)
      val e = tags(spark, table).values.minOption match {
        case Some(oldestPin) => e0.takeWhile(_ < oldestPin)
        case None => e0
      }
      (e, versions.drop(e.size))
    }
    // staged WAP candidates keep their files live until published or
    // abandoned — expiry must not pull data out from under an audit
    val stagedLive = f.listStatus(dir).iterator.map(_.getPath)
      .filter(p => p.getName.startsWith("staged-") &&
        p.getName.endsWith(".manifest"))
      .flatMap { p =>
        val m = readManifestAt(spark, table, p, -1L)
        m.files ++ m.deleteFiles
      }.toVector
    val live =
      (keep.flatMap { v =>
        val m = readManifest(spark, table, v)
        m.files ++ m.deleteFiles
      } ++ stagedLive).toSet
    // a kept DELTA manifest resolves through its chain — retain every
    // manifest a kept version's chain passes through (their own data
    // files still GC below: chain manifests contribute reachability of
    // the KEPT file lists only, never liveness of their own)
    val chainNeeded: Set[Long] = keep.flatMap { v =>
      val acc = scala.collection.mutable.ListBuffer.empty[Long]
      // header parse: only the base pointer is needed — resolving a
      // grouped anchor's file entries here would be O(table files)
      var cur = parseManifestHeader(spark, table,
        manifestPath(table, v), v).base
      while (cur.isDefined) {
        acc += cur.get
        cur = parseManifestHeader(spark, table,
          manifestPath(table, cur.get), cur.get).base
      }
      acc
    }.toSet
    // files referenced by the EXPIRED versions: committed history
    // being GC'd — deletable at any age. Read before their manifests
    // go. An unreferenced parquet is a different animal: it may be a
    // concurrent writer's staged batch between its stage write and
    // manifest CAS, so it only goes once it has aged past the orphan
    // grace (the vacuumOrphans clock) — deleting it young would
    // corrupt that writer's commit.
    // readManifestAt, NOT readManifest: an earlier expiry may have
    // left chain-retained manifests BELOW the floor in the version
    // list — the floor guard would throw on re-reading them here
    val expiredRefs = expire.flatMap { v =>
      val m = readManifestAt(spark, table, manifestPath(table, v), v)
      m.files ++ m.deleteFiles
    }.toSet
    val orphanGraceCutoff = System.currentTimeMillis() - 3600000L
    val dropped = expire.filterNot(chainNeeded)
    dropped.foreach(v => f.delete(manifestPath(table, v), false))
    val dataDir = new Path(table, "data")
    var removed = 0
    if (f.exists(dataDir)) {
      val tableUri = f.makeQualified(new Path(table)).toString
      f.listStatus(dataDir).filter(_.isDirectory).foreach { b =>
        // RECURSIVE listing: partitioned batches nest their parquet
        // under __part=* subdirectories — a direct-children-only sweep
        // would miss them AND then judge the batch dir empty-of-parquet
        // and recursively delete LIVE nested data
        val it = f.listFiles(b.getPath, true)
        var liveParquetLeft = false
        while (it.hasNext) {
          val s = it.next()
          // Hadoop Path.toString is the UNESCAPED path (unlike Spark's
          // _metadata.file_path, which is the encoded URI), so this
          // strip already yields the raw manifest-relative name — no
          // decode, which would corrupt Hive-escaped dir names
          val abs = s.getPath.toString
          val rel = abs.stripPrefix(tableUri).stripPrefix("/")
          if (s.getPath.getName.endsWith(".parquet")) {
            if (live.contains(rel)) liveParquetLeft = true
            else if (expiredRefs.contains(rel) ||
                s.getModificationTime < orphanGraceCutoff) {
              f.delete(s.getPath, false); removed += 1
            } else liveParquetLeft = true // in-grace unreferenced: a
            // writer mid-commit — vacuumOrphans reaps it if it ages out
          }
        }
        if (!liveParquetLeft) f.delete(b.getPath, true)
      }
    }
    // group files referenced only by the dropped anchors are metadata
    // orphans now — swept under the same grace rule as data orphans
    sweepOrphanGroups(spark, table, 3600000L)
    // record the READ floor: chain-retained manifests BELOW the oldest
    // kept version still exist (kept deltas resolve through them) but
    // their own data files are gone — without the floor, history()
    // would advertise them and a time-travel read would fail mid-scan
    // with FileNotFoundException instead of fast with a clear error
    keep.headOption.foreach { floor =>
      // temp + rename, never truncate-in-place: a racing readManifest
      // must see either the old floor or the new one, never a partial
      // file (which would throw out of every read until the next
      // expiry)
      val dst = retentionFloorPath(table)
      val tmp = new Path(dst.getParent,
        dst.getName + ".tmp-" + java.util.UUID.randomUUID().toString)
      val out = f.create(tmp, true)
      try out.write(floor.toString.getBytes("UTF-8")) finally out.close()
      if (!f.rename(tmp, dst)) { // HDFS semantics: no overwrite
        f.delete(dst, false)
        if (!f.rename(tmp, dst))
          throw new java.io.IOException(s"cannot publish $dst")
      }
    }
    (dropped.size, removed)
  }

  /** Every group file some surviving manifest still references —
    * anchors are scanned by their `grp:` lines alone (no group file is
    * opened), so the sweep's metadata cost is O(manifests), not
    * O(table files).
    */
  private def referencedGroups(spark: SparkSession,
      table: String): Set[String] = {
    val f = fs(spark, table)
    val dir = manifestDir(table)
    if (!f.exists(dir)) return Set.empty
    f.listStatus(dir).iterator.map(_.getPath)
      .filter(_.getName.endsWith(".manifest"))
      .flatMap(p => readLinesAt(spark, table, p).iterator
        .filter(_.startsWith("grp:"))
        .map(_.stripPrefix("grp:").split('\t')(0)))
      .toSet
  }

  /** Delete partition-group files no surviving manifest references —
    * aged past `graceMs` only: a racing committer writes its groups
    * BEFORE the anchor's commit CAS, so a young unreferenced group may
    * be a commit in flight (the same grace rule staged data files
    * follow).
    */
  private def sweepOrphanGroups(spark: SparkSession, table: String,
      graceMs: Long): Int = {
    val f = fs(spark, table)
    val gDir = new Path(manifestDir(table), "groups")
    if (!f.exists(gDir)) return 0
    val refed = referencedGroups(spark, table)
    val cutoff = System.currentTimeMillis() - graceMs
    var removed = 0
    f.listStatus(gDir).foreach { st =>
      val rel = s"groups/${st.getPath.getName}"
      if (!refed.contains(rel) && st.getModificationTime < cutoff) {
        f.delete(st.getPath, false)
        removed += 1
      }
    }
    removed
  }

  private def retentionFloorPath(table: String): Path =
    new Path(manifestDir(table), "retention.floor")

  /** The oldest version whose DATA is guaranteed retained (1 when no
    * expiry has run). Versions below it may still have chain-retained
    * manifests but are not readable.
    */
  def retentionFloor(spark: SparkSession, table: String): Long = {
    val p = retentionFloorPath(table)
    val f = fs(spark, table)
    try {
      val in = f.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    } catch {
      case _: java.io.IOException => 1L
      // a floor that cannot be parsed (legacy partial write) reads as
      // "no expiry recorded" rather than poisoning every readManifest
      case _: NumberFormatException => 1L
    }
  }

  /** Change data feed between two committed versions, derived from the
    * MANIFEST DIFF alone: data files are immutable, so files listed by
    * both versions cannot contribute changes and only the files added
    * or removed between the two manifests are read — change detection
    * costs IO proportional to the churn, never to the table (at 100 TB
    * a one-file update feeds a two-file diff, not a table scan).
    *
    * Mutations rewrite whole files, so the raw file diff over-reports
    * rows merely carried through a rewrite; the feed nets them out with
    * multiset difference, leaving exactly the logical changes:
    *
    *   inserts = rows(to-only files) EXCEPT ALL rows(from-only files)
    *   deletes = rows(from-only files) EXCEPT ALL rows(to-only files)
    *
    * An UPDATE therefore surfaces as its pre-image `delete` plus
    * post-image `insert` row pair — the convention CDC consumers expect
    * from a table without a change-tracking column. Files added and
    * removed BETWEEN the endpoints (transient churn) appear in neither
    * manifest's diff, so the feed is automatically endpoint-to-endpoint
    * net, like Delta's CDF between versions. Additive schema evolution
    * between the versions is handled by reading each side with its own
    * manifest schema and aligning by name (columns added since
    * `fromVersion` read as NULL on the old side).
    *
    * Output: the `toVersion` schema plus a `change_type` column
    * ('insert' | 'delete').
    */
  def changesBetween(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"changesBetween: fromVersion $fromVersion > toVersion $toVersion")
    changesBetweenSnapshots(spark, table,
      readManifest(spark, table, fromVersion),
      readManifest(spark, table, toVersion))
  }

  /** The change feed between two BRANCH head sequences — the branch
    * arm of [[changesBetween]], diffing staged-branch manifests so a
    * continuous-WAP audit stream can tail the branch it is writing.
    * A sequence consumed by a `retainBranch` re-seed (which keeps only
    * the prior head) fails LOUDLY — a lagging consumer across a
    * re-seed has no reconstructable pre-image.
    */
  def branchChangesBetween(spark: SparkSession,
      table: String, name: String, fromSeq: Int, toSeq: Int): DataFrame = {
    require(fromSeq <= toSeq,
      s"branchChangesBetween: fromSeq $fromSeq > toSeq $toSeq")
    changesBetweenSnapshots(spark, table,
      branchSeqSnapshot(spark, table, name, fromSeq),
      branchSeqSnapshot(spark, table, name, toSeq))
  }

  /** One branch-head sequence's snapshot; a missing manifest (dropped
    * branch, or a sequence a re-seed consumed) fails loudly.
    */
  /** The live head sequence of a branch (None = no such branch) —
    * the branch CDF source's offset domain.
    */
  def branchHeadSeqOf(spark: SparkSession, table: String,
      name: String): Option[Int] = branchHeadSeq(spark, table, name)

  /** The branch content AT a specific head sequence, DVs applied —
    * the branch CDF source's initial-batch read.
    */
  def readBranchAt(spark: SparkSession, table: String, name: String,
      seq: Int): DataFrame = {
    val snap = branchSeqSnapshot(spark, table, name, seq)
    readFilesDv(spark, table, snap, snap.files)
  }

  private[graft] def branchSeqSnapshot(spark: SparkSession,
      table: String, name: String, seq: Int): Snapshot = {
    val p = branchManifestPath(table, name, seq)
    require(fs(spark, table).exists(p),
      s"branch $name on $table has no staged sequence $seq — the " +
        "branch was dropped or re-seeded past this stream's offset; " +
        "restart the stream from a fresh checkpoint")
    readManifestAt(spark, table, p, -1L)
  }

  private def changesBetweenSnapshots(spark: SparkSession,
      table: String, from: Snapshot, to: Snapshot): DataFrame = {
    val fromSet = from.files.toSet
    val toSet = to.files.toSet
    val removed = from.files.filterNot(toSet)
    val added = to.files.filterNot(fromSet)
    // a DELETION VECTOR added (or dropped, via restore) between the
    // endpoints changes rows of files present in BOTH manifests without
    // touching the file diff — those files join the diff set, read
    // under each side's own DV state, and their unchanged rows cancel
    // in the EXCEPT ALL like any rewrite carry-through. The probe reads
    // only the CHANGED delete files (churn-sized metadata IO).
    val dvChangedFiles =
      ((to.deleteFiles.toSet -- from.deleteFiles) ++
        (from.deleteFiles.toSet -- to.deleteFiles)).toSeq.sorted
    val dvTargets: Seq[String] =
      if (dvChangedFiles.isEmpty) Nil
      else {
        // stored DV file_keys live in the encoded __fk space; decode
        // before matching the raw manifest paths
        val keys = spark.read.schema(dvFileSchema)
          .parquet(dvChangedFiles.map(d => s"$table/$d"): _*)
          .select(col("file_key")).distinct()
          .collect().map(r => pctDecode(r.getString(0))).toSet
        from.files.filter(f => toSet(f) && keys(f))
      }
    val outCols = to.schema.fieldNames
    val oldHas = from.schema.fieldNames.toSet
    // COLUMN-MAPPING bridge across the endpoints: a column renamed
    // between `from` and `to` exists in the old snapshot under a
    // FORMER name (the `to` manifest's colmap records the lineage).
    // Matching by current name alone would null-fill the old side —
    // delete events would lose their pre-images and unchanged rows in
    // rewritten files would stop cancelling in the EXCEPT ALL,
    // emitting spurious insert+delete pairs. NULL-fill only when no
    // lineage name exists in the old schema (a genuinely added column,
    // also widened to the new type below for the union).
    val lineageOf = colMapOf(to)
    def oldNameOf(c: String): Option[String] =
      (c +: lineageOf.getOrElse(c, Nil)).find(oldHas)
    val oldRows = readFilesDv(spark, table, from, removed ++ dvTargets)
      .select(outCols.map(c => oldNameOf(c) match {
        case Some(o) => col(s"`$o`").cast(to.schema(c).dataType).as(c)
        case None => lit(null).cast(to.schema(c).dataType).as(c)
      }).toIndexedSeq: _*)
    val newRows = readFilesDv(spark, table, to, added ++ dvTargets)
      .select(outCols.map(col).toIndexedSeq: _*)
    // ONE union-aggregate nets BOTH directions. Two exceptAll calls
    // would each expand to Spark's union+count rewrite — every side
    // scanned and shuffled twice for the same multiset difference
    // (measured: the netting dominates MV-refresh and CDF-lifecycle
    // CPU). Per-row multiplicity |sum(side)| replicates through an
    // exploded sequence: identical multiset semantics (a row with a
    // copies in `to` and b in `from` emits |a-b| rows of the sign's
    // change_type), with NULL and NaN/-0.0 keys grouping exactly as
    // exceptAll groups them. The sequence length is the net DUPLICATE
    // count of one identical row within the churn files — bounded by
    // the churn, and degenerate (million-fold duplicate single rows)
    // only where exceptAll's own aggregate state would degenerate too.
    val side = "__graft_cdc_side"
    val net = "__graft_cdc_net"
    val rep = "__graft_cdc_rep"
    val keyCols = outCols.map(c => col(s"`$c`")).toIndexedSeq
    val counted = newRows.withColumn(side, lit(1L))
      .unionAll(oldRows.withColumn(side, lit(-1L)))
      .groupBy(keyCols: _*)
      .agg(sum(col(side)).as(net))
      .filter(col(net) =!= 0L)
    counted.select(keyCols :+
      when(col(net) > 0, lit("insert")).otherwise(lit("delete"))
        .as("change_type") :+
      explode(sequence(lit(1L), abs(col(net)))).as(rep): _*)
      .drop(rep)
  }

  /** Roll the table back to `version` as a NEW commit, never by erasing
    * history: the restore manifest re-lists the old snapshot's files
    * verbatim, so the commit is METADATA-ONLY — zero data files are
    * read, copied, or rewritten regardless of table size, and the
    * rolled-back snapshots stay readable for forensics until expired.
    * Fails fast if any restored file was already garbage-collected by
    * [[expireSnapshots]]. Stream high-water marks (`lastBatchId.*`) are
    * kept from the CURRENT snapshot, not the restored one — rolling
    * data back must not re-open the exactly-once window and let an old
    * micro-batch double-commit. Returns the new version.
    */
  def restore(spark: SparkSession, table: String, version: Long): Long = {
    val cur = loadCurrent(spark, table)
    val old = readManifest(spark, table, version)
    val f = fs(spark, table)
    old.files.foreach(r => require(f.exists(new Path(table, r)),
      s"cannot restore v$version: data file $r was expired"))
    val streamMarks = cur.meta.filter(_._1.startsWith("lastBatchId."))
    // the identity mark only RATCHETS (the AUTOINCREMENT rule):
    // restoring an old snapshot must not re-issue ids that versions
    // after it already burned — an append after restore would
    // otherwise collide with rows still readable via time travel
    val idMark = (old.meta.get("identityHwm"), cur.meta.get("identityHwm"))
      match {
        case (Some(o), Some(c)) => Map("identityHwm" ->
          math.max(o.toLong, c.toLong).toString)
        case _ => Map.empty[String, String]
      }
    old.deleteFiles.foreach(r => require(f.exists(new Path(table, r)),
      s"cannot restore v$version: delete file $r was expired"))
    // deliberately a FULL manifest (base = None): restore re-lists the
    // old snapshot verbatim and re-anchors any delta chain — the verb
    // is rare and the verbatim list is its contract
    commitManifest(spark, table, old.schema, old.files, cur.version,
      old.meta ++ streamMarks ++ idMark +
        ("restoredFrom" -> version.toString),
      old.partitionOf, old.statsOf, old.deleteFiles, None, old.extraOf)
  }

  private def stagedManifestPath(table: String, token: String) =
    new Path(manifestDir(table), s"staged-$token.manifest")

  /** WRITE-AUDIT-PUBLISH, step 1 (write): stage `df` as a CANDIDATE
    * append — data files written, candidate manifest written to
    * `_manifests/staged-<token>.manifest` — but INVISIBLE to every
    * reader: version resolution only considers `v<N>.manifest`, so the
    * table serves the old snapshot until (and unless) the candidate is
    * published. This is the audit-before-live pattern every production
    * ingestion pipeline needs (Iceberg's WAP / Nessie branches): the
    * quality gate reads the EXACT bytes that would go live, not a copy.
    * The candidate records its base version and re-validates it at
    * publish time. Returns the audit token.
    */
  def stageAppend(spark: SparkSession, table: String,
      df: DataFrame): String = {
    val snap = loadCurrent(spark, table)
    // identity tables assign ids AT STAGE TIME — the audited candidate
    // is the exact bytes that go live, ids included, and the baked
    // high-water mark stays correct because publish enforces the
    // frozen base (any interleaving commit fails the publish and the
    // caller re-stages on the new base, drawing fresh ids)
    val (rows, metaUp) = identityFor(snap, df)
    val (files, labels, stats, extras) = stageFor(snap, rows, table)
    val token = java.util.UUID.randomUUID().toString
    val f = fs(spark, table)
    val p = stagedManifestPath(table, token)
    val out = f.create(p, false)
    try out.write(renderManifest(snap.schema, snap.files ++ files,
      snap.meta ++ metaUp + ("wapBase" -> snap.version.toString),
      snap.partitionOf ++ labels, snap.statsOf ++ stats,
      snap.deleteFiles, snap.extraOf ++ extras))
    finally out.close()
    token
  }

  /** WAP step 2 (audit): the candidate snapshot as a DataFrame — the
    * exact file set that would go live, base rows included.
    */
  def readStaged(spark: SparkSession, table: String,
      token: String): DataFrame = {
    val snap = readManifestAt(spark, table,
      stagedManifestPath(table, token), -1L)
    readFilesDv(spark, table, snap, snap.files)
  }

  /** WAP step 3 (publish): promote the audited candidate to the next
    * version. METADATA-ONLY — the data files were written at stage time
    * and the audit read exactly them, so publishing moves no bytes; it
    * re-renders the manifest without the WAP marker and commits through
    * the same optimistic rename as every other commit. Fails if any
    * commit landed after the candidate's base version (the candidate
    * would silently drop that commit's changes — rebase by re-staging).
    */
  def publishStaged(spark: SparkSession, table: String,
      token: String): Long = {
    val p = stagedManifestPath(table, token)
    val snap = readManifestAt(spark, table, p, -1L)
    val base = snap.meta.getOrElse("wapBase",
      throw new IllegalStateException(s"$p carries no wapBase")).toLong
    val cur = currentVersion(spark, table)
    // deliberately NOT CommitConflictException: the staged manifest's
    // base is frozen, so retrying the publish can never succeed —
    // withCommitRetry must not burn its attempts on it; the caller
    // re-stages on the new base instead
    if (cur != base)
      throw new IllegalStateException(
        s"publish conflict at $table: candidate staged on v$base but " +
          s"current is v$cur; re-stage on the new base")
    val v = commitManifest(spark, table, snap.schema, snap.files, base,
      snap.meta - "wapBase", snap.partitionOf, snap.statsOf,
      snap.deleteFiles, Some(readManifest(spark, table, base)),
      snap.extraOf)
    fs(spark, table).delete(p, false)
    v
  }

  /** Abandon an unpublished candidate: drop its manifest (the audit
    * verdict was no). Its data files become ordinary crash debris for
    * [[vacuumOrphans]] — nothing was ever visible, nothing to undo.
    */
  def abandonStaged(spark: SparkSession, table: String,
      token: String): Unit = {
    fs(spark, table).delete(stagedManifestPath(table, token), false)
    ()
  }

  // ---- Named refs: BRANCHES and TAGS over the manifest chain -------
  //
  // WAP generalized (Iceberg branches/tags, Nessie's shape at one-table
  // scope): a BRANCH is a named, MULTI-commit staged line — each branch
  // commit writes a full candidate manifest `staged-branch-<name>-s<k>
  // .manifest`, so branch reads are isolated from main (version
  // resolution only considers `v<N>.manifest`) and BOTH GC paths
  // already treat the whole staged-* family as live. Publishing is a
  // FAST-FORWARD: metadata-only (the branch's data batches were staged
  // at write time), valid only while main still sits at the branch's
  // fork base — a diverged main fails loudly and the caller re-branches.
  // A TAG is an immutable named pin on a committed version
  // (`tag-<name>.ref`): expiry clamps its aged prefix BELOW the oldest
  // tag, so tagged history stays readable until the tag is dropped.

  private def requireRefName(name: String): Unit =
    require(name.matches("[A-Za-z0-9_]+"),
      s"ref names must be [A-Za-z0-9_]+, got '$name'")

  private def branchManifestPath(table: String, name: String,
      seq: Int): Path =
    new Path(manifestDir(table), s"staged-branch-$name-s$seq.manifest")

  private val BranchManifestRe =
    """staged-branch-([A-Za-z0-9_]+)-s(\d+)\.manifest""".r

  private def branchHeadSeq(spark: SparkSession, table: String,
      name: String): Option[Int] = {
    val f = fs(spark, table)
    val dir = manifestDir(table)
    if (!f.exists(dir)) return None
    val seqs = f.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case BranchManifestRe(n, s) if n == name => s.toInt }
      .toVector
    if (seqs.isEmpty) None else Some(seqs.max)
  }

  private def branchSnapshot(spark: SparkSession, table: String,
      name: String): (Snapshot, Int) = {
    val seq = branchHeadSeq(spark, table, name).getOrElse(
      throw new IllegalArgumentException(s"no branch $name on $table"))
    (readManifestAt(spark, table,
      branchManifestPath(table, name, seq), -1L), seq)
  }

  /** Fork a named branch at `fromVersion` (default: current). The
    * branch head starts as an exact copy of the base snapshot; commits
    * to it never touch main.
    */
  def createBranch(spark: SparkSession, table: String, name: String,
      fromVersion: Option[Long] = None): Unit = {
    requireRefName(name)
    require(branchHeadSeq(spark, table, name).isEmpty,
      s"branch $name already exists on $table")
    val v = fromVersion.getOrElse(currentVersion(spark, table))
    require(v >= 1, s"$table has no committed snapshot to branch from")
    val snap = readManifest(spark, table, v)
    val f = fs(spark, table)
    val out = f.create(branchManifestPath(table, name, 0), false)
    try out.write(renderManifest(snap.schema, snap.files,
      snap.meta + ("branchBase" -> v.toString) + ("branchName" -> name),
      snap.partitionOf, snap.statsOf, snap.deleteFiles, snap.extraOf))
    finally out.close()
    cacheWapExists(table, name, exists = true)
  }

  /** Does `name` exist as a branch on `table`? */
  private[graft] def branchExists(spark: SparkSession, table: String,
      name: String): Boolean = branchHeadSeq(spark, table, name).isDefined

  /** The branch head as a DataFrame — isolated from main. */
  def readBranch(spark: SparkSession, table: String,
      name: String): DataFrame = {
    val (snap, _) = branchSnapshot(spark, table, name)
    readFilesDv(spark, table, snap, snap.files)
  }

  /** The branch head's schema (the provider's `option("branch", …)`
    * relation needs it before any scan builds).
    */
  private[sources] def branchSchemaOf(spark: SparkSession,
      table: String, name: String): StructType =
    branchSnapshot(spark, table, name)._1.schema

  /** Dynamic branch scope — FULL DML on a branch. Inside `body`, every
    * snapshot verb on `table` (append, updateWhere, deleteWhere,
    * mergeIntoFull, the DV mutations, compact, OPTIMIZE, schema
    * evolution …) resolves its "current snapshot" from the branch HEAD
    * and commits the next staged-branch manifest instead of a main
    * version: the WAP workflow's missing arm (audit finds bad rows →
    * fix ON the branch → publish) without re-implementing a single
    * verb. Branch commits go through the same lockfile CAS as main
    * (two racing branch writers: one winner, one clean
    * CommitConflictException), stage through the same layout-aware
    * path (partition labels, bucket tags, stats, constraints,
    * identity), and main stays untouched until [[publishBranch]].
    * The scope is thread-local and per-table; publish/drop of the
    * scoped branch inside the scope is refused (the verbs' redirect
    * would turn publish's main commit into a branch commit).
    */
  def withBranch[T](spark: SparkSession, table: String, name: String)(
      body: => T): T = {
    requireRefName(name)
    branchSnapshot(spark, table, name) // must exist (throws otherwise)
    val key = branchKey(table)
    val prev = branchCtx.get
    require(!prev.contains(key),
      s"already inside a branch scope for $table (${prev(key)})")
    branchCtx.set(prev + (key -> name))
    try body finally branchCtx.set(prev)
  }

  /** The branch-scope redirect keys on this NORMALIZED path (trailing
    * slashes, redundant segments and the plain-path vs `file:`-scheme
    * spelling all collapse to one key): a scope opened on one spelling
    * must redirect a verb invoked with another — raw-string keying
    * would let `withBranch("/tmp/t")` plus a statement naming
    * `/tmp/t/` commit to MAIN while the caller believes it landed on
    * the branch.
    */
  private[graft] def branchKey(table: String): String = {
    val u = new Path(table).toUri
    if (u.getScheme == null || u.getScheme.equalsIgnoreCase("file"))
      u.getPath
    else new Path(table).toString
  }

  /** The SESSION-SCOPED WAP branch conf (the Iceberg `spark.wap.branch`
    * ergonomics): with `SET graft.branch = <name>`, every snapshot verb
    * — native SQL DML, `graft_dml`, the DataFrameWriter, the streaming
    * sink, reads through `SnapshotTable.read`/the provider — resolves
    * against that branch ON TABLES THAT CARRY IT, with zero statement
    * quoting. Tables without the branch stay on main (a session-global
    * conf must not break reads of unrelated dimensions — the Iceberg
    * "if it exists" rule); the suite pins both behaviors. Explicit
    * `withBranch` composes when it names the SAME branch and is
    * refused otherwise (two different targets for one verb is always a
    * bug); ref-lifecycle internals (publish, drop, re-seed) run inside
    * [[noWap]] so the conf can never redirect a publish's MAIN commit
    * back onto the branch.
    */
  private[sources] val WapBranchConf = "graft.branch"

  private val wapSuppressed = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  private def noWap[T](body: => T): T = {
    val prev = wapSuppressed.get
    wapSuppressed.set(true)
    try body finally wapSuppressed.set(prev)
  }

  /** MEMOIZED branch-existence for the session-WAP conf: while
    * `graft.branch` is set, EVERY verb on every table resolves "does
    * this table carry the branch?" — a per-verb directory listing
    * that at production metadata latencies is one extra RPC per query
    * per table. The verdict is cached per (normalized table key,
    * branch) and invalidated by this process's ref verbs
    * (create/drop/publish/re-seed), like the chain loader. The cache
    * is in-process by design: a branch created elsewhere is seen
    * after this process touches the ref (or restarts) — the Iceberg
    * "if it exists" rule at process scope; a branch dropped elsewhere
    * fails LOUDLY at the head read (never a silent main write).
    */
  private val wapBranchExists = new java.util.concurrent
    .ConcurrentHashMap[(String, String), java.lang.Boolean]()

  /** Test hook: resolution-path filesystem probes performed. */
  private[graft] val wapProbeCount =
    new java.util.concurrent.atomic.AtomicLong

  private def cacheWapExists(table: String, name: String,
      exists: Boolean): Unit = {
    wapBranchExists.put((branchKey(table), name),
      java.lang.Boolean.valueOf(exists))
    ()
  }

  /** The memoized existence check itself — also the probe the
    * provider's unpinned-read WAP redirect shares.
    */
  private[graft] def branchExistsCached(spark: SparkSession,
      table: String, name: String): Boolean =
    wapBranchExists.computeIfAbsent((branchKey(table), name), _ => {
      wapProbeCount.incrementAndGet()
      java.lang.Boolean.valueOf(
        branchHeadSeq(spark, table, name).isDefined)
    }).booleanValue()

  private def sessionWapBranch(table: String): Option[String] =
    if (wapSuppressed.get) None
    else SparkSession.getActiveSession.flatMap { s =>
      s.conf.getOption(WapBranchConf).filter(_.nonEmpty).filter { b =>
        requireRefName(b)
        branchExistsCached(s, table, b)
      }
    }

  /** The branch currently scoped over `table` on this thread, if any
    * — the one lookup every redirect site shares. Explicit
    * [[withBranch]] scope first, then the session WAP conf.
    */
  private def scopedBranch(table: String): Option[String] = {
    val explicit = branchCtx.get.get(branchKey(table))
    if (wapSuppressed.get) explicit
    else (explicit, sessionWapBranch(table)) match {
      case (Some(b), Some(c)) if b != c =>
        throw new IllegalStateException(
          s"explicit branch scope $b on $table conflicts with session " +
            s"conf $WapBranchConf=$c — unset the conf or scope the " +
            "same branch")
      case (Some(b), _) => Some(b)
      case (None, c) => c
    }
  }

  /** Tables whose verbs are currently redirected to a branch, per
    * thread (verbs run driver-side on the calling thread, so the
    * dynamic scope is exact — no cross-query leakage).
    */
  private val branchCtx = new ThreadLocal[Map[String, String]] {
    override def initialValue(): Map[String, String] = Map.empty
  }

  /** Commit an append to the branch: data batches stage through the
    * SAME layout-aware path as main commits (partition labels, bucket
    * tags, stats, constraints all enforced), the new head manifest
    * commits with the lockfile CAS — two racing branch writers produce
    * one winner and one clean failure, like main. Returns the new head
    * sequence. (Sugar for `withBranch { append }`.)
    */
  def appendToBranch(spark: SparkSession, table: String, name: String,
      df: DataFrame): Int =
    withBranch(spark, table, name)(append(spark, table, df)).toInt

  /** FAST-FORWARD publish: promote the branch head to main's next
    * version — metadata-only (one manifest commit; every data byte was
    * staged at branch-commit time and branch audits read exactly those
    * files). Requires main to still sit at the fork base: a commit
    * that landed after the fork would be silently dropped by a
    * fast-forward, so divergence fails loudly (not retryable — the
    * caller re-branches from the new base and re-applies). The branch
    * is consumed by its publish.
    */
  def publishBranch(spark: SparkSession, table: String,
      name: String): Long =
    publishBranch(spark, table, name, cherryPick = false,
      retainBranch = false)

  def publishBranch(spark: SparkSession, table: String, name: String,
      cherryPick: Boolean): Long =
    publishBranch(spark, table, name, cherryPick, retainBranch = false)

  /** As the three-arg publish; `cherryPick = true` additionally
    * handles a DIVERGED main (Iceberg's cherry-pick semantics): the
    * branch's commits re-apply onto the moved main as one fresh
    * commit, valid ONLY while the branch is append-only against its
    * fork base — a branch carrying rewrites (removed files or new
    * deletion vectors) of state main may have since changed fails
    * loudly, as does layout/constraint divergence on either side, or
    * identity assignment on BOTH sides (the ids would collide). The
    * conflict rules are conservative by design: a refused cherry-pick
    * re-branches and re-applies; a wrong merge would corrupt main.
    *
    * `retainBranch = true` keeps the branch ALIVE after publish,
    * re-seeded at the freshly published main version (the Iceberg
    * fast-forward-keeps-the-ref shape): a continuous streaming WAP
    * sink writing through `option("branch", …)` publishes
    * periodically WITHOUT its next micro-batch failing on a dropped
    * ref — the re-seed carries the published snapshot (batch-id marks
    * included), so exactly-once continues across the publish.
    */
  def publishBranch(spark: SparkSession, table: String, name: String,
      cherryPick: Boolean, retainBranch: Boolean): Long = noWap {
    // noWap: the publish's commit targets MAIN by definition — neither
    // an explicit scope nor the session WAP conf may redirect it back
    // onto the branch (which would make publish a self-append)
    require(!branchCtx.get.contains(branchKey(table)),
      s"cannot publish inside a branch scope for $table — exit " +
        "withBranch first")
    val (snap, _) = branchSnapshot(spark, table, name)
    val base = snap.meta.getOrElse("branchBase",
      throw new IllegalStateException(
        s"branch $name on $table carries no branchBase")).toLong
    val cur = currentVersion(spark, table)
    val v =
      if (cur == base)
        // FAST-FORWARD: metadata-only promotion of the branch head
        commitManifest(spark, table, snap.schema, snap.files, base,
          snap.meta - "branchBase" - "branchName",
          snap.partitionOf, snap.statsOf, snap.deleteFiles,
          Some(readManifest(spark, table, base)), snap.extraOf)
      else {
        // REPLAY detection before any conflict check: a crash between
        // the main commit and dropBranch leaves the branch alive with
        // a stale branchBase; a retried publish whose content already
        // landed must be a no-op (drop/re-seed the branch, commit
        // nothing) — not a duplicate append, and not a spurious
        // conflict on checks the first publish legitimately passed
        val mainNow = readManifest(spark, table, cur)
        if (mainNow.files.toSet == snap.files.toSet &&
            mainNow.schema == snap.schema) cur
        else if (!cherryPick)
          throw new IllegalStateException(
            s"fast-forward conflict at $table: branch $name forked at " +
              s"v$base but main is at v$cur; re-branch from the " +
              "current version and re-apply, or publish with " +
              "cherryPick = true for an append-only branch")
        else cherryPickOnto(spark, table, name, snap, base, cur)
      }
    if (retainBranch) reseedBranch(spark, table, name, v)
    else dropBranch(spark, table, name)
    v
  }

  /** Re-fork `name` at main version `v` IN PLACE: the new head
    * manifest (a copy of v's snapshot, branchBase = v) is written at
    * the next head sequence BEFORE the old sequences are deleted, so
    * the branch head is valid at every instant — a crash mid-re-seed
    * leaves a live branch, never a dangling ref.
    */
  private def reseedBranch(spark: SparkSession, table: String,
      name: String, v: Long): Unit = {
    val head = branchHeadSeq(spark, table, name).getOrElse(-1)
    val snap = readManifest(spark, table, v)
    val f = fs(spark, table)
    val out = f.create(branchManifestPath(table, name, head + 1), false)
    try out.write(renderManifest(snap.schema, snap.files,
      snap.meta + ("branchBase" -> v.toString) + ("branchName" -> name),
      snap.partitionOf, snap.statsOf, snap.deleteFiles, snap.extraOf))
    finally out.close()
    // keep the PRIOR head (delete only the sequences below it): a
    // branch-tailing CDF stream checkpointed at that head can then
    // diff across the re-seed — empty on a fast-forward publish,
    // main's extra files on a cherry-pick — instead of failing on a
    // vanished pre-image. One extra manifest, collected by the next
    // re-seed.
    (0 until head).foreach(k =>
      f.delete(branchManifestPath(table, name, k), false))
    cacheWapExists(table, name, exists = true)
  }

  /** Meta keys that define the table's physical/logical contract —
    * divergence on any of them makes a cherry-pick unsafe (branch
    * files were staged under the FORK's layout and validated under the
    * fork's constraints).
    */
  private val CherryLayoutKeys = Seq("partitionCol", "partitionCols",
    "partitionSpec", "bucketCol", "bucketCols", "bucketN", "bucketSort",
    "colmap", "droppedCols", "identityCol", "identitySort",
    "clusterCols", "statsCols", "bloomCols")

  private def cherryPickOnto(spark: SparkSession, table: String,
      name: String, snap: Snapshot, base: Long, cur: Long): Long = {
    def conflict(why: String): Nothing =
      throw new IllegalStateException(
        s"cherry-pick conflict at $table: $why — re-branch from v$cur " +
          "and re-apply")
    val baseSnap = readManifest(spark, table, base)
    val mainSnap = readManifest(spark, table, cur)
    // append-only check: the branch may only have ADDED files; any
    // removed file or new deletion vector is a rewrite of state main
    // may have since changed
    val branchFiles = snap.files.toSet
    val removed = baseSnap.files.filterNot(branchFiles)
    val dvAdded = snap.deleteFiles
      .filterNot(baseSnap.deleteFiles.toSet)
    if (removed.nonEmpty || dvAdded.nonEmpty)
      conflict(s"branch $name is not append-only against its fork " +
        s"base v$base (${removed.size} removed/rewritten files, " +
        s"${dvAdded.size} new deletion vectors)")
    if (snap.schema != baseSnap.schema)
      conflict(s"branch $name evolved the schema after the fork")
    if (mainSnap.schema != baseSnap.schema)
      conflict("main evolved the schema after the fork")
    def layout(m: Map[String, String]): Map[String, String] =
      CherryLayoutKeys.flatMap(k => m.get(k).map(k -> _)).toMap ++
        m.filter { case (k, _) => k.startsWith("constraint.") ||
          k.startsWith("colDefault.") }
    if (layout(snap.meta) != layout(baseSnap.meta))
      conflict(s"branch $name changed layout/constraints/defaults " +
        "after the fork")
    if (layout(mainSnap.meta) != layout(baseSnap.meta))
      conflict("main changed layout/constraints/defaults after the fork")
    // identity high-water mark: assignment on both sides collides
    val hwmOf = (s: Snapshot) => s.meta.get("identityHwm").map(_.toLong)
    val merged = (hwmOf(snap), hwmOf(baseSnap), hwmOf(mainSnap)) match {
      case (Some(b), Some(o), Some(m)) if b > o && m > o =>
        conflict(s"both main and branch $name assigned identity ids " +
          s"after the fork (base mark $o, branch $b, main $m) — the " +
          "ids would collide")
      case (b, _, m) =>
        (b.toSeq ++ m.toSeq).reduceOption((x: Long, y: Long) =>
          math.max(x, y))
    }
    // MONOTONE CONSUMER MARKS ride the merge: the streaming sink's
    // batch-id idempotency marks (lastBatchId.<queryKey>) and the CDF
    // consumer's high-water mark (cdcUpTo) were committed on the
    // branch; dropping them (fast-forward preserves them wholesale)
    // would let a micro-batch replay after a cherry-pick publish
    // double-apply a batch to main. Both are monotone skip-marks, so
    // max(branch, main) is the correct merge on every path: the merged
    // table must never re-apply a batch EITHER side already holds.
    def isMark(k: String) =
      k.startsWith("lastBatchId.") || k == "cdcUpTo"
    val markMerge = (snap.meta.keySet ++ mainSnap.meta.keySet)
      .filter(isMark).flatMap { k =>
        val vs = (snap.meta.get(k) ++ mainSnap.meta.get(k))
          .flatMap(v => scala.util.Try(v.toLong).toOption)
        vs.reduceOption((a, b) => math.max(a, b))
          .map(k -> _.toString)
      }.toMap
    // REPLAY IDEMPOTENCE: a crash between the first cherry-pick's main
    // commit and dropBranch leaves the branch alive; the retried
    // publish passes every conflict check (the branch is still
    // append-only vs its base) but its files already sit in main —
    // re-appending them would list them twice in the manifest and
    // double those rows on every read. Files main already holds are
    // skipped; a pure replay commits nothing.
    val mainSet = mainSnap.files.toSet
    val added = snap.files.filterNot(baseSnap.files.toSet)
      .filterNot(mainSet)
    if (added.isEmpty) return cur
    val addedSet = added.toSet
    commitManifest(spark, table, mainSnap.schema,
      mainSnap.files ++ added, cur,
      mainSnap.meta ++ merged.map("identityHwm" -> _.toString) ++
        markMerge,
      mainSnap.partitionOf ++
        snap.partitionOf.view.filterKeys(addedSet).toMap,
      mainSnap.statsOf ++ snap.statsOf.view.filterKeys(addedSet).toMap,
      mainSnap.deleteFiles, Some(mainSnap),
      mainSnap.extraOf ++ snap.extraOf.view.filterKeys(addedSet).toMap)
  }

  /** Drop a branch: its manifests go; its staged batches become
    * ordinary aged-orphan candidates for [[vacuumOrphans]].
    */
  def dropBranch(spark: SparkSession, table: String,
      name: String): Unit = {
    requireRefName(name)
    // guard on the EXPLICIT scope only: the session WAP conf must not
    // wedge its own branch against dropping (publish consumes branches
    // while the conf is still set — that is the normal WAP sequence)
    require(!branchCtx.get.get(branchKey(table)).contains(name),
      s"cannot drop branch $name inside its own scope")
    val f = fs(spark, table)
    branchHeadSeq(spark, table, name).foreach { head =>
      (0 to head).foreach(k =>
        f.delete(branchManifestPath(table, name, k), false))
    }
    cacheWapExists(table, name, exists = false)
  }

  /** Live branches: (name, fork base version, head sequence). */
  def branches(spark: SparkSession, table: String)
      : Seq[(String, Long, Int)] = {
    val f = fs(spark, table)
    val dir = manifestDir(table)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case BranchManifestRe(n, s) => n -> s.toInt }
      .toVector.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (n, seqs) =>
        val head = seqs.map(_._2).max
        val snap = readManifestAt(spark, table,
          branchManifestPath(table, n, head), -1L)
        (n, snap.meta.getOrElse("branchBase", "-1").toLong, head)
      }
  }

  private def tagPath(table: String, name: String): Path =
    new Path(manifestDir(table), s"tag-$name.ref")

  /** Pin `version` under an immutable name. Expiry keeps everything
    * from the OLDEST tag forward readable until the tag is dropped.
    */
  def tagVersion(spark: SparkSession, table: String, name: String,
      version: Long): Unit = {
    requireRefName(name)
    require(version >= retentionFloor(spark, table) &&
      version <= currentVersion(spark, table),
      s"cannot tag v$version of $table: outside the readable range")
    readManifest(spark, table, version) // must resolve
    val f = fs(spark, table)
    val p = tagPath(table, name)
    require(!f.exists(p),
      s"tag $name already exists on $table — tags are immutable; " +
        "dropTag first")
    val out = f.create(p, false)
    try out.write(version.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** All tags: name -> pinned version. */
  def tags(spark: SparkSession, table: String): Map[String, Long] = {
    val f = fs(spark, table)
    val dir = manifestDir(table)
    if (!f.exists(dir)) return Map.empty
    f.listStatus(dir).iterator.map(_.getPath)
      .filter(p => p.getName.startsWith("tag-") &&
        p.getName.endsWith(".ref"))
      .flatMap { p =>
        val in = f.open(p)
        val v = try new String(in.readAllBytes(), "UTF-8").trim
          finally in.close()
        scala.util.Try(v.toLong).toOption.map(
          p.getName.stripPrefix("tag-").stripSuffix(".ref") -> _)
      }.toMap
  }

  def readTag(spark: SparkSession, table: String,
      name: String): DataFrame = {
    val v = tags(spark, table).getOrElse(name,
      throw new IllegalArgumentException(s"no tag $name on $table"))
    read(spark, table, Some(v))
  }

  def dropTag(spark: SparkSession, table: String, name: String): Unit = {
    requireRefName(name)
    fs(spark, table).delete(tagPath(table, name), false)
    ()
  }

  /** The FILES metadata relation (Iceberg's `t.files` shape): one row
    * per live data file — manifest-relative path, on-disk bytes,
    * recorded row count (when the stats-tracking writer recorded one),
    * and the partition label tuple. Metadata-tier: one manifest read +
    * one batched listStatus per batch dir, zero data IO — the
    * observability surface a 100 TB operator reaches for before any
    * OPTIMIZE decision (file-size skew, partition balance).
    */
  def filesOf(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    val snap = version match {
      case Some(v) => readManifest(spark, table, v)
      case None => loadCurrent(spark, table)
    }
    val f = fs(spark, table)
    val byDir = snap.files.groupBy(r =>
      r.split('/').dropRight(1).mkString("/"))
    val sizes: Map[String, Long] = byDir.keys.flatMap { dir =>
      f.listStatus(new Path(table, dir)).iterator.filter(_.isFile)
        .map(st => s"$dir/${st.getPath.getName}" -> st.getLen)
    }.toMap
    import spark.implicits._
    snap.files.map { file =>
      (file, sizes.getOrElse(file, -1L),
        snap.extraOf.get(file).flatMap(_.get("rows"))
          .flatMap(s => scala.util.Try(s.toLong).toOption),
        snap.partitionOf.get(file))
    }.toDF("file", "size_bytes", "rows", "partition")
  }

  /** The PARTITIONS metadata relation (Iceberg's `t.partitions`): one
    * row per live partition — label, file count, summed bytes, summed
    * recorded rows (null unless EVERY file of the partition carries a
    * count — the partial-sum would lie). The rollup an operator reads
    * before any partition-scoped OPTIMIZE decision (file-count skew,
    * small-file partitions); metadata-tier like [[filesOf]] — one
    * manifest read + one batched listing, zero data IO.
    * Unpartitioned tables roll up under a single null label.
    */
  def partitionsOf(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val files = filesOf(spark, table, version)
      .collect() // metadata-tier: one row per live FILE, already small
    files.groupBy(r => Option(r.getAs[String]("partition")))
      .map { case (label, rs) =>
        val rows = rs.map(r =>
          Option(r.getAs[java.lang.Long]("rows")).map(_.longValue))
        (label, rs.length.toLong,
          rs.map(_.getAs[Long]("size_bytes")).filter(_ >= 0).sum,
          if (rows.forall(_.isDefined)) Some(rows.flatten.sum)
          else None)
      }.toSeq.sortBy(_._1)
      .toDF("partition", "files", "size_bytes", "rows")
  }

  /** Merge-on-read UPDATE: vector-delete the matched rows' positions
    * and append their updated images as a fresh batch, published by ONE
    * commit — IO proportional to the MATCHES (old positions + new
    * images), while [[updateWhere]]'s copy-on-write rewrite pays for
    * every resident row of every touched file. The classic trade both
    * Delta and Iceberg expose: merge-on-read wins on sparse updates,
    * copy-on-write on dense ones; [[compact]] later folds the debt.
    * Returns (new version, rows updated).
    */
  def updateWhereVector(spark: SparkSession, table: String,
      predicate: Column, assignments: Map[String, Column]): (Long, Long) = {
    val snap = loadCurrent(spark, table)
    val matches = coalesce(predicate, lit(false))
    val matched = readFilesDvProv(spark, table, snap, snap.files)
      .filter(matches)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = matched.count()
      if (n == 0) return (snap.version, 0L)
      val batch = "dv-" + java.util.UUID.randomUUID().toString
      val dir = s"$table/data/$batch"
      matched.select(col("__fk").as("file_key"), col("__rp").as("pos"))
        .write.mode("error").parquet(dir)
      val f = fs(spark, table)
      val dvFiles = f.listStatus(new Path(dir)).iterator
        .map(_.getPath.getName)
        .filter(nm => nm.startsWith("part-") && nm.endsWith(".parquet"))
        .map(nm => s"data/$batch/$nm").toVector.sorted
      // one simultaneous select (not a withColumn fold): every
      // assignment RHS binds against the OLD row, so `SET a = b,
      // b = a` swaps — and casts to the declared column type — the
      // same SQL-UPDATE rules as [[updateWhere]]
      requireAssignable(snap.schema, assignments)
      requireNotIdentity(snap, assignments.keys, "UPDATE")
      val updated = matched.drop("__fk", "__rp")
        .select(snap.schema.map { f =>
          assignments.get(f.name) match {
            case Some(v) => v.cast(f.dataType).as(f.name)
            case None => col(f.name)
          }
        }.toIndexedSeq: _*)
      val (fresh, labels, stats, extras) = stageFor(snap, updated, table)
      val v = commitManifest(spark, table, snap.schema,
        snap.files ++ fresh, snap.version, snap.meta,
        snap.partitionOf ++ labels, snap.statsOf ++ stats,
        snap.deleteFiles ++ dvFiles, Some(snap), snap.extraOf ++ extras)
      (v, n)
    } finally { matched.unpersist(blocking = false); () }
  }

  final case class Maintenance(compacted: Boolean, filesBefore: Int,
      filesAfter: Int, manifestsExpired: Int, dataFilesRemoved: Int,
      orphanBatchesRemoved: Int, mvRefresh: String = "")

  /** One-call table maintenance — the OPTIMIZE autopilot every
    * long-lived table needs, composing the primitives under thresholds:
    * compact (which also purges deletion vectors) when the file count
    * exceeds `maxFiles` OR the vectors cover more than `maxDeleteRatio`
    * of the resident rows (merge-on-read debt), then expire old
    * snapshots and vacuum orphaned crash debris. The health probes are
    * metadata-tier (manifest file count; delete-file row count, which
    * is churn-sized). Runs under the same no-concurrent-writer
    * discipline as the GC primitives it calls.
    */
  def maintain(spark: SparkSession, table: String, maxFiles: Int = 64,
      maxDeleteRatio: Double = 0.1, keepLast: Int = 2,
      graceMs: Long = 3600000L): Maintenance = {
    // a STALE materialized view refreshes first (so the compaction /
    // retention passes below see the refreshed state) — folding MV
    // freshness into the same autopilot that repairs file counts
    val mvRefresh = {
      val head = loadCurrent(spark, table)
      if (head.meta.contains("mvQuery") &&
          currentVersion(spark, head.meta("mvSource")) >
            head.meta.getOrElse("cdcUpTo", "0").toLong)
        MaterializedView.refresh(spark, table)._1
      else ""
    }
    val snap = loadCurrent(spark, table)
    val dvRows =
      if (snap.deleteFiles.isEmpty) 0L
      else spark.read.schema(dvFileSchema)
        .parquet(snap.deleteFiles.map(d => s"$table/$d"): _*).count()
    // resident rows from parquet footer counts (metadata-only plan)
    val resident =
      if (snap.files.isEmpty) 0L
      else spark.read.schema(snap.schema)
        .parquet(snap.files.map(f => s"$table/$f"): _*).count()
    val needCompact = snap.files.size > maxFiles ||
      (resident > 0 && dvRows.toDouble / resident > maxDeleteRatio)
    val (before, after) =
      if (needCompact) { val (_, b, a) = compact(spark, table); (b, a) }
      else (snap.files.size, snap.files.size)
    val (expired, removed) = expireSnapshots(spark, table, keepLast)
    val orphans = vacuumOrphans(spark, table, graceMs)
    Maintenance(needCompact, before, after, expired, removed, orphans,
      mvRefresh)
  }

  /** Optimistic-concurrency retry: run `op` (any mutation verb — each
    * one re-resolves the current snapshot when it starts), and if it
    * loses the commit race, re-run it against the new current snapshot
    * after a short jittered backoff — the standard writer loop every
    * catalog-backed table format wraps around its commits. The losing
    * attempt's staged files are orphans for [[vacuumOrphans]]; nothing
    * visible ever tears. Only the typed rename-race
    * [[CommitConflictException]] retries — a WAP publish whose base
    * moved throws a plain IllegalStateException instead, because its
    * staged manifest pins the old base and re-running could never
    * succeed (re-stage on the new base).
    */
  def withCommitRetry[T](maxAttempts: Int = 5)(op: => T): T = {
    require(maxAttempts >= 1, "need at least one attempt")
    var attempt = 0
    var backoffMs = 50L
    while (true) {
      attempt += 1
      try return op
      catch {
        case _: CommitConflictException if attempt < maxAttempts =>
          Thread.sleep(backoffMs +
            java.util.concurrent.ThreadLocalRandom.current().nextLong(backoffMs))
          backoffMs = math.min(backoffMs * 2, 2000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Session-scoped scratch root (keyed by applicationId like
    * IvfPq.fittedFor: concurrent processes never share a table path).
    */
  private def scratch(s: SparkSession, d: String, tag: String): String =
    sys.env.getOrElse("SPARK_GRAFT_SCRATCH_ROOT", "/tmp") +
      s"/graft_snap_${tag}_${s.sparkContext.applicationId}_" +
      d.replaceAll("[^A-Za-z0-9]", "_")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The mutation surface on the snapshot layer, end to end: create
    // orders as an 8-file table, UPDATE a key slice (only affected
    // files rewritten — SnapshotSuite asserts the file accounting),
    // DELETE another slice, then read the CURRENT snapshot. The oracle
    // replays the same update+delete in SQL — hash-equal rows prove the
    // committed snapshot is exactly the logical table.
    "q_table_snapshot" -> ((s, d) => {
      val t = scratch(s, d, "q")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      create(s, t, orders, numFiles = 8)
      updateWhere(s, t, col("o_orderkey") % 100 === 0,
        Map("o_orderstatus" -> lit("X"),
          "o_totalprice" -> col("o_totalprice") * 2))
      deleteWhere(s, t, col("o_orderkey") % 17 === 3)
      read(s, t)
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // File-granular MERGE: updates land only in the files holding their
    // keys, inserts append as one fresh batch, one atomic commit. The
    // oracle replays the upsert as LEFT JOIN + anti-join UNION. The
    // source carries no NULLs, so column-wise coalesce == row replace.
    "q_table_merge" -> ((s, d) => {
      val t = scratch(s, d, "mg")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      create(s, t, orders, numFiles = 8)
      val src = orders.filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          lit("M").as("o_orderstatus"),
          (col("o_totalprice") + 100000).as("o_totalprice"))
        .union(orders.filter(col("o_orderkey") % 1000 === 7)
          .select((col("o_orderkey") + 10000000).as("o_orderkey"),
            col("o_custkey"), lit("N").as("o_orderstatus"),
            col("o_totalprice")))
      mergeInto(s, t, src, "o_orderkey")
      read(s, t)
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Data skipping: a clustered table answers a narrow key-range query
    // opening only the files whose manifest [min,max] intersects it
    // (SnapshotSuite asserts the inputFiles count); the residual
    // row-level filter keeps exactness, so the oracle is a plain
    // BETWEEN scan.
    "q_table_skipping" -> ((s, d) => {
      val t = scratch(s, d, "sk")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      createClustered(s, t, orders, "o_orderkey", numFiles = 8)
      readWhereRange(s, t, "o_orderkey", 1000, 2000)
        .filter(col("o_orderkey").between(1000, 2000))
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // The Catalyst-integrated scan (SnapshotScan/SnapshotFileIndex): a
    // PLAIN .filter() on the scan frame — no readWhereRange call —
    // plans a pruned file set because Catalyst pushes the predicate
    // into the manifest-backed FileIndex (SnapshotSuite asserts the
    // planned file count). Oracle: the same BETWEEN scan.
    "q_table_scan_pushdown" -> ((s, d) => {
      val t = scratch(s, d, "sp")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      createClustered(s, t, orders, "o_orderkey", numFiles = 8)
      SnapshotScan.scan(s, t)._1
        .filter(col("o_orderkey").between(100, 1300))
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Change data feed across the update+delete commits (v1 -> v3):
    // reads ONLY the manifest-diff files, nets rewrite carry-through
    // with EXCEPT ALL, emits pre/post images. The oracle derives the
    // same logical diff from first principles: final-state EXCEPT ALL
    // original = inserts, original EXCEPT ALL final-state = deletes —
    // a hash match proves the file-diff feed equals the logical diff.
    "q_table_changes" -> ((s, d) => {
      val t = scratch(s, d, "cd")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      create(s, t, orders, numFiles = 8)
      updateWhere(s, t, col("o_orderkey") % 100 === 0,
        Map("o_orderstatus" -> lit("X"),
          "o_totalprice" -> col("o_totalprice") * 2))
      deleteWhere(s, t, col("o_orderkey") % 17 === 3)
      changesBetween(s, t, 1L, 3L)
        .orderBy(col("change_type").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)
    }),

    // Deletion vectors end to end: a row-level delete commits only a
    // position-delete file (SnapshotSuite asserts the data file list is
    // untouched), a replay of the same delete is a no-op (matching runs
    // on the live view), and a later file-granular UPDATE composes with
    // the vectors (its rewrite materializes them for touched files,
    // never resurrecting dead rows). The oracle replays delete+update
    // as plain SQL.
    "q_table_delete_vector" -> ((s, d) => {
      val t = scratch(s, d, "dvq")
      fs(s, t).delete(new Path(t), true)
      val items = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
      create(s, t, items, numFiles = 8)
      deleteWhereVector(s, t, col("l_orderkey") % 17 === 3)
      deleteWhereVector(s, t, col("l_orderkey") % 17 === 3) // no-op replay
      updateWhere(s, t, col("l_orderkey") % 100 === 0,
        Map("l_quantity" -> (col("l_quantity") + 5)))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // corpus — order by every projected column for a total order
      // (full duplicates are order-indifferent to the hash compare)
      read(s, t)
        .orderBy(col("l_orderkey").asc_nulls_first,
          col("l_linenumber").asc_nulls_first,
          col("l_returnflag").asc_nulls_first,
          col("l_quantity").asc_nulls_first)
    }),

    // CATALOG-NAMED tables through the registered data source: the
    // table is created at a path through format("graft"), registered
    // under a NAME (`CREATE TABLE ... USING graft LOCATION`), and the
    // whole mutation surface then runs BY NAME — UPDATE, DELETE,
    // INSERT INTO, MERGE INTO — through the parse-time interception,
    // with every SELECT resolving the name to the manifest-backed
    // pruned scan. This is the reference's addressing model
    // (database.py:75-278 keys every verb by table name). The oracle
    // replays the same four statements' logical effect in plain SQL.
    "q_table_catalog" -> ((s, d) => {
      val t = scratch(s, d, "cat")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      orders.write.format("graft").mode("errorifexists").save(t)
      val s2 = org.apache.spark.sql.GraftShim.sessionWithExtensions(s,
        e => new graft.GraftExtensions()(e))
      s2.sql("DROP TABLE IF EXISTS graft_q_catalog")
      s2.sql(s"CREATE TABLE graft_q_catalog USING graft LOCATION '$t'")
      s2.sql("UPDATE graft_q_catalog SET o_orderstatus = 'X', " +
        "o_totalprice = o_totalprice * 2 WHERE o_orderkey % 100 = 0")
        .collect()
      s2.sql("DELETE FROM graft_q_catalog WHERE o_orderkey % 17 = 3")
        .collect()
      s2.sql("INSERT INTO graft_q_catalog " +
        "SELECT o_orderkey + 20000000 AS o_orderkey, o_custkey, " +
        s"'I' AS o_orderstatus, o_totalprice FROM parquet.`$d/orders" +
        ".parquet` WHERE o_orderkey % 500 = 11").collect()
      s2.sql("MERGE INTO graft_q_catalog tg USING (" +
        "SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus, " +
        "o_totalprice + 100000 AS o_totalprice " +
        s"FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 50 = 0" +
        ") sr ON tg.o_orderkey = sr.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *").collect()
      s2.sql("SELECT * FROM graft_q_catalog " +
        "ORDER BY o_orderkey ASC NULLS FIRST")
    }),

    // The FULL MERGE clause surface in one statement: a conditional
    // column-level UPDATE, a catch-all DELETE for the remaining
    // matches, a NOT MATCHED BY SOURCE update, and a conditional
    // column-list INSERT — all lowered onto one file-granular commit
    // (touched files rewritten in one simultaneous select, Delta
    // clause precedence; precedence + cardinality rule suite-asserted
    // in SnapshotSuite). The oracle replays the clause logic as a
    // CASE over a LEFT JOIN plus an anti-join for the inserts.
    "q_table_merge_full" -> ((s, d) => {
      val t = scratch(s, d, "mgf")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      create(s, t, orders, numFiles = 8)
      val s2 = org.apache.spark.sql.GraftShim.sessionWithExtensions(s,
        e => new graft.GraftExtensions()(e))
      s2.sql(
        s"""MERGE INTO `$t` tg USING (
           |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |  FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 20 = 0
           |  UNION ALL
           |  SELECT o_orderkey + 30000000, o_custkey, o_orderstatus,
           |    o_totalprice
           |  FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 500 = 7
           |) sr ON tg.o_orderkey = sr.o_orderkey
           |WHEN MATCHED AND tg.o_totalprice < 150000 THEN
           |  UPDATE SET o_totalprice = sr.o_totalprice * 2,
           |    o_orderstatus = 'U'
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED AND sr.o_orderkey % 8 = 7 THEN
           |  INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
           |  VALUES (sr.o_orderkey, sr.o_custkey, 'N', sr.o_totalprice)
           |WHEN NOT MATCHED BY SOURCE AND tg.o_orderkey % 777 = 0 THEN
           |  UPDATE SET o_orderstatus = 'Z'
           |""".stripMargin).collect()
      read(s, t).orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // MULTI-COLUMN partitioning end to end: a two-column PARTITIONED
    // BY CTAS through SQL, then a DELETE whose predicate names BOTH
    // partition columns (planned against the manifest's composite
    // labels — subset pruning suite-asserted) and an UPDATE that only
    // touches data columns. The oracle replays the logical history
    // over the derived-bucket projection.
    "q_table_multipart" -> ((s, d) => {
      val t = scratch(s, d, "mp")
      fs(s, t).delete(new Path(t), true)
      graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .withColumn("pbucket", col("o_orderkey") % 4)
        .createOrReplaceTempView("graft_mp_src")
      graft.GraftExtensions.register(s)
      s.sql(s"""SELECT * FROM graft_dml("CREATE TABLE `$t` """ +
        """PARTITIONED BY (o_orderstatus, pbucket) """ +
        """AS SELECT * FROM graft_mp_src")""").collect()
      s.sql(s"""SELECT * FROM graft_dml("DELETE FROM `$t` """ +
        """WHERE o_orderstatus = 'O' AND pbucket = 2")""").collect()
      s.sql(s"""SELECT * FROM graft_dml("UPDATE `$t` """ +
        """SET o_totalprice = o_totalprice * 2 """ +
        """WHERE o_orderkey % 100 = 0")""").collect()
      read(s, t).orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // COLUMN MAPPING end to end: rename + drop + int->bigint widening,
    // all METADATA-ONLY (zero file churn — suite-asserted), then a
    // post-evolution append (new-generation files under the new
    // name/type) and an UPDATE whose predicate binds the renamed
    // column across BOTH file generations. The read coalesces the
    // name generations (each file holds exactly one) and the parquet
    // reader widens the narrow old values; the oracle replays the
    // logical history (rename = projection alias, drop = omission,
    // widen = CAST, then the update CASE).
    "q_table_schema_evolution" -> ((s, d) => {
      val t = scratch(s, d, "sev")
      fs(s, t).delete(new Path(t), true)
      val items = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"))
      create(s, t, items, numFiles = 8)
      renameColumn(s, t, "l_returnflag", "flag")
      dropColumn(s, t, "l_quantity")
      widenColumn(s, t, "l_linenumber",
        org.apache.spark.sql.types.LongType)
      append(s, t, items.filter(col("l_orderkey") % 100 === 0)
        .select((col("l_orderkey") + 50000000L).as("l_orderkey"),
          (col("l_linenumber").cast("bigint") + 10000000000L)
            .as("l_linenumber"),
          col("l_returnflag").as("flag")))
      updateWhere(s, t,
        col("flag") === "R" && col("l_orderkey") % 50 === 0,
        Map("flag" -> lit("Q")))
      read(s, t).orderBy(col("l_orderkey").asc_nulls_first,
        col("l_linenumber").asc_nulls_first,
        col("flag").asc_nulls_first)
    }),

    // BUCKETED tables (the co-located-join layout): both sides of the
    // join live pre-hashed into the same bucket count on their join
    // keys, so the fact-fact join plans with ZERO shuffle exchanges —
    // through mutations and compaction, which restage per bucket
    // (exchange-freedom PlanAuditSuite-asserted; this query proves the
    // CONTENT is right across a mutate + re-join on the hard oracle).
    "q_table_bucket_join" -> ((s, d) => {
      val ta = scratch(s, d, "bja")
      val tb = scratch(s, d, "bjb")
      fs(s, ta).delete(new Path(ta), true)
      fs(s, tb).delete(new Path(tb), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val cust = graft.Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      createBucketed(s, ta, orders, "o_custkey", 8)
      createBucketed(s, tb, cust, "c_custkey", 8)
      updateWhere(s, ta, col("o_orderkey") % 10 === 0,
        Map("o_totalprice" -> (col("o_totalprice") + 1)))
      SnapshotScan.scan(s, ta)._1
        .join(SnapshotScan.scan(s, tb)._1,
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          graft.Det.r4(sum(col("o_totalprice"))).as("total"))
        .orderBy(col("c_nationkey").asc_nulls_first)
    }),

    // PARTITION x BUCKET composition with a MULTI-COLUMN bucket key
    // (the canonical large fact: partition by attribute, bucket by
    // join key): labels and bucket tags both re-derive through an
    // update and a delete, the final aggregation groups on the bucket
    // key (map-side, no exchange — PlanAuditSuite asserts the
    // exchange-free join for this layout; this query proves CONTENT
    // through the lifecycle on the hard oracle).
    "q_table_bucket_compose" -> ((s, d) => {
      val t = scratch(s, d, "bjc")
      fs(s, t).delete(new Path(t), true)
      val items = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_returnflag"))
      createBucketed(s, t, items, Seq("l_partkey", "l_suppkey"), 8,
        Seq("l_partkey"), Seq("l_returnflag"))
      updateWhere(s, t, col("l_orderkey") % 9 === 0,
        Map("l_quantity" -> (col("l_quantity") + 5)))
      deleteWhere(s, t, col("l_returnflag") === "N" &&
        col("l_orderkey") % 11 === 0)
      SnapshotScan.scan(s, t)._1
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("n"),
          graft.Det.r4(sum(col("l_quantity"))).as("qty"))
        .orderBy(col("l_partkey").asc_nulls_first,
          col("l_suppkey").asc_nulls_first)
    }),

    // HIDDEN partitioning (Iceberg partition transforms): the events
    // fact partitions by days(ts) × bucket(8, user_id) with NO
    // materialized day column — labels derive from row values at every
    // staging (create, append, both mutations' rewrites), and raw-ts /
    // raw-user predicates prune through the transforms (suite- and
    // ScaleAudit-asserted; this query proves CONTENT through the whole
    // lifecycle on the hard oracle).
    "q_table_partition_transform" -> ((s, d) => {
      val t = scratch(s, d, "ptf")
      fs(s, t).delete(new Path(t), true)
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      // days(ts) alone here: one file per day keeps the lifecycle's
      // file count ∝ days (the bucket(n,c) composition is exercised —
      // with plan audits — by q_table_bucket_compose and the suite)
      createPartitioned(s, t, ev, Seq("days(ts)"))
      // a shifted tail lands in NEW day partitions a year out
      append(s, t, ev.filter(col("event_id") % 50 === 0)
        .select((col("event_id") + 10000000L).as("event_id"),
          (col("ts") + expr("INTERVAL 365 DAYS")).as("ts"),
          col("user_id"), col("event_type"), col("value")))
      // both mutations prune through days(): only the named days'
      // files rewrite
      deleteWhere(s, t,
        col("ts") >= lit("2024-01-02").cast("timestamp") &&
        col("ts") < lit("2024-01-03").cast("timestamp") &&
        col("event_type") === "click")
      updateWhere(s, t,
        col("ts") >= lit("2024-02-01").cast("timestamp") &&
        col("ts") < lit("2024-02-08").cast("timestamp") &&
        col("user_id") === 7L,
        Map("value" -> (col("value") + 100)))
      read(s, t).orderBy(col("event_id").asc_nulls_first)
    }),

    // Column DEFAULT values (Iceberg-v3 initial-default +
    // write-default): ADD COLUMN ... DEFAULT is metadata-only — rows
    // predating the evolution read the default, a post-evolution batch
    // carries its own values (an explicit NULL stays NULL), and a
    // file-granular rewrite materializes defaults only where it
    // touches. The oracle replays the lifecycle with a CASE over the
    // pre/post union.
    "q_table_default_values" -> ((s, d) => {
      val t = scratch(s, d, "dflt")
      fs(s, t).delete(new Path(t), true)
      val items = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      create(s, t, items, numFiles = 8)
      addColumns(s, t, Seq(
        org.apache.spark.sql.types.StructField("src",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("boost",
          org.apache.spark.sql.types.DoubleType, nullable = true)),
        defaults = Map("src" -> "'legacy'", "boost" -> "1.5"))
      append(s, t, items.filter(col("l_orderkey") % 100 === 0)
        .select((col("l_orderkey") + 60000000L).as("l_orderkey"),
          col("l_linenumber"), col("l_quantity"),
          when(col("l_orderkey") % 200 === 0, lit(null))
            .otherwise(lit("fresh")).cast("string").as("src"),
          lit(2.0).as("boost")))
      updateWhere(s, t, col("l_orderkey") % 500 === 0,
        Map("l_quantity" -> (col("l_quantity") + 1)))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // corpus — total order needs the quantity tiebreaker
      read(s, t).orderBy(col("l_orderkey").asc_nulls_first,
        col("l_linenumber").asc_nulls_first,
        col("l_quantity").asc_nulls_first,
        col("src").asc_nulls_first)
    }),

    // The SQL surface of the table layer: both TVFs in one plain-SQL
    // statement — the current snapshot joined against its own change
    // feed (updated keys carry their 'insert' post-image mark). The
    // oracle derives the same relation from the source table.
    "q_table_sql_tvf" -> ((s, d) => {
      val t = scratch(s, d, "tvf")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      create(s, t, orders, numFiles = 4)
      updateWhere(s, t, col("o_orderkey") % 100 === 0,
        Map("o_orderstatus" -> lit("X")))
      graft.GraftExtensions.register(s)
      s.sql(
        s"""SELECT snap.o_orderkey, snap.o_orderstatus, ch.change_type
           |FROM graft_snapshot('$t') snap
           |LEFT JOIN (
           |  SELECT o_orderkey, change_type
           |  FROM graft_changes('$t', 1, 2)
           |  WHERE change_type = 'insert') ch
           |  ON snap.o_orderkey = ch.o_orderkey
           |ORDER BY snap.o_orderkey ASC NULLS FIRST""".stripMargin)
    }),

    // The SQL DML surface (GraftDml): UPDATE + DELETE + MERGE + INSERT
    // all run THROUGH spark.sql via the graft_dml procedure TVF —
    // Spark's own parser produces the DML plans, GraftDml lowers them
    // onto the file-granular snapshot verbs (file accounting
    // suite-asserted in SnapshotSuite). The oracle replays the same
    // four statements' logical effect in plain SQL.
    "q_table_sql_dml" -> ((s, d) => {
      val t = scratch(s, d, "dml")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      create(s, t, orders, numFiles = 8)
      graft.GraftExtensions.register(s)
      s.sql(s"""SELECT * FROM graft_dml("UPDATE `$t` SET """ +
        """o_orderstatus = 'X', o_totalprice = o_totalprice * 2 """ +
        """WHERE o_orderkey % 100 = 0")""").collect()
      s.sql(s"""SELECT * FROM graft_dml("DELETE FROM `$t` """ +
        """WHERE o_orderkey % 17 = 3")""").collect()
      orders.filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          lit("M").as("o_orderstatus"),
          (col("o_totalprice") + 100000).as("o_totalprice"))
        .union(orders.filter(col("o_orderkey") % 1000 === 7)
          .select((col("o_orderkey") + 10000000).as("o_orderkey"),
            col("o_custkey"), lit("N").as("o_orderstatus"),
            col("o_totalprice")))
        .createOrReplaceTempView("graft_dml_src")
      s.sql(s"""SELECT * FROM graft_dml("MERGE INTO `$t` tg """ +
        """USING graft_dml_src sr ON tg.o_orderkey = sr.o_orderkey """ +
        """WHEN MATCHED THEN UPDATE SET * """ +
        """WHEN NOT MATCHED THEN INSERT *")""").collect()
      orders.filter(col("o_orderkey") % 500 === 11)
        .select((col("o_orderkey") + 20000000).as("o_orderkey"),
          col("o_custkey"), lit("I").as("o_orderstatus"),
          col("o_totalprice"))
        .createOrReplaceTempView("graft_dml_ins")
      s.sql(s"""SELECT * FROM graft_dml("INSERT INTO `$t` """ +
        """SELECT * FROM graft_dml_ins")""").collect()
      read(s, t)
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // CHECK constraints (the Delta ADD CONSTRAINT shape): existing data
    // validated at add time, then every mutation verb enforces the
    // predicate on its staged batch via an observed metric riding the
    // stage write — a violating batch is rejected ATOMICALLY (staged
    // files cleaned, table untouched), a valid one commits. The oracle
    // replays the surviving state: base plus only the valid batch.
    "q_table_constraints" -> ((s, d) => {
      val t = scratch(s, d, "constraints")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      create(s, t, orders, numFiles = 4)
      addConstraint(s, t, "positive_price", "o_totalprice > 0")
      val rejected =
        try {
          append(s, t, orders.limit(100)
            .withColumn("o_totalprice", lit(-1.0)))
          false
        } catch { case _: ConstraintViolationException => true }
      require(rejected, "a violating append must be rejected")
      append(s, t, orders.filter(col("o_orderkey") % 50 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100000))
      read(s, t).orderBy(col("o_orderkey").asc_nulls_first,
        col("o_totalprice").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
    }),

    // Merge-on-read UPDATE: the sparse update commits positions of the
    // old images + a matches-sized batch of new images — every original
    // data file carries over verbatim (SnapshotSuite asserts the
    // superset manifest). The oracle replays the update as plain SQL.
    "q_table_update_vector" -> ((s, d) => {
      val t = scratch(s, d, "uvq")
      fs(s, t).delete(new Path(t), true)
      val items = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
      create(s, t, items, numFiles = 8)
      updateWhereVector(s, t, col("l_orderkey") % 100 === 0,
        Map("l_quantity" -> (col("l_quantity") + 5)))
      read(s, t)
        .orderBy(col("l_orderkey").asc_nulls_first,
          col("l_linenumber").asc_nulls_first,
          col("l_returnflag").asc_nulls_first,
          col("l_quantity").asc_nulls_first)
    }),

    // Bloom point-lookup skipping: the table is NOT clustered on the
    // key (round-robin files — min/max stats span the whole range in
    // every file and prune nothing), yet a point lookup opens ~1 file
    // because each file's bloom sidecar proves absence for the rest.
    // The probe-key list is collected first (a model-bounded handful of
    // values — blooms probe values, not predicates); the oracle replays
    // the same modulus selection as a plain filter.
    "q_table_bloom_skip" -> ((s, d) => {
      val t = scratch(s, d, "bl")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      createBloomIndexed(s, t, orders, Seq("o_orderkey"), numFiles = 8)
      val keys = orders.filter(col("o_orderkey") % 7777 === 0)
        .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
      readWherePoint(s, t, "o_orderkey", keys)
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // WRITE-AUDIT-PUBLISH: a good candidate batch is staged, audited on
    // the EXACT bytes that would go live, and published (metadata-only
    // promote); a bad batch (NULL statuses) is staged, fails the same
    // audit, and is abandoned — never visible to any reader. The final
    // read must equal base + good batch only, which is what the oracle
    // replays.
    "q_table_wap" -> ((s, d) => {
      val t = scratch(s, d, "wp")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      create(s, t, orders, numFiles = 4)
      def audited(batch: DataFrame): Unit = {
        val tok = stageAppend(s, t, batch)
        if (readStaged(s, t, tok)
            .filter(col("o_orderstatus").isNull).count() == 0)
          publishStaged(s, t, tok)
        else abandonStaged(s, t, tok)
        ()
      }
      audited(orders.filter(col("o_orderkey") % 40 === 0)
        .select((col("o_orderkey") + 20000000).as("o_orderkey"),
          lit("W").as("o_orderstatus"), col("o_totalprice")))
      audited(orders.filter(col("o_orderkey") % 55 === 0)
        .select((col("o_orderkey") + 30000000).as("o_orderkey"),
          lit(null).cast("string").as("o_orderstatus"),
          col("o_totalprice")))
      read(s, t).orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Incremental materialized-view maintenance over the change feed:
    // the v1 aggregate is refreshed to v3 by applying ONLY the netted
    // delta (insert rows +1, delete rows -1 — classic signed-delta
    // maintenance), so the refresh reads churn, never the table. The
    // measures are counts and sums of INTEGRAL quantities (exact in
    // doubles), so the incremental result is bit-identical to a full
    // recompute — which is exactly what the oracle computes from the
    // source table, making the hash match the maintenance proof.
    "q_table_incremental_agg" -> ((s, d) => {
      val t = scratch(s, d, "iv")
      fs(s, t).delete(new Path(t), true)
      val items = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
      create(s, t, items, numFiles = 8)
      val view1 = read(s, t, version = Some(1L))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      updateWhere(s, t, col("l_orderkey") % 100 === 0,
        Map("l_quantity" -> (col("l_quantity") + 5)))
      deleteWhere(s, t, col("l_orderkey") % 17 === 3)
      val delta = changesBetween(s, t, 1L, 3L)
        .withColumn("w",
          when(col("change_type") === "insert", lit(1L)).otherwise(lit(-1L)))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("w")).as("dn"),
          sum(col("w") * col("l_quantity")).as("dqty"))
      view1.join(delta, Seq("l_returnflag"), "full_outer")
        .select(col("l_returnflag"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("qty"), lit(0d)) + coalesce(col("dqty"), lit(0d)))
            .as("qty"))
        .filter(col("n") > 0)
        .orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // TWO-TIER (partition-grouped) manifest lifecycle: 19 commits on a
    // 7-label partitioned table cross the grouping threshold at the
    // chain re-anchor (the depth-17 commit re-anchors FULL with ~133
    // files ≥ 48), so the anchor is GROUPED — the lambda REQUIRES that
    // a one-partition scan reads exactly ONE group's metadata
    // (∝ matched partitions, not table files) and performs ZERO
    // directory listings (manifest-stamped file sizes), then returns
    // that partition's rows; the oracle replays the filter in plain
    // SQL — a hash match proves group-pruned planning loses no row
    // and resurrects none.
    "q_table_metadata_tier" -> ((s, d) => {
      val t = scratch(s, d, "mtier")
      fs(s, t).delete(new Path(t), true)
      val items = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      createPartitioned(s, t, items.filter(col("l_orderkey") % 19 === 0),
        Seq("l_linenumber"))
      (1 to 18).foreach(i =>
        append(s, t, items.filter(col("l_orderkey") % 19 === i)))
      val snap = readManifest(s, t, currentVersion(s, t))
      require(snap.files.size >= GroupedManifestMinFiles &&
        snap.cleanGroups.nonEmpty,
        s"the re-anchor must be GROUPED (${snap.files.size} files, " +
          s"${snap.cleanGroups.size} groups)")
      val (df, idx) = SnapshotScan.scan(s, t)
      val out = df.filter(col("l_linenumber") === 3)
        .orderBy(col("l_orderkey").asc_nulls_first)
      out.count() // drive planning so the metadata-tier audit can run
      require(idx.lastMetaGroupsRead == 1,
        s"one matched partition must read ONE group of " +
          s"${snap.cleanGroups.size}, read ${idx.lastMetaGroupsRead}")
      require(idx.lastListedDirs == 0,
        "stamped sizes must plan with zero filesystem listing, " +
          s"listed ${idx.lastListedDirs} dirs")
      require(idx.lastPlannedFiles >= 1 && idx.lastPlannedFiles <= 19 &&
        idx.lastPlannedFiles * 3 < snap.files.size,
        s"label 3 lives in ≤19 of ${snap.files.size} files, planned " +
          s"${idx.lastPlannedFiles}")
      out
    }),

    // CLUSTER-RANGE two-tier manifests (r20): an UNPARTITIONED
    // clustered table's grouped anchor chunks the range-sorted file
    // run into groups carrying per-group cluster-key BOUNDS, so a
    // narrow range predicate admits ~one chunk — planning metadata is
    // ∝ matched key range, not table files, with ZERO directory
    // listings (REQUIREd in-lambda). A post-anchor append rides as a
    // delta whose entries always resolve; the oracle replays the
    // lifecycle in plain SQL — a hash match proves chunk-pruned
    // planning loses no row and resurrects none.
    "q_table_cluster_tier" -> ((s, d) => {
      val t = scratch(s, d, "ctier")
      fs(s, t).delete(new Path(t), true)
      // the cluster key is DOMAIN-BOUNDED (k in [0, 4096)) so the
      // narrow-range predicate below covers the same key fraction at
      // every scale factor — the REQUIRE is scale-independent
      val orders = graft.Tables.orders(s, d)
        .select((col("o_orderkey") % 4096).as("k"), col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"))
      create(s, t, orders, numFiles = 8) // hash layout: nothing prunes
      compact(s, t, clusterBy = Seq("k"), numFiles = 96)
      val snap = readManifest(s, t, currentVersion(s, t))
      require(snap.files.size >= GroupedManifestMinFiles &&
        snap.cleanGroups.nonEmpty,
        s"the clustered anchor must be GROUPED (${snap.files.size} " +
          s"files, ${snap.cleanGroups.size} groups)")
      append(s, t, orders.filter(col("o_orderkey") % 1000 === 1)
        .withColumn("o_orderstatus", lit("Z")))
      val (df, idx) = SnapshotScan.scan(s, t)
      val out = df.filter(col("k") <= 250)
        .orderBy(col("k").asc_nulls_first,
          col("o_orderkey").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
      out.count() // drive planning so the metadata-tier audit can run
      require(idx.lastMetaGroupsRead >= 1 &&
        idx.lastMetaGroupsRead * 3 <= snap.cleanGroups.size,
        s"a narrow key range must read a fraction of " +
          s"${snap.cleanGroups.size} chunk groups, read " +
          s"${idx.lastMetaGroupsRead}")
      require(idx.lastListedDirs == 0,
        "stamped sizes must plan with zero filesystem listing, " +
          s"listed ${idx.lastListedDirs} dirs")
      require(idx.lastPlannedFiles >= 1 &&
        idx.lastPlannedFiles * 3 < snap.files.size,
        s"the range lives in a sliver of ${snap.files.size} files, " +
          s"planned ${idx.lastPlannedFiles}")
      out
    }),

    // Named MATERIALIZED VIEW lifecycle: create the MV (a filtered
    // count/sum aggregate) at v1, run a mixed mutation gauntlet on the
    // source (update, delete, append), refresh — the refresh must
    // engage the INCREMENTAL path (netted change-feed delta, churn-
    // sized IO; asserted) and a second refresh must be a noop (the
    // cdcUpTo mark committed atomically with the contents). The oracle
    // is the FULL recompute of the definition over the logically
    // replayed source — a hash match proves incremental == recompute.
    "q_table_mv" -> ((s, d) => {
      val t = scratch(s, d, "mv_src")
      val m = scratch(s, d, "mv")
      fs(s, t).delete(new Path(t), true)
      fs(s, m).delete(new Path(m), true)
      val items = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"))
      create(s, t, items, numFiles = 8)
      graft.GraftExtensions.register(s)
      s.sql(s"SELECT * FROM graft_create_mv('$m', '$t', " +
        "\"SELECT l_returnflag, count(1) AS n, sum(l_quantity) AS qty " +
        "FROM __source__ WHERE l_orderkey % 3 != 1 " +
        "GROUP BY l_returnflag\")").collect()
      updateWhere(s, t, col("l_orderkey") % 100 === 0,
        Map("l_quantity" -> (col("l_quantity") + 5)))
      deleteWhere(s, t, col("l_orderkey") % 17 === 3)
      append(s, t, items.filter(col("l_orderkey") % 5 === 0))
      val r = s.sql(s"SELECT * FROM graft_refresh_mv('$m')").head()
      require(r.getString(0) == "incremental",
        s"expected the incremental refresh path, got ${r.getString(0)}")
      require(r.getLong(1) == 1L && r.getLong(2) == 4L,
        s"refresh must advance the mark 1 -> 4, got $r")
      val r2 = s.sql(s"SELECT * FROM graft_refresh_mv('$m')").head()
      require(r2.getString(0) == "noop",
        s"a replayed refresh must be exactly-once, got ${r2.getString(0)}")
      read(s, m).orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // MV maintenance beyond count/sum (r20): avg is REWRITTEN to
    // maintained (sum, count) hidden state and min/max merge inserts
    // monotonically while RECOMPUTING only the delete-touched groups
    // (the update touches group A, the delete touches R — both repair
    // paths run; group N merges monotonically). The refresh must still
    // engage the INCREMENTAL path and replay as a noop; the oracle is
    // the full recompute over the logically replayed source, so the
    // hash match proves the avg/min/max maintenance == recompute.
    "q_table_mv_avg" -> ((s, d) => {
      val t = scratch(s, d, "mva_src")
      val m = scratch(s, d, "mva")
      fs(s, t).delete(new Path(t), true)
      fs(s, m).delete(new Path(m), true)
      val items = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      create(s, t, items, numFiles = 8)
      graft.GraftExtensions.register(s)
      s.sql(s"SELECT * FROM graft_create_mv('$m', '$t', " +
        "\"SELECT l_returnflag, count(1) AS n, avg(l_quantity) AS aq, " +
        "min(l_quantity) AS mn, max(l_quantity) AS mx " +
        "FROM __source__ WHERE l_orderkey % 3 != 1 " +
        "GROUP BY l_returnflag\")").collect()
      updateWhere(s, t,
        col("l_returnflag") === "A" && col("l_orderkey") % 100 === 0,
        Map("l_quantity" -> (col("l_quantity") + 5)))
      deleteWhere(s, t,
        col("l_returnflag") === "R" && col("l_orderkey") % 17 === 3)
      append(s, t, items.filter(col("l_orderkey") % 5 === 0))
      val r = s.sql(s"SELECT * FROM graft_refresh_mv('$m')").head()
      require(r.getString(0) == "incremental",
        s"avg/min/max must maintain incrementally, got ${r.getString(0)}")
      require(r.getLong(1) == 1L && r.getLong(2) == 4L,
        s"refresh must advance the mark 1 -> 4, got $r")
      val r2 = s.sql(s"SELECT * FROM graft_refresh_mv('$m')").head()
      require(r2.getString(0) == "noop",
        s"a replayed refresh must be exactly-once, got ${r2.getString(0)}")
      read(s, m).orderBy(col("l_returnflag").asc_nulls_first)
    }),

    // Rollback: restore(v1) after the same two mutations is a
    // metadata-only commit (SnapshotSuite asserts the restored manifest
    // lists v1's files verbatim — no data rewrite); reading the current
    // snapshot must hash-match the ORIGINAL table.
    "q_table_restore" -> ((s, d) => {
      val t = scratch(s, d, "rs")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      create(s, t, orders, numFiles = 8)
      updateWhere(s, t, col("o_orderkey") % 100 === 0,
        Map("o_orderstatus" -> lit("X")))
      deleteWhere(s, t, col("o_orderkey") % 17 === 3)
      restore(s, t, 1L)
      read(s, t)
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Time travel: after the same update+delete commits, version 1 must
    // still read as the ORIGINAL table — the oracle is a plain scan of
    // orders, so a hash match proves the old snapshot is untouched by
    // the two later commits.
    "q_table_timetravel" -> ((s, d) => {
      val t = scratch(s, d, "tt")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      create(s, t, orders, numFiles = 8)
      updateWhere(s, t, col("o_orderkey") % 100 === 0,
        Map("o_orderstatus" -> lit("X")))
      deleteWhere(s, t, col("o_orderkey") % 17 === 3)
      read(s, t, version = Some(1L))
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Clustered compaction (OPTIMIZE ZORDER's role): create a
    // hash-laid-out table (every file spans the whole key range — zero
    // prunable), mutate it, then compact(clusterBy) — the rewrite
    // range-sorts on the key, re-records tight per-file stats, and the
    // lambda ASSERTS a narrow range scan now prunes (inputFiles). The
    // returned frame is the full post-mutation table; the oracle
    // replays the update — a hash match proves re-clustering moved
    // rows without changing any.
    "q_table_recluster" -> ((s, d) => {
      val t = scratch(s, d, "reclus")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      create(s, t, orders, numFiles = 8)
      updateWhere(s, t, col("o_orderkey") % 100 === 0,
        Map("o_orderstatus" -> lit("X")))
      compact(s, t, targetMB = 128, clusterBy = Seq("o_orderkey"),
        numFiles = 4)
      val snap = readManifest(s, t, currentVersion(s, t))
      val planned = readWhereRange(s, t, "o_orderkey", 1L, 1000L)
        .inputFiles.length
      require(planned < snap.files.size,
        s"re-clustered range scan must prune files (read $planned of " +
          s"${snap.files.size})")
      read(s, t).orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // DESCRIBE DETAIL: the identity create + clustered compact
    // lifecycle, read back entirely from the manifest metadata tier.
    // Every returned field is derivable from the source table (the
    // high-water mark is exactly count(*)), so the oracle is a plain
    // constant projection — a hash match proves the metadata the
    // lifecycle committed is the metadata the detail row reports.
    "q_table_detail" -> ((s, d) => {
      val t = scratch(s, d, "detail")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
      createWithIdentity(s, t, orders, idCol = "o_id",
        sortCols = Seq("o_orderkey"))
      compact(s, t, clusterBy = Seq("o_orderkey"), numFiles = 4)
      // the graft_partitions rollup agrees with detail's file count
      // (metadata-tier audit — EXPLAIN-safe TVF, zero data IO)
      graft.GraftExtensions.register(s)
      val roll = s.sql(s"SELECT sum(files) AS f, count(*) AS p " +
        s"FROM graft_partitions('$t')").head()
      require(roll.getLong(0) == 4L && roll.getLong(1) == 1L,
        s"graft_partitions must roll 4 files into the single (null) " +
          s"partition, got $roll")
      detail(s, t).select(col("version"), col("num_files"),
        col("num_delete_files"), col("partition_columns"),
        col("cluster_columns"), col("identity_column"),
        col("identity_hwm"), col("num_constraints"))
    }),

    // Z-ORDER compaction: a TWO-dimension cluster key lays files out
    // as bit-interleaved z-cells, so a narrow predicate on EITHER
    // dimension prunes (lexicographic multi-key sort would cluster
    // only the leading column) — both prunings asserted in the lambda
    // via planned-file counts. The full scan hash-matching the plain
    // source proves the interleave moved rows without changing any.
    "q_table_zorder" -> ((s, d) => {
      val t = scratch(s, d, "zord")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      create(s, t, orders, numFiles = 8)
      compact(s, t, clusterBy = Seq("o_orderkey", "o_custkey"),
        numFiles = 16)
      val snap = readManifest(s, t, currentVersion(s, t))
      val Seq(kLo, kHi, cLo, cHi) = {
        val r = orders.agg(min("o_orderkey"), max("o_orderkey"),
          min("o_custkey"), max("o_custkey")).head()
        Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
      val byKey = readWhereRange(s, t, "o_orderkey",
        kLo, kLo + (kHi - kLo) / 20).inputFiles.length
      val byCust = readWhereRange(s, t, "o_custkey",
        cLo, cLo + (cHi - cLo) / 20).inputFiles.length
      require(byKey < snap.files.size && byCust < snap.files.size,
        s"z-order must prune on both dimensions (key $byKey, cust " +
          s"$byCust of ${snap.files.size})")
      read(s, t).orderBy(col("o_orderkey").asc_nulls_first,
        col("o_custkey").asc_nulls_first,
        col("o_totalprice").asc_nulls_first)
    }),

    // Identity columns (the reference's INTEGER PRIMARY KEY
    // AUTOINCREMENT): create the evens with a generated o_id ordered
    // by o_orderkey, append the odds (ids continue from the manifest
    // high-water mark), read back. The oracle replays the assignment
    // as row_number() per batch offset by the first batch's count —
    // a hash match proves ids are monotonic, gap-free, batch-ordered,
    // and exactly-once across the two commits.
    "q_table_identity" -> ((s, d) => {
      val t = scratch(s, d, "ident")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
      createWithIdentity(s, t, orders.filter(col("o_orderkey") % 2 === 0),
        idCol = "o_id", sortCols = Seq("o_orderkey"))
      append(s, t, orders.filter(col("o_orderkey") % 2 === 1))
      read(s, t).orderBy(col("o_id").asc_nulls_first)
    }),

    // Write-time schema evolution (mergeSchema/autoMerge), both
    // surfaces in one lifecycle: v1 creates the evens WITHOUT o_extra
    // or o_flag; v2 appends the odds carrying NEW column o_extra via
    // the writer option (one atomic commit: schema + data); v3 runs an
    // evolving MERGE whose source carries NEW column o_flag, updating
    // the %10==0 keys. Old files read both new columns as NULL — the
    // CASE expressions in the oracle are exactly that contract.
    "q_table_merge_schema" -> ((s, d) => {
      val t = scratch(s, d, "msch")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
      create(s, t, orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus")), numFiles = 4)
      orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").as("o_extra"))
        .write.format("graft").mode("append")
        .option("mergeSchema", "true").save(t)
      val src = orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("M").as("o_flag"))
      mergeIntoFull(s, t, src, Seq("o_orderkey" -> "o_orderkey"),
        matched = Seq(MergeWhen(None,
          Some(Map("o_flag" -> srcRef("o_flag"))))),
        notMatchedBySource = Nil, notMatched = Nil, mergeSchema = true)
      read(s, t).orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // TIMESTAMP AS OF: same three commits; the manifest mtimes are then
    // pinned to an explicit strictly-increasing clock (the test's clock
    // control — on a production store each commit's own mtime IS the
    // clock) and the read resolves a timestamp strictly between v1 and
    // v2 — landing on v1, the pristine table, which is the oracle.
    "q_table_timetravel_ts" -> ((s, d) => {
      val t = scratch(s, d, "tts")
      val f = fs(s, t)
      f.delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      create(s, t, orders, numFiles = 8)
      updateWhere(s, t, col("o_orderkey") % 100 === 0,
        Map("o_orderstatus" -> lit("X")))
      deleteWhere(s, t, col("o_orderkey") % 17 === 3)
      val t0 = 1700000000000L
      (1L to 3L).foreach(v =>
        f.setTimes(manifestPath(t, v), t0 + (v - 1) * 60000L, -1))
      val v = versionAtTimestamp(s, t, t0 + 30000L)
      require(v == 1L, s"timestamp between v1 and v2 must resolve to " +
        s"v1, got v$v")
      s.read.format("graft")
        .option("timestampAsOf", (t0 + 30000L).toString).load(t)
        .orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // BRANCHES + TAGS, the full ref lifecycle under the hard oracle
    // (the WAP shape generalized to named multi-commit lines —
    // Iceberg branches/tags; the reference's atomic commit discipline,
    // database.py:32, extended to named lines): v1 creates the evens,
    // v2 commits the 4k+1 rows to MAIN, a branch forks at v2 and takes
    // TWO isolated appends (8k+3 then 8k+7 — main must not see either),
    // the branch head is audited through the graft_branch TVF, the
    // pre-publish version is tagged, the branch fast-forward-publishes
    // to v3 (metadata-only), and the result UNIONs the published main
    // with the tag's pinned read. The oracle replays both multisets in
    // plain SQL: published = every orders row, tag = evens + 4k+1.
    "q_table_refs" -> ((s, d) => {
      val t = scratch(s, d, "refs")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      create(s, t, orders.filter(col("o_orderkey") % 2 === 0),
        numFiles = 4)                                        // v1
      append(s, t, orders.filter(col("o_orderkey") % 4 === 1)) // v2
      val preBranch = read(s, t).count()
      createBranch(s, t, "wap")
      appendToBranch(s, t, "wap",
        orders.filter(col("o_orderkey") % 8 === 3))
      appendToBranch(s, t, "wap",
        orders.filter(col("o_orderkey") % 8 === 7))
      // AUDIT on the branch head through the SQL surface; main stays
      // isolated until publish
      graft.GraftExtensions.register(s)
      val audit = s.sql(
        s"SELECT count(*) AS n FROM graft_branch('$t', 'wap')")
        .head().getLong(0)
      require(audit == orders.count(),
        s"branch head must hold every row, got $audit")
      require(read(s, t).count() == preBranch,
        "main must not see branch commits before publish")
      tagVersion(s, t, "prepub", currentVersion(s, t)) // pins v2
      publishBranch(s, t, "wap")                       // v3, FF
      // the branch is consumed; the tag survives — the refs TVF is
      // the audit trail
      val refs = s.sql(s"SELECT ref_type FROM graft_refs('$t')")
        .collect().map(_.getString(0)).toSeq
      require(refs == Seq("tag"),
        s"publish must consume the branch and keep the tag, got $refs")
      read(s, t).select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit("main").as("src"))
        .union(readTag(s, t, "prepub").select(col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"),
          lit("tag").as("src")))
        .orderBy(col("src").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)
    }),

    // SQL DML ON A BRANCH + both publish modes, end to end through the
    // procedure surface (the WAP audit-fix-publish arm the library's
    // withBranch provides, driven entirely from spark.sql): branch
    // `fix` takes an UPDATE and a DELETE via graft_branch_dml — main
    // provably isolated mid-flight — and fast-forward-publishes; then
    // branch `cp` takes an INSERT while MAIN also moves (an ordinary
    // graft_dml INSERT), so its publish needs cherry-pick onto the
    // diverged main (`graft_publish_branch(t, n, true)`). The oracle
    // replays update+delete+both inserts in plain SQL.
    "q_table_branch_dml" -> ((s, d) => {
      val t = scratch(s, d, "brdml")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      create(s, t, orders, numFiles = 8) // v1
      graft.GraftExtensions.register(s)
      s.sql(s"SELECT * FROM graft_create_branch('$t', 'fix')").collect()
      s.sql(s"""SELECT * FROM graft_branch_dml('$t', 'fix', """ +
        s""""UPDATE `$t` SET o_orderstatus = 'Z' """ +
        """WHERE o_orderkey % 100 = 0")""").collect()
      s.sql(s"""SELECT * FROM graft_branch_dml('$t', 'fix', """ +
        s""""DELETE FROM `$t` WHERE o_orderkey % 17 = 3")""").collect()
      // isolation: main still reads the pristine table
      require(read(s, t).count() == orders.count() &&
        read(s, t).filter(col("o_orderstatus") === "Z").count() == 0L,
        "main must not see branch DML before publish")
      s.sql(s"SELECT * FROM graft_publish_branch('$t', 'fix')")
        .collect() // fast-forward (main never moved)
      // cherry-pick leg: branch appends, MAIN moves, publish re-applies
      s.sql(s"SELECT * FROM graft_create_branch('$t', 'cp')").collect()
      s.sql(s"""SELECT * FROM graft_branch_dml('$t', 'cp', """ +
        s""""INSERT INTO `$t` VALUES (910000001, 'B', 1.5)")""")
        .collect()
      s.sql(s"""SELECT * FROM graft_dml("INSERT INTO `$t` """ +
        """VALUES (920000001, 'M', 2.5)")""").collect()
      s.sql(s"SELECT * FROM graft_publish_branch('$t', 'cp', true)")
        .collect()
      read(s, t).orderBy(col("o_orderkey").asc_nulls_first)
    }),

    // Per-column catalog statistics under the hard oracle — the EXACT
    // pieces only (min/max folded from the per-file bounds, null
    // counts summed, fixed-width lengths = the type size): the staged
    // stats pass records them, publishCatalogStats aggregates them
    // into CatalogColumnStat (zero data IO), DESCRIBE EXTENDED <col>
    // surfaces them, and DuckDB recomputes the same values from the
    // corpus. The sketch-union NDV is approximate by design, so it is
    // deliberately NOT in the projection (PlanAuditSuite bounds it).
    "q_table_colstats" -> ((s, d) => {
      val t = scratch(s, d, "colstats")
      fs(s, t).delete(new Path(t), true)
      val orders = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
      createClustered(s, t, orders, "o_orderkey",
        statsCols = Seq("o_orderkey", "o_custkey"))
      val s2 = org.apache.spark.sql.GraftShim.sessionWithExtensions(s,
        e => new graft.GraftExtensions()(e))
      s2.sql("DROP TABLE IF EXISTS graft_q_colstats")
      s2.sql(s"CREATE TABLE graft_q_colstats USING graft LOCATION '$t'")
      GraftDml.analyzeGraftTable(s2, "graft_q_colstats")
      val exact = Set("min", "max", "num_nulls", "avg_col_len",
        "max_col_len")
      val rows = Seq("o_orderkey", "o_custkey").flatMap { c =>
        s2.sql(s"DESCRIBE TABLE EXTENDED graft_q_colstats $c")
          .collect()
          .filter(r => exact(r.getString(0)))
          .map(r => (c, r.getString(0), r.getString(1)))
      }
      import s.implicits._
      rows.toDF("column_name", "info_name", "info_value")
        .orderBy(col("column_name").asc_nulls_first,
          col("info_name").asc_nulls_first)
    })
  )

  val oracle: Map[String, String] = Map(
    // o_totalprice * 2 is an exact IEEE operation (scaling by a power
    // of two only moves the exponent), so the doubled prices hash-match
    "q_table_snapshot" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 100 = 0 THEN 'X' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
        |    ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |WHERE NOT (o_orderkey % 17 = 3)
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_table_timetravel" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_table_timetravel_ts" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_table_detail" ->
      """SELECT CAST(2 AS BIGINT) AS version, 4 AS num_files,
        |  0 AS num_delete_files, '' AS partition_columns,
        |  'o_orderkey' AS cluster_columns, 'o_id' AS identity_column,
        |  count(*) AS identity_hwm, 0 AS num_constraints
        |FROM orders""".stripMargin,
    "q_table_zorder" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST, o_custkey ASC NULLS FIRST,
        |  o_totalprice ASC NULLS FIRST""".stripMargin,
    "q_table_recluster" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 100 = 0 THEN 'X' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  o_totalprice
        |FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_table_identity" ->
      """WITH b1 AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) AS o_id,
        |         o_orderkey, o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |b2 AS (
        |  SELECT (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0)
        |           + row_number() OVER (ORDER BY o_orderkey) AS o_id,
        |         o_orderkey, o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT o_id, o_orderkey, o_orderstatus FROM b1
        |UNION ALL
        |SELECT o_id, o_orderkey, o_orderstatus FROM b2
        |ORDER BY o_id ASC NULLS FIRST""".stripMargin,
    "q_table_merge_schema" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END AS o_extra,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'M' END AS o_flag
        |FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // the logical diff from first principles; *2 is exponent-only IEEE
    "q_table_changes" ->
      """WITH fin AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 100 = 0 THEN 'X' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |  WHERE NOT (o_orderkey % 17 = 3)),
        |base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders)
        |SELECT *, 'insert' AS change_type FROM
        |  (SELECT * FROM fin EXCEPT ALL SELECT * FROM base)
        |UNION ALL
        |SELECT *, 'delete' AS change_type FROM
        |  (SELECT * FROM base EXCEPT ALL SELECT * FROM fin)
        |ORDER BY change_type ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_table_restore" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // snapshot + change feed derived from the source table directly
    "q_table_sql_tvf" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 100 = 0 THEN 'X' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  CASE WHEN o_orderkey % 100 = 0 THEN 'insert' END AS change_type
        |FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // the merge-on-read update replayed in plain SQL
    "q_table_update_vector" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CASE WHEN l_orderkey % 100 = 0 THEN l_quantity + 5
        |    ELSE l_quantity END AS l_quantity
        |FROM lineitem
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |  l_returnflag ASC NULLS FIRST, l_quantity ASC NULLS FIRST""".stripMargin,
    // vector delete + file-granular update replayed in plain SQL; the
    // +5 on an integral-valued double is exact on both engines
    "q_table_delete_vector" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CASE WHEN l_orderkey % 100 = 0 THEN l_quantity + 5
        |    ELSE l_quantity END AS l_quantity
        |FROM lineitem
        |WHERE NOT (l_orderkey % 17 = 3)
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |  l_returnflag ASC NULLS FIRST, l_quantity ASC NULLS FIRST""".stripMargin,
    // the same point set as a plain filter — bloom skipping must never
    // change results, only the files opened
    "q_table_bloom_skip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey % 7777 = 0
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // base + the batch that passed its audit; the abandoned batch must
    // leave no trace
    "q_table_wap" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |UNION ALL
        |SELECT o_orderkey + 20000000, 'W', o_totalprice FROM orders
        |WHERE o_orderkey % 40 = 0
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // the FULL recompute — hash-equal to the engine's delta-maintained
    // view because every measure is integral (exact in doubles)
    "q_table_incremental_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  sum(CASE WHEN l_orderkey % 100 = 0 THEN l_quantity + 5
        |    ELSE l_quantity END) AS qty
        |FROM lineitem
        |WHERE NOT (l_orderkey % 17 = 3)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    // the one-partition read after the 18-commit two-tier lifecycle:
    // the 18 modulus slices union back to the whole table, so the
    // oracle is the plain partition filter — group-pruned planning
    // must lose no row and resurrect none
    "q_table_metadata_tier" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_linenumber = 3
        |ORDER BY l_orderkey ASC NULLS FIRST""".stripMargin,
    // the narrow-range read after the clustered two-tier lifecycle
    // (compact preserves every row; the append adds the 'Z' slice):
    // chunk-pruned planning must lose no row and resurrect none
    "q_table_cluster_tier" ->
      """SELECT k, o_orderkey, o_orderstatus, o_totalprice FROM (
        |  SELECT o_orderkey % 4096 AS k, o_orderkey, o_orderstatus,
        |    o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderkey % 4096 AS k, o_orderkey,
        |    'Z' AS o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 1000 = 1
        |) u
        |WHERE k <= 250
        |ORDER BY k ASC NULLS FIRST, o_orderkey ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST""".stripMargin,
    // the MV definition recomputed in full over the logically replayed
    // source (update as CASE — +5 exact; delete as NOT; append as
    // UNION ALL of the original-valued slice): a hash match proves the
    // INCREMENTAL refresh (old + ins − del over the netted change
    // feed) equals the recompute. Quantities are small integers, so
    // the double sums are order-independent-exact.
    "q_table_mv" ->
      """SELECT l_returnflag, count(1) AS n, sum(l_quantity) AS qty
        |FROM (
        |  SELECT l_orderkey, l_returnflag,
        |    CASE WHEN l_orderkey % 100 = 0 THEN l_quantity + 5
        |      ELSE l_quantity END AS l_quantity
        |  FROM lineitem
        |  WHERE NOT (l_orderkey % 17 = 3)
        |  UNION ALL
        |  SELECT l_orderkey, l_returnflag, l_quantity
        |  FROM lineitem WHERE l_orderkey % 5 = 0
        |) u
        |WHERE l_orderkey % 3 <> 1
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    // the avg/min/max MV definition recomputed in full over the
    // logically replayed source (the update CASE is group-scoped like
    // the engine's gauntlet). Quantities are small integers, so the
    // maintained double sum is exact and the avg ratio is the same
    // IEEE division on both engines; min/max are order-free.
    "q_table_mv_avg" ->
      """SELECT l_returnflag, count(1) AS n, avg(l_quantity) AS aq,
        |  min(l_quantity) AS mn, max(l_quantity) AS mx
        |FROM (
        |  SELECT l_orderkey, l_returnflag,
        |    CASE WHEN l_returnflag = 'A' AND l_orderkey % 100 = 0
        |      THEN l_quantity + 5 ELSE l_quantity END AS l_quantity
        |  FROM lineitem
        |  WHERE NOT (l_returnflag = 'R' AND l_orderkey % 17 = 3)
        |  UNION ALL
        |  SELECT l_orderkey, l_returnflag, l_quantity
        |  FROM lineitem WHERE l_orderkey % 5 = 0
        |) u
        |WHERE l_orderkey % 3 <> 1
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_table_skipping" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 2000
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_table_scan_pushdown" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey BETWEEN 100 AND 1300
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // the surviving state after the rejected + accepted batches: base
    // plus only the valid appended slice (+100000 is one exact double
    // addition). A constraint layer that let the violating batch
    // through — or leaked its staged files into the table — breaks the
    // hash.
    "q_table_constraints" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice + 100000
        |FROM orders WHERE o_orderkey % 50 = 0
        |ORDER BY o_orderkey ASC NULLS FIRST,
        |  o_totalprice ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST""".stripMargin,
    // the two-column-partitioned lifecycle replayed logically over the
    // derived-bucket projection; *2 is exponent-only IEEE
    "q_table_multipart" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    o_orderkey % 4 AS pbucket
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
        |    ELSE o_totalprice END AS o_totalprice,
        |  pbucket
        |FROM base
        |WHERE NOT (o_orderstatus = 'O' AND pbucket = 2)
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // the schema-evolution history replayed logically: rename = alias,
    // drop = omission, widen = CAST, then the post-evolution append
    // and the update CASE over the union
    "q_table_schema_evolution" ->
      """WITH base AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    l_returnflag AS flag
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey + 50000000,
        |    CAST(l_linenumber AS BIGINT) + 10000000000, l_returnflag
        |  FROM lineitem WHERE l_orderkey % 100 = 0)
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN flag = 'R' AND l_orderkey % 50 = 0 THEN 'Q'
        |    ELSE flag END AS flag
        |FROM base
        |ORDER BY l_orderkey ASC NULLS FIRST,
        |  l_linenumber ASC NULLS FIRST, flag ASC NULLS FIRST""".stripMargin,
    // the bucketed fact-fact join replayed as a plain join + the
    // update CASE (the layout changes the PLAN, never the answer)
    "q_table_bucket_join" ->
      """SELECT c_nationkey, count(*) AS n,
        |  floor((sum(CASE WHEN o_orderkey % 10 = 0
        |    THEN o_totalprice + 1 ELSE o_totalprice END))
        |    * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE)
        |    AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey ASC NULLS FIRST""".stripMargin,
    // the composed-layout lifecycle replayed logically: the update
    // CASE (+5 exact), the delete as NOT (…), then the group-by —
    // the layout changes the PLAN (exchange-free), never the answer
    "q_table_bucket_compose" ->
      """SELECT l_partkey, l_suppkey, count(*) AS n,
        |  floor((sum(CASE WHEN l_orderkey % 9 = 0 THEN l_quantity + 5
        |    ELSE l_quantity END)) * 10000 + CAST(0.5 AS DOUBLE))
        |    / CAST(10000 AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE NOT (l_returnflag = 'N' AND l_orderkey % 11 = 0)
        |GROUP BY l_partkey, l_suppkey
        |ORDER BY l_partkey ASC NULLS FIRST,
        |  l_suppkey ASC NULLS FIRST""".stripMargin,
    // the transform-partitioned lifecycle replayed logically: the
    // union with the year-shifted tail, the day-scoped delete as NOT
    // (…), the user-scoped update as a CASE (+100 is an exact IEEE
    // addition) — partitioning changes the LAYOUT, never the answer
    "q_table_partition_transform" ->
      """WITH base AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM events
        |  UNION ALL
        |  SELECT event_id + 10000000, ts + INTERVAL 365 DAY, user_id,
        |    event_type, value
        |  FROM events WHERE event_id % 50 = 0)
        |SELECT event_id, ts, user_id, event_type,
        |  CASE WHEN ts >= TIMESTAMP '2024-02-01'
        |    AND ts < TIMESTAMP '2024-02-08' AND user_id = 7
        |    THEN value + 100 ELSE value END AS value
        |FROM base
        |WHERE NOT (ts >= TIMESTAMP '2024-01-02'
        |  AND ts < TIMESTAMP '2024-01-03' AND event_type = 'click')
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    // the DEFAULT lifecycle replayed logically: pre-evolution rows get
    // the declared literals, the post-evolution append its own values
    // (explicit NULL preserved), then the update CASE over the union
    "q_table_default_values" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    'legacy' AS src, CAST(1.5 AS DOUBLE) AS boost
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey + 60000000, l_linenumber, l_quantity,
        |    CASE WHEN l_orderkey % 200 = 0 THEN NULL ELSE 'fresh' END,
        |    CAST(2.0 AS DOUBLE)
        |  FROM lineitem WHERE l_orderkey % 100 = 0)
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_orderkey % 500 = 0 THEN l_quantity + 1
        |    ELSE l_quantity END AS l_quantity,
        |  src, boost
        |FROM base
        |ORDER BY l_orderkey ASC NULLS FIRST,
        |  l_linenumber ASC NULLS FIRST,
        |  l_quantity ASC NULLS FIRST, src ASC NULLS FIRST""".stripMargin,
    // the full-clause MERGE replayed as a CASE over a LEFT JOIN (clause
    // order = CASE order — matched branches first, NMBS branches under
    // the NULL side) plus an anti-join for the conditional inserts;
    // *2 is exponent-only IEEE so double math matches across engines
    "q_table_merge_full" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 20 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 30000000, o_custkey, o_orderstatus,
        |    o_totalprice
        |  FROM orders WHERE o_orderkey % 500 = 7),
        |merged AS (
        |  SELECT t.o_orderkey, t.o_custkey,
        |    CASE
        |      WHEN s.o_orderkey IS NOT NULL AND t.o_totalprice < 150000
        |        THEN 'U'
        |      WHEN s.o_orderkey IS NULL AND t.o_orderkey % 777 = 0
        |        THEN 'Z'
        |      ELSE t.o_orderstatus END AS o_orderstatus,
        |    CASE
        |      WHEN s.o_orderkey IS NOT NULL AND t.o_totalprice < 150000
        |        THEN s.o_totalprice * 2
        |      ELSE t.o_totalprice END AS o_totalprice,
        |    CASE
        |      WHEN s.o_orderkey IS NOT NULL
        |        AND NOT (t.o_totalprice < 150000) THEN 1
        |      ELSE 0 END AS del
        |  FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM merged WHERE del = 0
        |UNION ALL
        |SELECT s.o_orderkey, s.o_custkey, 'N', s.o_totalprice
        |FROM src s LEFT JOIN orders t ON s.o_orderkey = t.o_orderkey
        |WHERE t.o_orderkey IS NULL AND s.o_orderkey % 8 = 7
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // the named-table DML sequence replayed in plain SQL: update +
    // delete, then the INSERT rows (disjoint +20M key range), then the
    // key-equality upsert against that state; *2 is exponent-only
    // IEEE, +100000 a single exact addition — both deterministic
    // across engines
    "q_table_catalog" ->
      """WITH afterud AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 100 = 0 THEN 'X' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |  WHERE NOT (o_orderkey % 17 = 3)),
        |afterins AS (
        |  SELECT * FROM afterud
        |  UNION ALL
        |  SELECT o_orderkey + 20000000, o_custkey, 'I', o_totalprice
        |  FROM orders WHERE o_orderkey % 500 = 11),
        |src AS (
        |  SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
        |    o_totalprice + 100000 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 50 = 0)
        |SELECT b.o_orderkey,
        |  coalesce(s.o_custkey, b.o_custkey) AS o_custkey,
        |  coalesce(s.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
        |  coalesce(s.o_totalprice, b.o_totalprice) AS o_totalprice
        |FROM afterins b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey
        |UNION ALL
        |SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice
        |FROM src s LEFT JOIN afterins b ON b.o_orderkey = s.o_orderkey
        |WHERE b.o_orderkey IS NULL
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // the four SQL DML statements' logical effect replayed in plain
    // SQL: update+delete (as q_table_snapshot), the key-equality
    // upsert (as q_table_merge) against the post-update/delete state,
    // then the appended INSERT rows (disjoint key range — +20M);
    // *2 is exponent-only IEEE, +100000 a single exact addition
    "q_table_sql_dml" ->
      """WITH afterud AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 100 = 0 THEN 'X' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |  WHERE NOT (o_orderkey % 17 = 3)),
        |src AS (
        |  SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
        |    o_totalprice + 100000 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice
        |  FROM orders WHERE o_orderkey % 1000 = 7)
        |SELECT b.o_orderkey,
        |  coalesce(s.o_custkey, b.o_custkey) AS o_custkey,
        |  coalesce(s.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
        |  coalesce(s.o_totalprice, b.o_totalprice) AS o_totalprice
        |FROM afterud b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey
        |UNION ALL
        |SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice
        |FROM src s LEFT JOIN afterud b ON b.o_orderkey = s.o_orderkey
        |WHERE b.o_orderkey IS NULL
        |UNION ALL
        |SELECT o_orderkey + 20000000, o_custkey, 'I', o_totalprice
        |FROM orders WHERE o_orderkey % 500 = 11
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // o_totalprice + 100000 is one IEEE double addition — deterministic
    // and identical across engines
    "q_table_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |src AS (
        |  SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
        |    o_totalprice + 100000 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice
        |  FROM orders WHERE o_orderkey % 1000 = 7)
        |SELECT b.o_orderkey,
        |  coalesce(s.o_custkey, b.o_custkey) AS o_custkey,
        |  coalesce(s.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
        |  coalesce(s.o_totalprice, b.o_totalprice) AS o_totalprice
        |FROM base b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey
        |UNION ALL
        |SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice
        |FROM src s LEFT JOIN base b ON b.o_orderkey = s.o_orderkey
        |WHERE b.o_orderkey IS NULL
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // published main = v1 evens + v2 4k+1 + the branch's 8k+3 and 8k+7
    // appends = EVERY orders row; the tag pins v2 = evens + 4k+1
    "q_table_refs" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, 'main' AS src
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice, 'tag' AS src
        |FROM orders WHERE o_orderkey % 2 = 0 OR o_orderkey % 4 = 1
        |ORDER BY src ASC NULLS FIRST, o_orderkey ASC NULLS FIRST"""
        .stripMargin,
    // branch `fix`'s UPDATE + DELETE land via fast-forward publish;
    // branch `cp`'s INSERT and main's own INSERT both land via
    // cherry-pick onto the diverged main
    "q_table_branch_dml" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 100 = 0 THEN 'Z'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice
        |FROM orders WHERE o_orderkey % 17 <> 3
        |UNION ALL
        |SELECT CAST(910000001 AS BIGINT), 'B', CAST(1.5 AS DOUBLE)
        |UNION ALL
        |SELECT CAST(920000001 AS BIGINT), 'M', CAST(2.5 AS DOUBLE)
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    // the exact column-stat pieces recomputed from the corpus: bigint
    // columns carry type-size lengths (8), zero nulls, and the folded
    // per-file bounds equal the plain aggregates
    "q_table_colstats" ->
      """WITH stats AS (
        |  SELECT 'o_orderkey' AS column_name,
        |    CAST(min(o_orderkey) AS VARCHAR) AS mn,
        |    CAST(max(o_orderkey) AS VARCHAR) AS mx
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey',
        |    CAST(min(o_custkey) AS VARCHAR),
        |    CAST(max(o_custkey) AS VARCHAR)
        |  FROM orders)
        |SELECT column_name, info_name, info_value FROM (
        |  SELECT column_name, 'min' AS info_name, mn AS info_value
        |  FROM stats
        |  UNION ALL SELECT column_name, 'max', mx FROM stats
        |  UNION ALL SELECT column_name, 'num_nulls', '0' FROM stats
        |  UNION ALL SELECT column_name, 'avg_col_len', '8' FROM stats
        |  UNION ALL SELECT column_name, 'max_col_len', '8' FROM stats)
        |ORDER BY column_name ASC NULLS FIRST,
        |  info_name ASC NULLS FIRST""".stripMargin
  )
}
