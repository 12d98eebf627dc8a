package org.apache.spark.sql

import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** The snapshot-table CHANGE FEED as a first-class Structured
  * Streaming source: `spark.readStream.format("graft").load(path)`.
  *
  * Offsets ARE snapshot versions. The engine checkpoints them in its
  * offset log like any other source, so a restarted query resumes from
  * the exact committed version — exactly-once with zero bookkeeping in
  * user code (the property the previous rate-source + foreachBatch
  * poller could not offer: its cursor lived in driver memory and reset
  * on restart). Each micro-batch is `changesBetween(startV, endV)` —
  * manifest-diff files only, IO ∝ churn — with `fromVersion = 0`
  * (the default) emitting the full starting snapshot as an initial
  * `insert` batch first, the Delta `startingVersion` semantics.
  *
  * This is the v1 `Source` integration shape (the Delta OSS lineage):
  * `getBatch` can return an arbitrary Catalyst-planned DataFrame —
  * the change feed is a JOIN/EXCEPT-ALL plan over pruned file sets,
  * not a file list, so the row-at-a-time DSv2 `PartitionReader`
  * contract would force either a driver collect per batch or a
  * hand-rolled parquet reader. The file sits in the
  * `org.apache.spark.sql` package for the same `private[sql]` bridge
  * reason as [[GraftShim]]: `internalCreateDataFrame(isStreaming =
  * true)` is how a v1 source hands the engine a streaming-tagged
  * frame.
  *
  * The schema is pinned at stream start (table schema + `change_type`);
  * additive evolution mid-stream reads missing new columns as absent
  * from the feed until restart, like Delta.
  */
final class GraftChangeSource(spark: SparkSession, table: String,
    base: Long, override val schema: StructType,
    maxVersionsPerBatch: Option[Long] = None,
    maxBytesPerBatch: Option[Long] = None,
    metadataPath: Option[String] = None) extends Source {

  private def longOf(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  private val rateCapped =
    maxVersionsPerBatch.isDefined || maxBytesPerBatch.isDefined

  // The catch-up clamp anchors at the highest version this source has
  // handed the engine. Restart safety: with a rate cap configured, an
  // in-memory-only anchor would be UNSAFE — when the last batch was
  // fully committed before the restart, the engine never replays
  // getBatch, so the first getOffset would anchor at `base` and could
  // return an offset BELOW the checkpointed one; the engine then runs
  // and commits an empty (to <= from) batch at the regressed offset,
  // and the NEXT batch spans (regressed, new], re-emitting already-
  // delivered versions. So when a cap is configured the anchor also
  // persists in the source's own checkpoint metadata dir (the v1
  // `metadataPath` contract, the same place Delta keeps its source
  // init state) on every getBatch, and seeds from there at restart —
  // monotonic, so a torn write at worst under-anchors back to the
  // engine-replay recovery path (one empty micro-batch, never a
  // regression past a committed offset, because the replay getBatch
  // re-seats from the checkpointed range first).
  @volatile private var lastEnd: Option[Long] = loadAnchor()

  private def anchorFile: Option[org.apache.hadoop.fs.Path] =
    if (!rateCapped) None
    else metadataPath.map(p =>
      new org.apache.hadoop.fs.Path(p, "graft-rate-anchor"))

  private def loadAnchor(): Option[Long] = anchorFile.flatMap { p =>
    try {
      val f = p.getFileSystem(
        spark.sessionState.newHadoopConf())
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try {
          // read to EOF — a single read() may return fewer bytes than
          // available on Hadoop streams, and parsing a truncated number
          // ("12" -> "1") silently under-anchors
          val bos = new java.io.ByteArrayOutputStream(64)
          val buf = new Array[Byte](64)
          var n = in.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
          Some(new String(bos.toByteArray, "UTF-8").trim.toLong)
        } finally in.close()
      }
    } catch { case _: Exception => None } // unreadable/torn -> replay path
  }

  private def persistAnchor(v: Long): Unit = anchorFile.foreach { p =>
    try {
      val f = p.getFileSystem(spark.sessionState.newHadoopConf())
      // tmp + rename (the manifest-commit discipline): an in-place
      // overwrite torn mid-write leaves an unparseable anchor, and on
      // a restart whose last batch WAS committed (no getBatch replay
      // to re-seat lastEnd) the source would re-anchor at `base` and
      // re-emit delivered versions
      val tmp = new org.apache.hadoop.fs.Path(
        p.getParent, s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      if (!f.rename(tmp, p)) { // rename-over-existing (local FS): swap
        f.delete(p, false)
        if (!f.rename(tmp, p)) f.delete(tmp, false)
      }
    } catch { case _: Exception => () } // best-effort; replay recovers
  }

  /** Rate control (Delta's maxFilesPerTrigger/maxBytesPerTrigger
    * intent at version granularity): a stream that fell N versions
    * behind drains in bounded micro-batches instead of one unbounded
    * catch-up batch. The version cap is pure offset arithmetic; the
    * BYTES cap additionally walks the pending versions' manifest
    * diffs (metadata tier — one manifest + one batched listStatus per
    * pending version, amortized O(backlog) across the whole catch-up)
    * and stops before the version whose added files would push the
    * batch past the budget — always advancing at least one version,
    * so a single oversized commit still drains. The `fromVersion=0`
    * initial-snapshot batch is one unit by construction (there is no
    * diff to split) — the caps bound WHICH version it snapshots, not
    * its size.
    */
  override def getOffset: Option[Offset] = {
    val v = graft.sources.SnapshotTable.currentVersion(spark, table)
    val anchor = math.max(lastEnd.getOrElse(base), base)
    var capped = maxVersionsPerBatch match {
      case Some(n) => math.min(v, anchor + n)
      case None => v
    }
    maxBytesPerBatch.foreach { cap =>
      if (anchor >= 1 && capped > anchor + 1) {
        try {
          var acc = 0L
          var end = anchor
          var prev = graft.sources.SnapshotTable
            .readManifest(spark, table, anchor).files.toSet
          var stop = false
          while (!stop && end < capped) {
            val next = graft.sources.SnapshotTable
              .readManifest(spark, table, end + 1).files
            acc += graft.sources.SnapshotTable.bytesOfFiles(spark,
              table, next.filterNot(prev))
            if (acc > cap && end > anchor) stop = true
            else { end += 1; prev = next.toSet }
          }
          capped = end
        } catch {
          // an expired anchor (retention floor moved past it) cannot
          // be diff-walked — fall back to the version cap; the batch
          // read itself resolves what is actually readable
          case _: IllegalArgumentException => ()
        }
      }
    }
    if (capped <= base) None else Some(LongOffset(capped))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(longOf).getOrElse(base)
    val to = longOf(end)
    val seated = math.max(lastEnd.getOrElse(Long.MinValue),
      math.max(from, to))
    lastEnd = Some(seated)
    persistAnchor(seated)
    val batch =
      if (to <= from)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
      else if (from == 0L)
        // stream-from-birth: the whole first visible snapshot is the
        // initial insert batch (there is no v0 manifest to diff)
        graft.sources.SnapshotTable.read(spark, table, Some(to))
          .withColumn("change_type", lit("insert"))
      else
        graft.sources.SnapshotTable.changesBetween(spark, table, from, to)
    val aligned = batch.select(
      schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq: _*)
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(
      aligned.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"GraftChangeSource[$table, from v$base]"
}

/** The BRANCH change feed: `readStream.format("graft")
  * .option("branch", name).load(path)` tails a branch's staged commit
  * sequence — the audit arm of a continuous streaming WAP loop, which
  * otherwise must poll the branch with batch reads. Offsets ARE branch
  * head SEQUENCES (checkpointed like any source offset, so a restart
  * resumes exactly). The first batch emits the branch content at the
  * current head as `insert` rows; each later batch is the file-set /
  * DV diff between two staged heads (churn-sized IO, the same differ
  * as the main feed).
  *
  * `publishBranch(retainBranch = true)` is SURVIVED: the re-seed keeps
  * the prior head manifest, so the cross-publish diff is computable —
  * empty on a fast-forward, main's extra files on a cherry-pick. A
  * DROPPED branch (or a lagging consumer whose sequence an older
  * re-seed collected) fails loudly instead of silently re-snapshotting.
  */
final class GraftBranchChangeSource(spark: SparkSession, table: String,
    branch: String, override val schema: StructType) extends Source {

  private def longOf(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  private def headSeq: Int =
    graft.sources.SnapshotTable.branchHeadSeqOf(spark, table, branch)
      .getOrElse(throw new IllegalStateException(
        s"branch $branch on $table no longer exists — it was dropped " +
          "or fully published; stop the audit stream"))

  override def getOffset: Option[Offset] = Some(LongOffset(headSeq.toLong))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = longOf(end).toInt
    val batch = start.map(longOf(_).toInt) match {
      case Some(from) if to <= from =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case Some(from) =>
        graft.sources.SnapshotTable.branchChangesBetween(spark, table,
          branch, from, to)
      case None =>
        // stream-from-birth: the branch head IS the initial batch
        graft.sources.SnapshotTable.readBranchAt(spark, table, branch, to)
          .withColumn("change_type", lit("insert"))
    }
    val aligned = batch.select(
      schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq: _*)
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(
      aligned.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"GraftBranchChangeSource[$table @ $branch]"
}
