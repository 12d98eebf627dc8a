package graft

/** Process-scoped staging root shared by every ORACLE-READ staged query
  * (q_scan_csv, q_scan_json, q_rad_relational, q_rad_relational_full):
  * the Spark side writes parquet/csv/json here, and the DuckDB oracle —
  * whose SQL interpolates the same literal and is dumped from the same
  * JVM by Verify — reads it back, typically AFTER this JVM has exited
  * (the driver runs the oracle as a separate process). Two constraints
  * follow:
  *
  *  - the path must be unique per process, so concurrent driver/bench/
  *    verify runs can never interleave a mode("overwrite") write with
  *    another process's oracle read (the round-8 race);
  *  - the tree must NOT be deleted at JVM shutdown — the oracle still
  *    needs it. Cleanup is instead age-gated at first use: sibling
  *    graft_stage_* roots untouched for a day belong to long-dead runs
  *    and are removed, so repeated runs cannot accumulate corpora in
  *    /tmp. Every [[root]] access REFRESHES the live tree's mtime, so
  *    even a run alive longer than the gate is never reaped by a
  *    younger sibling process (the round-9 race).
  */
private[graft] object StagePaths {

  /** Delete a tree WITHOUT following symlinks: walkFileTree does not
    * follow links unless asked, so a link planted inside (or as) a
    * stale staging dir on the shared /tmp is deleted as a link entry —
    * its target is never traversed (the classic tmp-cleaner symlink
    * attack that java.io.File recursion falls for).
    */
  private[graft] def rmTree(f: java.io.File): Unit = {
    import java.nio.file._
    import java.nio.file.attribute.BasicFileAttributes
    try {
      if (Files.isSymbolicLink(f.toPath)) { Files.deleteIfExists(f.toPath); () }
      else Files.walkFileTree(f.toPath, new SimpleFileVisitor[Path] {
        override def visitFile(p: Path,
            a: BasicFileAttributes): FileVisitResult = {
          Files.deleteIfExists(p); FileVisitResult.CONTINUE
        }
        override def visitFileFailed(p: Path,
            e: java.io.IOException): FileVisitResult =
          FileVisitResult.CONTINUE
        override def postVisitDirectory(p: Path,
            e: java.io.IOException): FileVisitResult = {
          Files.deleteIfExists(p); FileVisitResult.CONTINUE
        }
      })
      ()
    } catch { case _: Exception => () }
  }

  private lazy val createdRoot: String = {
    val dir = new java.io.File("/tmp")
    val dayAgo = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(dir.listFiles).foreach(_.foreach { f =>
      if (f.getName.startsWith("graft_stage") && f.isDirectory &&
        f.lastModified() < dayAgo) rmTree(f)
    })
    s"/tmp/graft_stage_${java.util.UUID.randomUUID().toString.take(8)}"
  }

  /** The staging root. Each access touches the tree's mtime (once it
    * exists), keeping a long-lived run on the young side of every
    * sibling's age gate for as long as it is actually staging.
    */
  def root: String = {
    val r = createdRoot
    val f = new java.io.File(r)
    if (f.exists) { f.setLastModified(System.currentTimeMillis()); () }
    r
  }
}
