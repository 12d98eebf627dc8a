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
  *    /tmp while a live concurrent run's root (minutes old) is never
  *    touched.
  */
private[graft] object StagePaths {

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  lazy val root: String = {
    val dir = new java.io.File("/tmp")
    val dayAgo = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(dir.listFiles).foreach(_.foreach { f =>
      if (f.getName.startsWith("graft_stage") && f.isDirectory &&
        f.lastModified() < dayAgo) rmTree(f)
    })
    s"/tmp/graft_stage_${java.util.UUID.randomUUID().toString.take(8)}"
  }
}
