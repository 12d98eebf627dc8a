package graft

/** Spark local-dir (shuffle/spill/cache scratch) selection for the
  * bench session.
  *
  * Measured on this container (guide §2.1 "local disk bandwidth for
  * shuffle files can be the tighter limit — check both"): map tasks of
  * small shuffle stages spend ~80% of their runtime BLOCKED in shuffle
  * file creation on the VM's journaled ext4 (q_graph_triangles: 60 s
  * of 75 task-seconds in shuffle write for a 3.5k-row graph — the
  * per-map data+index+checksum file creates serialize on the journal
  * under concurrent stages). Shuffle scratch is transient and
  * recomputable, so it belongs on the fastest local device: NVMe on a
  * real cluster, the RAM-backed /dev/shm in this container (128 GiB,
  * orders of magnitude above the bench's shuffle footprint).
  *
  * Parameterized: SPARK_GRAFT_LOCAL_DIR overrides; when unset, a
  * /dev/shm/graft_spark_local scratch is used if writable, else the
  * JVM tmpdir (Spark's own default). Spark creates per-app
  * blockmgr-<uuid> subdirs inside and removes them at shutdown; stale
  * siblings from killed runs older than a day are reaped here the same
  * way StagePaths reaps staging roots, so crashed runs cannot pin RAM.
  */
private[graft] object LocalScratch {

  def sparkLocalDir(): String = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val root = new java.io.File(shm, "graft_spark_local")
      root.mkdirs()
      // reap dead runs' scratch (Spark clears its own at clean stop;
      // killed runs leave blockmgr/spark-* trees behind in RAM)
      val dayAgo = System.currentTimeMillis() - 24L * 3600 * 1000
      Option(root.listFiles).foreach(_.foreach { f =>
        if (f.isDirectory && f.lastModified() < dayAgo) StagePaths.rmTree(f)
      })
      root.getAbsolutePath
    } else System.getProperty("java.io.tmpdir", "/tmp")
  })
}
