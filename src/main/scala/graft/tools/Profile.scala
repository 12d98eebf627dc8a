package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-job profiler: runs the named queries once (after the same warmup
  * classes Bench pays untimed) and prints every Spark job's wall time,
  * task count and description, plus the query's total wall and the
  * driver-side gap (wall not covered by any job = planning/manifest IO).
  * Measurement aid for the optimization rounds — finds WHERE a
  * lifecycle query's seconds go (which verb, which sub-job, or pure
  * driver/filesystem time between jobs).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalScratch.sparkLocalDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, desc: String, start: Long,
        var end: Long = 0L, var tasks: Int = 0, var stages: Int = 0,
        var names: List[String] = Nil)
    val jobs = new scala.collection.concurrent.TrieMap[Int, JobRec]
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val run = new java.util.concurrent.atomic.AtomicLong
    val deser = new java.util.concurrent.atomic.AtomicLong
    val gc = new java.util.concurrent.atomic.AtomicLong
    val cpu = new java.util.concurrent.atomic.AtomicLong
    val fetchWait = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val resSer = new java.util.concurrent.atomic.AtomicLong
    val perStage = new scala.collection.concurrent.TrieMap[
      Int, Array[java.util.concurrent.atomic.AtomicLong]]
    val stageNames = new scala.collection.concurrent.TrieMap[Int, String]
    def resetMetrics(): Unit = {
      Seq(run, deser, gc, cpu, fetchWait,
        shufWrite, resSer).foreach(_.set(0L))
      perStage.clear(); stageNames.clear()
    }
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, d, System.nanoTime()))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = System.nanoTime())
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          run.addAndGet(m.executorRunTime)
          deser.addAndGet(m.executorDeserializeTime)
          gc.addAndGet(m.jvmGCTime)
          cpu.addAndGet(m.executorCpuTime / 1000000L)
          fetchWait.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          shufWrite.addAndGet(m.shuffleWriteMetrics.writeTime / 1000000L)
          resSer.addAndGet(m.resultSerializationTime)
          val rec = perStage.getOrElseUpdate(e.stageId,
            Array.fill(4)(new java.util.concurrent.atomic.AtomicLong))
          rec(0).addAndGet(m.executorRunTime)
          rec(1).addAndGet(m.executorCpuTime / 1000000L)
          rec(2).addAndGet(m.executorDeserializeTime)
          rec(3).incrementAndGet()
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // attribute stages/tasks to the most recent unfinished job; a
        // local profiler runs queries serially so this is accurate
        stageNames.put(e.stageInfo.stageId, e.stageInfo.name.take(80))
        val open = jobs.values.filter(_.end == 0L)
        if (open.nonEmpty) {
          val j = open.maxBy(_.start)
          j.stages += 1
          j.tasks += e.stageInfo.numTasks
          j.names ::= e.stageInfo.name.take(60)
        }
      }
    }

    // same untimed warmup classes as Bench so the profile reflects the
    // steady-state shape Bench times
    try SparkEntry.entry(spark).count()
    catch { case t: Throwable => System.err.println(s"warmup: $t") }
    graft.Tables.names.foreach { n =>
      try {
        val df = if (n == "events") graft.Tables.events(spark, sfDir)
                 else graft.Tables.load(spark, sfDir, n)
        df.count(); ()
      } catch { case t: Throwable => System.err.println(s"warmup $n: $t") }
    }
    Seq("q_pdf_tables", "q_multimodal_frames", "q_multimodal_audio",
        "q_dedup_minhash", "q_rad_relational_full").foreach { q =>
      try { SparkEntry.queries(q)(spark, sfDir).count(); () }
      catch { case t: Throwable => System.err.println(s"warmup $q: $t") }
    }
    try {
      import org.apache.spark.sql.functions._
      val t = s"/tmp/graft_prof_warm_${spark.sparkContext.applicationId}"
      val p = new org.apache.hadoop.fs.Path(t)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.delete(p, true)
      val df = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      graft.sources.SnapshotTable.create(spark, t, df, numFiles = 4)
      graft.sources.SnapshotTable.updateWhere(spark, t,
        col("id") % 100 === 0, Map("k" -> lit(0L)))
      graft.sources.SnapshotTable.read(spark, t).count()
      f.delete(p, true); ()
    } catch { case t: Throwable => System.err.println(s"warmup snap: $t") }

    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      // one untimed rep first: the profiled rep then shows the
      // steady-state (warm-cache) shape Bench's min-of-N reports
      try { SparkEntry.queries(name)(spark, sfDir).count(); () }
      catch { case t: Throwable => System.err.println(s"rep0 $name: $t") }
      jobs.clear(); order.clear(); resetMetrics()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a moment to drain
      Thread.sleep(400)
      val recs = {
        val it = order.iterator()
        val b = Vector.newBuilder[JobRec]
        while (it.hasNext) jobs.get(it.next()).foreach(b += _)
        b.result()
      }
      val jobSum = recs.map(r =>
        if (r.end > 0) (r.end - r.start) / 1e9 else 0.0).sum
      println(f"\n===== $name%s wall=$wall%.3f s, ${recs.size}%d jobs, " +
        f"job-covered=$jobSum%.3f s, driver-gap=${wall - jobSum}%.3f s =====")
      println(f"  tasks: run=${run.get / 1000.0}%.2f s " +
        f"cpu=${cpu.get / 1000.0}%.2f s gc=${gc.get / 1000.0}%.2f s " +
        f"deser=${deser.get / 1000.0}%.2f s " +
        f"fetchWait=${fetchWait.get / 1000.0}%.2f s " +
        f"shufWrite=${shufWrite.get / 1000.0}%.2f s " +
        f"resSer=${resSer.get / 1000.0}%.2f s")
      perStage.toSeq.sortBy(-_._2(0).get).take(8).foreach {
        case (sid, a) =>
          println(f"  stage $sid%4d run=${a(0).get / 1000.0}%7.2f " +
            f"cpu=${a(1).get / 1000.0}%7.2f deser=${a(2).get / 1000.0}%7.2f " +
            f"tasks=${a(3).get}%4d  ${stageNames.getOrElse(sid, "?")}%s")
      }
      recs.foreach { r =>
        val w = if (r.end > 0) (r.end - r.start) / 1e9 else -1.0
        println(f"  job ${r.id}%4d  $w%8.3f s  stages=${r.stages}%2d " +
          f"tasks=${r.tasks}%4d  ${r.desc.take(60)}%s  " +
          f"[${r.names.reverse.mkString(" | ")}%s]")
      }
    }
    spark.stop()
  }
}
