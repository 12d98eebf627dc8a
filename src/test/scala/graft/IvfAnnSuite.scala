package graft

import graft.operators.IvfAnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfAnnSuite extends AnyFunSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import SparkFixture._

  test("IVF ANN returns valid ranked neighbors with sane recall") {
    val ivf = SparkEntry.queries("q_sim_ann_ivf")(spark, sf).collect()
    assert(ivf.nonEmpty)
    // structure: ranks 1..5 per query, no self-matches
    ivf.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 5)
      assert(r.getLong(0) != r.getLong(2))
    }
    // no ANN neighbor can beat the brute-force best
    val brute = SparkEntry.queries("q_sim_topk_cosine")(spark, sf)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    ivf.foreach { r =>
      brute.get(r.getLong(0)).foreach { best =>
        assert(r.getDouble(3) <= best + 1e-9)
      }
    }
    // recall@5 vs brute force: probing 2/16 cells should still find a
    // fair share of true neighbors on smooth random data
    val bruteSets = SparkEntry.queries("q_sim_topk_cosine")(spark, sf)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val ivfSets = ivf.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recalls = bruteSets.collect {
      case (q, bs) if ivfSets.contains(q) =>
        (bs & ivfSets(q)).size.toDouble / bs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall@5 $mean suspiciously low")
  }

  test("the capped Lloyd fit sample covers the corpus at test scale — " +
      "model parity with an unbounded fit") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    assert(e.count() <= 65536L,
      "corpus outgrew the default cap; parity claim needs revisiting")
    val (_, capped) = IvfAnn.assign(e, k = 8, iters = 2)
    val (_, unbounded) = IvfAnn.assign(e, k = 8, iters = 2,
      maxTrain = Int.MaxValue)
    assert(capped.length === unbounded.length)
    capped.zip(unbounded).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b),
        "a cap that covers the corpus must not change the model")
    }
  }

  test("persisted IvfIndex search matches the inline query path exactly") {
    import graft.operators.{IvfAnn, IvfIndex}
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    val e = Tables.embeddings(spark, sf)
    IvfIndex.fit(e, k = 16, iters = 2, path)
    val loaded = IvfIndex.load(spark, path)
    val got = IvfIndex.search(spark, loaded,
        e.filter(col("vec_id") < 10), nProbe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val inline = IvfAnn.query(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == inline,
      "same deterministic seeding must yield identical neighbors")
    // the on-disk layout IS the inverted file: one directory per cell
    val cells = new java.io.File(path + "/vectors").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cells.nonEmpty, "vectors must be partitioned by cell")
    // and the search scan proves the pruning: only probed cell
    // directories are read (literal partition filter from the bounded
    // probe-cell set)
    val search = IvfIndex.search(spark, loaded,
      e.filter(col("vec_id") < 10), nProbe = 2, topK = 5)
    search.collect()
    val scans = collectWithSubqueries(search.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("vectors")) => f
    }
    assert(scans.nonEmpty, "expected a file scan over the vectors dir")
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        "vector scan must carry a partition filter on cell")
      assert(f.relation.partitionSchema.fieldNames.contains("cell"))
    }
  }

  test("IvfIndex.append makes new vectors searchable without a re-fit") {
    import graft.operators.IvfIndex
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft_ivfa").toString + "/idx"
    val e = Tables.embeddings(spark, sf)
    val standing = e.filter(col("vec_id") % 5 =!= 0)
    val incoming = e.filter(col("vec_id") % 5 === 0)
    IvfIndex.fit(standing, k = 16, iters = 2, path)
    val h = IvfIndex.load(spark, path)
    IvfIndex.append(h, incoming)
    // every vector of both publishes is in the inverted file
    assert(spark.read.parquet(path + "/vectors").count() == e.count())
    // queries that ARE the appended vectors (fresh qids so the self-
    // exclusion doesn't hide them) must find their twins at cosine 1.0:
    // query and twin share the argmin cell under the fixed centroids,
    // so nProbe=1 already reaches them — appended data is live
    val probes = incoming.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val top1 = IvfIndex.search(spark, IvfIndex.load(spark, path),
        probes, nProbe = 1, topK = 1)
      .collect().map(r => (r.getLong(0) - 1000000L, r.getLong(2), r.getDouble(3)))
    assert(top1.nonEmpty)
    top1.foreach { case (orig, nid, cos) =>
      assert(cos == 1.0, s"twin of $orig not found (top-1 $nid at cos=$cos)")
    }
  }

  test("IvfIndex delete + compact: removed vectors never surface, pruned rewrite") {
    import graft.operators.IvfIndex
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_ivfd").toString + "/idx"
    val e = Tables.embeddings(spark, sf)
    IvfIndex.fit(e, k = 16, iters = 2, path)
    val h = IvfIndex.load(spark, path)
    val probes = e.filter(col("vec_id") < 10)
    def run() = IvfIndex.search(spark, h, probes, nProbe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val before = run()
    // take down every current top-1 neighbor
    val deleted = before.filter(_._2 == 1).map(_._3).distinct.toSeq
    assert(deleted.nonEmpty)
    IvfIndex.delete(spark, path, deleted.toDF("vec_id"))
    val after = run()
    assert(after.nonEmpty)
    assert(after.map(_._3).toSet.intersect(deleted.toSet).isEmpty,
      "tombstoned vectors must stop surfacing immediately")
    // snapshot an UNAFFECTED cell's files: compaction must not touch it
    val vecDir = new java.io.File(path + "/vectors")
    val affectedCells = spark.read.parquet(path + "/vectors")
      .filter(col("vec_id").isInCollection(deleted))
      .select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
    val untouched = vecDir.listFiles()
      .filter(f => f.getName.startsWith("cell=") &&
        !affectedCells.contains(f.getName.stripPrefix("cell=").toInt))
    assert(untouched.nonEmpty, "expected at least one unaffected cell")
    val snapshot = untouched.map(d =>
      d.getName -> d.listFiles().map(_.getName).sorted.toSeq).toMap
    IvfIndex.compact(spark, path)
    untouched.foreach { d =>
      assert(d.listFiles().map(_.getName).sorted.toSeq == snapshot(d.getName),
        s"compaction rewrote unaffected cell ${d.getName}")
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path + "/tombstones")))
    // physical removal + parity: post-compaction search equals the
    // tombstone-masked search exactly
    assert(spark.read.parquet(path + "/vectors")
      .filter(col("vec_id").isInCollection(deleted)).count() == 0,
      "deleted vectors' rows must be physically gone")
    assert(run().toSeq == after.toSeq,
      "compaction must not change search results")
    // replayed compact is a no-op
    IvfIndex.compact(spark, path)
    assert(run().toSeq == after.toSeq)
  }

  test("IvfIndex compact recovers a swap torn after the cell-dir deletes") {
    import graft.operators.IvfIndex
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_ivfc").toString + "/idx"
    val e = Tables.embeddings(spark, sf)
    IvfIndex.fit(e, k = 16, iters = 2, path)
    val h = IvfIndex.load(spark, path)
    val probes = e.filter(col("vec_id") < 10)
    def run() = IvfIndex.search(spark, h, probes, nProbe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val deleted = run().filter(_._2 == 1).map(_._3).distinct
    IvfIndex.delete(spark, path, deleted.toDF("vec_id"))
    val expected = run()
    // build the torn state by hand, mirroring compact's stage format:
    // surviving rows of the affected cells staged + the _affected_cells
    // sidecar written, the cell dirs deleted — then the process dies
    // before the append-back
    val vectors = spark.read.parquet(path + "/vectors")
    val affected = vectors.filter(col("vec_id").isInCollection(deleted))
      .select(col("cell")).distinct().collect().map(_.getInt(0))
    vectors.filter(col("cell").isInCollection(affected.toIndexedSeq))
      .join(deleted.toDF("vec_id"), Seq("vec_id"), "left_anti")
      .write.mode("overwrite").parquet(path + "/vectors.compact/rows")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path + "/vectors.compact/_affected_cells"),
      affected.mkString("\n").getBytes("UTF-8"))
    affected.foreach { c =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(path + s"/vectors/cell=$c"))
    }
    // recovery: compact finishes the torn swap from the durable stage
    IvfIndex.compact(spark, path)
    assert(run() == expected,
      "recovered index must equal the tombstone-masked results")
    assert(spark.read.parquet(path + "/vectors")
      .filter(col("vec_id").isInCollection(deleted)).count() == 0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path + "/vectors.compact")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path + "/tombstones")))
    // an INCOMPLETE stage (no _affected_cells sidecar — crash mid-stage)
    // is discarded, not trusted: the pass re-runs from tombstones
    IvfIndex.delete(spark, path,
      spark.read.parquet(path + "/vectors").limit(1).select(col("vec_id")))
    new java.io.File(path + "/vectors.compact").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path + "/vectors.compact/garbage"),
      "not a stage".getBytes("UTF-8"))
    IvfIndex.compact(spark, path)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path + "/tombstones")),
      "fresh pass must still fold the tombstones after discarding the stage")
  }

  test("q_ivf_index_search emits ranked top-5 rows for the probe set") {
    val got = SparkEntry.queries("q_ivf_index_search")(spark, sf).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(qid < 20)
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length).toSeq,
        s"ranks must be dense 1..k for qid=$qid")
      assert(rs.length <= 5)
      assert(rs.forall(r => r.getLong(2) != qid), "no self-matches")
    }
  }

  test("q_ivf_index_append surfaces the appended 20% as live neighbors") {
    val got = SparkEntry.queries("q_ivf_index_append")(spark, sf).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length).toSeq,
        s"ranks must be dense 1..k for qid=$qid")
      assert(rs.forall(r => r.getLong(2) != qid), "no self-matches")
    }
    // appended vectors (vec_id % 5 == 0) must participate in results:
    // with 20% of the corpus appended, the probe set's neighborhoods
    // include them unless the append path silently dropped the batch
    assert(got.exists(_.getLong(2) % 5 == 0),
      "no appended vector surfaced — the appended batch is not live")
    // and the run is deterministic (fit overwrite resets the append)
    val again = SparkEntry.queries("q_ivf_index_append")(spark, sf).collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq)
  }

  test("q_ivf_index_takedown never surfaces a deleted vector") {
    val got = SparkEntry.queries("q_ivf_index_takedown")(spark, sf).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getLong(2) % 7 != 0),
      "a tombstoned+compacted vector surfaced in search results")
    got.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length).toSeq,
        s"ranks must be dense 1..k for qid=$qid")
      assert(rs.forall(_.getLong(2) != qid), "no self-matches")
    }
  }
}
