package graft

import graft.operators.PqIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN contract: compression shape, recall vs
  * brute force, exactness of the re-ranked distances, determinism.
  */
class PqSuite extends AnyFunSuite {
  import SparkFixture._

  private val sf01 = "/root/testdata/sf0.01"

  private def r4(x: Double): Double =
    math.floor(x * 10000 + 0.5) / 10000

  /** Exact L2 via the same norm-expansion the operator uses. */
  private def exactDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val n1 = math.sqrt(na); val n2 = math.sqrt(nb)
    math.sqrt(math.max(0.0, n1 * n1 + n2 * n2 - 2.0 * dot))
  }

  test("codes compress every vector to m bytes of sub-k indices") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cb = PqIndex.fitCodebooks(e, m = 8, k = 16)
    assert(cb.length == 8 && cb.forall(_.length == 16) &&
      cb.forall(_.forall(_.length == 8)))
    val enc = PqIndex.encode(e, cb)
    assert(enc.columns.toSeq == Seq("vec_id", "codes"),
      "the compressed store must not carry the raw vectors")
    val rows = enc.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getAs[Array[Byte]]("codes")
      assert(codes.length == 8, "64 floats -> 8 bytes (32x)")
      assert(codes.forall(b => (b & 0xFF) < 16))
    }
  }

  test("re-ranked ADC search recalls most of the exact top-5 and emits " +
      "EXACT distances for what it returns") {
    val e = Tables.embeddings(spark, sf01).select(col("vec_id"), col("embedding"))
    val got = PqIndex.queries("q_pq_search")(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qids = got.map(_._1).distinct
    assert(qids.length == 8 && got.length == qids.length * 5)
    // exact top-5 per query (self excluded; ties by id like the operator)
    var hits = 0
    qids.foreach { qid =>
      val exact = vecs.keys.filter(_ != qid).toSeq
        .map(nid => (exactDist(vecs(qid), vecs(nid)), nid))
        .sortBy(identity).take(5).map(_._2).toSet
      hits += got.filter(_._1 == qid).count(g => exact.contains(g._3))
    }
    val recall = hits.toDouble / got.length
    // random uniform vectors are PQ's worst case; rerank=32 over 500
    // candidates still lands well above half. Measured 0.8+ here; floor
    // set with margin so codebook jitter can't flake the build.
    assert(recall >= 0.6, s"recall@5 = $recall")
    // the exact tier really is exact: emitted dist == brute-force dist
    got.foreach { case (qid, _, nid, dist) =>
      assert(dist == r4(exactDist(vecs(qid), vecs(nid))),
        s"re-ranked distance for ($qid,$nid) must be the true L2")
    }
  }

  test("search is deterministic across runs") {
    val a = PqIndex.queries("q_pq_search")(spark, sf01).collect().toSeq
    val b = PqIndex.queries("q_pq_search")(spark, sf01).collect().toSeq
    assert(a == b)
  }

  test("IVFPQ: persisted round trip recalls, re-ranks exactly, and " +
      "scans only probed cell partitions") {
    import graft.operators.IvfPq
    import org.apache.spark.sql.execution.FileSourceScanExec
    val e = Tables.embeddings(spark, sf01).select(col("vec_id"), col("embedding"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_t").toString + "/idx"
    IvfPq.fit(e, k = 16, iters = 2, m = 8, kSub = 16, path)
    val h = IvfPq.load(spark, path)
    val q = IvfPq.search(spark, h, e.filter(col("vec_id") < 8), e,
      nProbe = 4, rerank = 32, topK = 5)
    val got = q.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qids = got.map(_._1).distinct
    assert(qids.length == 8 && got.length == 40)
    // exact distances on what it returns
    got.foreach { case (qid, _, nid, dist) =>
      assert(dist == r4(exactDist(vecs(qid), vecs(nid))))
    }
    // recall vs brute force: cell pruning at nProbe=4/16 forfeits some
    // of flat-PQ's recall by design; floor from measurement with margin
    var hits = 0
    qids.foreach { qid =>
      val exact = vecs.keys.filter(_ != qid).toSeq
        .map(nid => (exactDist(vecs(qid), vecs(nid)), nid))
        .sortBy(identity).take(5).map(_._2).toSet
      hits += got.filter(_._1 == qid).count(g => exact.contains(g._3))
    }
    val recall = hits.toDouble / got.length
    assert(recall >= 0.3, s"IVFPQ recall@5 = $recall")
    // the code scan is partition-pruned to the probed cells
    q.collect()
    val scans = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
      def find(p: org.apache.spark.sql.execution.SparkPlan) =
        collectWithSubqueries(p) {
          case f: FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("codes")) => f
        }
    }.find(q.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a file scan over the codes dir")
    scans.foreach(f => assert(f.partitionFilters.nonEmpty,
      s"codes scan must carry a literal cell partition filter: $f"))
    // determinism
    val again = IvfPq.search(spark, h, e.filter(col("vec_id") < 8), e,
      nProbe = 4, rerank = 32, topK = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq == got.toSeq)
  }
}
