package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnalyticsOps

/** Semantics + scale-shape checks for the graph tier's degree-oriented
  * triangle enumeration: exact output on a planted hub graph, and the
  * wedge-fanout bound that motivates the orientation.
  */
class AnalyticsOpsSuite extends AnyFunSuite {
  import SparkFixture._

  // hub 0 touches every leaf 1..30; consecutive leaves are connected,
  // so the triangles are exactly (0, i, i+1) for i = 1..29
  private val hubEdges: Seq[(Long, Long)] =
    (1L to 30L).map(i => (0L, i)) ++ (1L until 30L).map(i => (i, i + 1))

  test("degree-oriented triangles enumerate the planted hub graph exactly") {
    import spark.implicits._
    val edges = hubEdges.toDF("p1", "p2")
    val got = AnalyticsOps.degreeOrientedTriangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (1L until 30L).map(i => (0L, i, i + 1))
    assert(got.toSeq == want,
      s"expected the 29 hub triangles in (a,b,c) id order, got ${got.length}")
  }

  test("degree orientation bounds per-key wedge fanout where id " +
      "orientation concentrates the hub") {
    // the orientation rule, recomputed independently of the operator
    val deg = hubEdges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def key(v: Long) = (deg(v), v)
    val byDegree = hubEdges.map { case (a, b) =>
      if (key(a)._1 < key(b)._1 || (key(a)._1 == key(b)._1 && a < b)) (a, b)
      else (b, a)
    }
    def maxOutDeg(es: Seq[(Long, Long)]): Int =
      es.groupBy(_._1).values.map(_.size).max
    // id orientation (p1 < p2) gives the hub ALL 30 out-edges: its
    // wedge key holds C(30,2) = 435 wedges in one task
    assert(maxOutDeg(hubEdges) == 30)
    // degree orientation points every hub edge INTO the hub; out-degree
    // is bounded by the graph's arboricity (= 2 here: leaves keep at
    // most their two ring edges plus nothing toward the hub)
    assert(maxOutDeg(byDegree) <= 3,
      s"degree-oriented max out-degree ${maxOutDeg(byDegree)}")
  }
}
