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

  test("BFS min-hops equal a driver-side reference BFS on the same graph") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("q_graph_bfs")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // reference BFS on the collected co-purchase edges (tiny at
    // sf0.001), restated from the same definition the queries share
    import org.apache.spark.sql.functions.{count, lit}
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = li.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("p2")),
        Seq("l_orderkey"))
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("p1"), col("p2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val src = edges.map(_._1).min
    var dist = Map(src -> 0)
    var frontier = Set(src)
    var level = 0
    while (level < 10 && frontier.nonEmpty) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> (level + 1))
      frontier = next
      level += 1
    }
    assert(got == dist,
      s"missing=${dist.keySet -- got.keySet} extra=${got.keySet -- dist.keySet}")
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
