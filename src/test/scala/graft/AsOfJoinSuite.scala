package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scalable union+window as-of join must agree exactly with the
  * oracled join+argmax baseline (q_join_asof).
  */
class AsOfJoinSuite extends AnyFunSuite {
  import SparkFixture._

  test("union+window as-of equals the join+argmax baseline at sf0.001") {
    val baseline = SparkEntry.queries("q_join_asof")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val got = AsOfJoin.asOf(
      Tables.events(spark, sf), Tables.orders(spark, sf),
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_orderkey", "o_orderdate"), rightTiebreak = "o_orderkey")
      .filter(col("o_orderkey").isNotNull)
      .select(col("event_id"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(got.size == baseline.size,
      s"row counts differ: asOf=${got.size} baseline=${baseline.size}")
    val diffs = baseline.collect {
      case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("equal-timestamp right rows are visible and max-tiebreak wins") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val probes = Seq((1L, t("2024-01-01 10:00:00"), "e1"))
      .toDF("k", "ts", "name")
    val builds = Seq(
      (1L, t("2024-01-01 10:00:00"), 7L),   // same instant: visible
      (1L, t("2024-01-01 10:00:00"), 9L),   // tie -> max tiebreak wins
      (1L, t("2024-01-01 09:00:00"), 5L))
      .toDF("k", "bts", "bid")
    val got = AsOfJoin.asOf(probes, builds, "k", "k", "ts", "bts",
      Seq("bid"), "bid").head
    assert(got.getAs[Long]("bid") == 9L)
  }

  test("forward direction picks the earliest right >= probe time") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val probes = Seq(
      (1L, t("2024-01-01 10:00:00"), "e1"),
      (1L, t("2024-01-01 12:30:00"), "e2"),  // nothing at/after -> null
      (2L, t("2024-01-01 10:00:00"), "e3"))  // other key only -> null
      .toDF("k", "ts", "name")
    val builds = Seq(
      (1L, t("2024-01-01 09:00:00"), 5L),    // before: invisible forward
      (1L, t("2024-01-01 10:00:00"), 7L),    // same instant: visible
      (1L, t("2024-01-01 10:00:00"), 9L),    // tie -> max tiebreak wins
      (1L, t("2024-01-01 11:00:00"), 11L))
      .toDF("k", "bts", "bid")
    val got = AsOfJoin.asOf(probes, builds, "k", "k", "ts", "bts",
      Seq("bid"), "bid", direction = "forward")
      .collect().map(r => r.getAs[String]("name") ->
        Option(r.getAs[Any]("bid"))).toMap
    assert(got == Map("e1" -> Some(9L), "e2" -> None, "e3" -> None))
  }

  test("null BUILD times never match (they satisfy neither <= nor >=)") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val probes = Seq((1L, t("2024-01-01 10:00:00"), "p"))
      .toDF("k", "ts", "name")
    val builds = Seq((1L, Option.empty[Timestamp], 5L))
      .toDF("k", "bts", "bid")
    Seq("backward", "forward").foreach { dir =>
      val m = AsOfJoin.asOf(probes, builds, "k", "k", "ts", "bts",
        Seq("bid"), "bid", direction = dir).head
      assert(m.isNullAt(m.fieldIndex("bid")), s"$dir matched a null time")
    }
    val n = AsOfJoin.asOfNearest(probes, builds, "k", "k", "ts", "bts",
      Seq("bid"), "bid").head
    assert(n.isNullAt(n.fieldIndex("bid")), "nearest matched a null time")
  }

  test("null probe times match nothing in any direction") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val probes = Seq((1L, Option.empty[Timestamp], "nullts"))
      .toDF("k", "ts", "name")
    val builds = Seq((1L, t("2024-01-01 10:00:00"), 7L))
      .toDF("k", "bts", "bid")
    Seq("backward", "forward").foreach { dir =>
      val m = AsOfJoin.asOf(probes, builds, "k", "k", "ts", "bts",
        Seq("bid"), "bid", direction = dir).head
      assert(m.isNullAt(m.fieldIndex("bid")), s"$dir must not match")
    }
    val n = AsOfJoin.asOfNearest(probes, builds, "k", "k", "ts", "bts",
      Seq("bid"), "bid").head
    assert(n.isNullAt(n.fieldIndex("bid")), "nearest must not match")
  }

  test("nearest picks the closer side; ties prefer backward") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val probes = Seq(
      (1L, t("2024-01-01 10:00:00"), "closerAfter"),   // 30m fwd vs 2h back
      (2L, t("2024-01-01 10:00:00"), "closerBefore"),  // 15m back vs 1h fwd
      (3L, t("2024-01-01 10:00:00"), "tie"))           // 1h both sides
      .toDF("k", "ts", "name")
    val builds = Seq(
      (1L, t("2024-01-01 08:00:00"), 1L), (1L, t("2024-01-01 10:30:00"), 2L),
      (2L, t("2024-01-01 09:45:00"), 3L), (2L, t("2024-01-01 11:00:00"), 4L),
      (3L, t("2024-01-01 09:00:00"), 5L), (3L, t("2024-01-01 11:00:00"), 6L))
      .toDF("k", "bts", "bid")
    val got = AsOfJoin.asOfNearest(probes, builds, "k", "k", "ts", "bts",
      Seq("bid"), "bid")
      .collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("bid")).toMap
    assert(got == Map("closerAfter" -> 2L, "closerBefore" -> 3L, "tie" -> 5L))
  }

  test("tolerance nulls matches outside the bound, keeps probe rows") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val probes = Seq(
      (1L, t("2024-01-01 10:00:00"), "near"),
      (1L, t("2024-01-01 23:00:00"), "far"))
      .toDF("k", "ts", "name")
    val builds = Seq((1L, t("2024-01-01 09:30:00"), 5L))
      .toDF("k", "bts", "bid")
    val got = AsOfJoin.asOf(probes, builds, "k", "k", "ts", "bts",
      Seq("bid"), "bid",
      tolerance = Some((l, r) => l <= r + expr("INTERVAL 1 HOUR")))
      .collect().map(r => r.getAs[String]("name") ->
        Option(r.getAs[Any]("bid"))).toMap
    assert(got == Map("near" -> Some(5L), "far" -> None),
      "matches beyond the tolerance must null out, rows must survive")
  }
}
