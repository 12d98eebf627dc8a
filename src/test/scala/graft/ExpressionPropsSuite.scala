package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Seeded property checks for the round-10 expression layer: the PQ
  * codec (encode/LUT/ADC against direct arithmetic), the bloom membership
  * helper (no false negatives, serialization stability), and the z-order
  * interleave (against a reference Morton implementation).
  */
class ExpressionPropsSuite extends AnyFunSuite {
  import SparkFixture._

  private def forSamples(n: Int)(body: Random => Unit): Unit = {
    val rnd = new Random(1234)
    (1 to n).foreach(_ => body(rnd))
  }

  // --- PQ codec -----------------------------------------------------------

  private def randomCodebook(rnd: Random, m: Int, k: Int,
      sub: Int): Array[Array[Array[Double]]] =
    Array.fill(m, k, sub)(rnd.nextDouble() * 2 - 1)

  private def arrData(v: Array[Float]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(v)

  test("pq: serialize/deserialize round-trips the codebook exactly") {
    forSamples(10) { rnd =>
      val cb = randomCodebook(rnd, m = 4, k = 8, sub = 3)
      val back = graft.functions.Pq.toNested(
        graft.functions.Pq.fromBytes(graft.functions.Pq.serialize(cb)))
      assert(back.map(_.map(_.toSeq).toSeq).toSeq ==
        cb.map(_.map(_.toSeq).toSeq).toSeq)
    }
  }

  test("pq: adc(codes(x), lut(q)) equals the direct sum of subspace " +
      "distances to x's chosen centers") {
    forSamples(25) { rnd =>
      val (m, k, sub) = (4, 8, 3)
      val cb = randomCodebook(rnd, m, k, sub)
      val bytes = graft.functions.Pq.serialize(cb)
      val x = Array.fill(m * sub)(rnd.nextFloat() * 2 - 1)
      val q = Array.fill(m * sub)(rnd.nextFloat() * 2 - 1)
      val codes = graft.functions.Pq.encode(bytes, arrData(x))
      // every code is the argmin center for its subspace
      (0 until m).foreach { mi =>
        val dists = (0 until k).map { ki =>
          (0 until sub).map { j =>
            val d = x(mi * sub + j).toDouble - cb(mi)(ki)(j); d * d
          }.sum
        }
        assert(dists(codes(mi) & 0xFF) == dists.min)
      }
      val lut = graft.functions.Pq.lut(bytes, arrData(q))
      val adc = graft.functions.Pq.adc(codes, lut)
      val direct = (0 until m).map { mi =>
        val ki = codes(mi) & 0xFF
        (0 until sub).map { j =>
          val d = q(mi * sub + j).toDouble - cb(mi)(ki)(j); d * d
        }.sum
      }.sum
      assert(adc == direct)
    }
  }

  // --- bloom membership ---------------------------------------------------

  test("bloom: inserted keys are NEVER reported absent, across " +
      "serialization") {
    forSamples(5) { rnd =>
      val keys = Array.fill(500)(rnd.nextLong())
      val bf = org.apache.spark.util.sketch.BloomFilter.create(500, 0.01)
      keys.foreach(bf.putLong)
      val bytes = graft.functions.BloomFilters.serialize(bf)
      keys.foreach { key =>
        assert(graft.functions.BloomFilters.mightContainLong(bytes, key))
      }
      // and the false-positive rate on fresh keys stays in the ballpark
      val fresh = Array.fill(2000)(rnd.nextLong())
        .filterNot(keys.contains)
      val fp = fresh.count(
        graft.functions.BloomFilters.mightContainLong(bytes, _))
      assert(fp.toDouble / fresh.length < 0.05,
        s"fp rate ${fp.toDouble / fresh.length}")
    }
  }

  // --- winnowing ----------------------------------------------------------

  /** Reference winnow: 5-gram polynomial hashes, windows of 4, rightmost
    * minimal per window, distinct — straight from the SIGMOD'03 paper.
    */
  private def refWinnow(text: String): Set[(Int, Long)] = {
    val cps = text.codePoints().toArray
    val hs = (0 to cps.length - 5).map { p =>
      (0 until 5).foldLeft(0L)((h, j) => (h * 31 + cps(p + j)) % 1000000007L)
    }
    (3 until hs.length).flatMap { e =>
      val win = (e - 3) to e
      val m = win.map(hs).min
      val sel = win.filter(q => hs(q) == m).max
      Some((sel + 1, hs(sel))) // 1-based position like the query
    }.toSet
  }

  test("winnowing: query output equals the reference algorithm per doc, " +
      "and docs sharing an 8-char substring share a fingerprint") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("q_text_winnowing")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(x => (x._2, x._3)).toSet).toMap
    val expected = docs.collect {
      case (id, t) if t.length >= 8 && refWinnow(t).nonEmpty =>
        id -> refWinnow(t)
    }
    assert(got == expected,
      s"per-doc fingerprint sets diverge for ${
        (got.keySet ++ expected.keySet).filter(k =>
          got.get(k) != expected.get(k)).take(3)}")
    // the winnowing guarantee on a crafted pair
    val shared = "qzjvxkwpm" // 9 chars -> >= 1 shared fingerprint
    val fpA = refWinnow("aaaa" + shared + "bbbb").map(_._2)
    val fpB = refWinnow("cccc" + shared + "dddd").map(_._2)
    assert(fpA.intersect(fpB).nonEmpty)
  }

  // --- z-order interleave -------------------------------------------------

  private def refMorton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, b) =>
      acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }

  test("zorder: withZValue on a full-range integer grid equals the " +
      "reference Morton interleave") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new Random(7)
    // corners pin min/max so the scale-floor maps cell_i = x_i exactly
    val rows = Seq((0L, 0L), (65535L, 65535L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = rows.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val z = graft.operators.ScalePatterns
      .withZValue(df, Seq("x", "y"), bits = 16)
      .select(col("id"), col("x"), col("y"), col("__z")).collect()
    z.foreach { r =>
      val (x, y, zv) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(zv == refMorton(x, y, 16),
        s"z($x, $y) = $zv, expected ${refMorton(x, y, 16)}")
    }
  }
}
