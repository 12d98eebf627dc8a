package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Spec-level pins for the ITU-T T.6 decoder: a hand-assembled
  * bitstream exercising the H/V modes and the T.4 run alphabet, plus
  * the fail-closed contract on corrupt input. (The real-corpus 2005-b
  * decode is pinned in PdfLatticeSuite.)
  */
class CcittG4Suite extends AnyFunSuite {

  private def bits(s: String): Array[Byte] = {
    val clean = s.filter(c => c == '0' || c == '1')
    val padded = clean + "0" * ((8 - clean.length % 8) % 8)
    padded.grouped(8).map(b => Integer.parseInt(b, 2).toByte).toArray
  }

  test("hand-assembled H+V stream decodes to the planted pattern") {
    // 8x2, both rows ..XXXX.. (transitions at 2 and 6):
    //  row 1 from all-white reference:
    //   H (001) + white run 2 (0111) + black run 4 (011)  -> a0=6
    //   V0 (1) on b1=8 (sentinel)                          -> row done
    //  row 2 tracks row 1 with three V0s (b1 = 2, 6, 8)
    val stream = bits("001 0111 011 1" + "1 1 1")
    val bm = CcittG4.decode(stream, 8, 2)
    assert(bm.isDefined, "planted stream must decode")
    val rows = (0 until 2).map(y => (0 until 8).map(x => bm.get.get(x, y)))
    assert(rows(0) == Seq(0, 0, 1, 1, 1, 1, 0, 0), s"row0: ${rows(0)}")
    assert(rows(1) == rows(0))
  }

  test("vertical offsets move the tracked edge") {
    // 8x2: row 1 = ..XXXX.. via H+V0 as above; row 2 = ...XXX..
    // (transitions 3 and 6): VR1 (011) on b1=2 -> 3, V0 on b1=6, V0 end
    val stream = bits("001 0111 011 1" + "011 1 1")
    val bm = CcittG4.decode(stream, 8, 2)
    assert(bm.isDefined)
    assert((0 until 8).map(x => bm.get.get(x, 1)) ==
      Seq(0, 0, 0, 1, 1, 1, 0, 0))
  }

  test("pass mode skips a reference color pair without painting") {
    // 8x2: row 1 = ..XXXX.. (H + V0 as above); row 2 all white: PASS
    // (0001) jumps a0 past the reference's black run to b2=6 leaving
    // white, then V0 on the sentinel ends the row
    val stream = bits("001 0111 011 1" + "0001 1")
    val bm = CcittG4.decode(stream, 8, 2)
    assert(bm.isDefined, "pass-mode stream must decode")
    assert((0 until 8).map(x => bm.get.get(x, 1)).forall(_ == 0),
      "row 2 must stay all white")
  }

  test("make-up + terminating white run crosses 64 columns") {
    // 96x1, ..all white except last 8: white run 88 = 64 (11011) +
    // 24 (0101000), black run 8 (000101) -> a0=96, row/image done
    val stream = bits("001 11011 0101000 000101")
    val bm = CcittG4.decode(stream, 96, 1)
    assert(bm.isDefined, "make-up chain must decode")
    val row = (0 until 96).map(bm.get.get(_, 0))
    assert(row.take(88).forall(_ == 0) && row.drop(88).forall(_ == 1))
  }

  test("corrupt and truncated streams fail closed (None, no garbage)") {
    // unknown code path: 14 zero bits never resolve to any mode/run
    assert(CcittG4.decode(bits("00000000 000000"), 8, 2).isEmpty)
    // truncated mid-row: H announced, runs missing
    assert(CcittG4.decode(bits("001"), 8, 1).isEmpty)
    // H overrun: runs exceed the row width (white 24 + black 8 > 8)
    assert(CcittG4.decode(bits("001 0101000 000101"), 8, 1).isEmpty)
    assert(CcittG4.decode(Array.emptyByteArray, 8, 1).isEmpty)
  }
}
