package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression lock on the committed scale-audit artifact: the most
  * expensive plans, run on a 10×-replicated re-salted corpus
  * (graft.tools.ScaleAudit), must stay within 1.5× of linear — or, for
  * declared OUTPUT-SENSITIVE queries (all-pairs similarity whose true
  * result set itself grows ~quadratically), within 1.5× of
  * max(input growth, output growth). The tool produces SCALE_AUDIT.json;
  * this suite pins what it committed, so a plan change that
  * reintroduces super-linear behavior fails CI the moment a refreshed
  * artifact lands — and a deleted/never-run artifact fails loudly
  * instead of passing silently.
  */
class ScaleAuditSuite extends AnyFunSuite {

  test("SCALE_AUDIT.json: every audited query within its declared " +
      "scaling bound at 10x") {
    val p = java.nio.file.Paths.get("SCALE_AUDIT.json")
    assert(java.nio.file.Files.exists(p),
      "run `sbt \"runMain graft.tools.ScaleAudit\"` to produce SCALE_AUDIT.json")
    val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(text.contains("\"pass\":true"), "audit artifact records a failure")
    val entry = ("\"(q_[a-z_0-9]+)\":\\{\"t_small\":([0-9.]+)," +
      "\"t_big\":([0-9.]+),\"ratio\":([0-9.]+)," +
      "\"out_small\":([0-9]+),\"out_big\":([0-9]+)," +
      "\"bound\":([0-9.]+)\\}").r
    val rows = entry.findAllMatchIn(text).map { m =>
      m.group(1) -> ((m.group(4).toDouble, m.group(5).toLong,
        m.group(6).toLong, m.group(7).toDouble))
    }.toMap
    val linearBound = graft.tools.ScaleAudit.MaxLinearHeadroom *
      graft.tools.ScaleAudit.Copies
    graft.tools.ScaleAudit.auditQueries.foreach { q =>
      assert(rows.contains(q), s"$q missing from SCALE_AUDIT.json")
      val (ratio, outS, outB, bound) = rows(q)
      // the bound itself is locked, not just trusted from the artifact:
      // linear queries get exactly the 1.5x-linear bound; output-
      // sensitive ones exactly 1.5x max(copies, output growth)
      val expectBound =
        if (graft.tools.ScaleAudit.outputSensitive(q) && outS > 0)
          graft.tools.ScaleAudit.MaxLinearHeadroom *
            math.max(graft.tools.ScaleAudit.Copies.toDouble,
              outB.toDouble / outS)
        else linearBound
      assert(math.abs(bound - expectBound) < 0.01,
        s"$q bound $bound drifted from declared $expectBound")
      assert(ratio <= bound, s"$q ratio $ratio exceeds its bound $bound")
    }
    // the artifact must cover exactly the declared audit set
    assert(rows.keySet == graft.tools.ScaleAudit.auditQueries.toSet)
  }
}
