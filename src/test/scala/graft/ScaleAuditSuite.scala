package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression lock on the committed scale-audit artifact: the 10 most
  * expensive plans, run on a 10×-replicated re-salted corpus
  * (graft.tools.ScaleAudit), must stay within 1.5× of linear. The tool
  * produces SCALE_AUDIT.json; this suite pins what it committed, so a
  * plan change that reintroduces super-linear behavior fails CI the
  * moment a refreshed artifact lands — and a deleted/never-run artifact
  * fails loudly instead of passing silently.
  */
class ScaleAuditSuite extends AnyFunSuite {

  test("SCALE_AUDIT.json: every audited query within 1.5x-linear at 10x") {
    val p = java.nio.file.Paths.get("SCALE_AUDIT.json")
    assert(java.nio.file.Files.exists(p),
      "run `sbt \"runMain graft.tools.ScaleAudit\"` to produce SCALE_AUDIT.json")
    val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(text.contains("\"pass\":true"), "audit artifact records a failure")
    val entry = ("\"(q_[a-z_0-9]+)\":\\{\"t_small\":([0-9.]+)," +
      "\"t_big\":([0-9.]+),\"ratio\":([0-9.]+)\\}").r
    val ratios = entry.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(4).toDouble).toMap
    graft.tools.ScaleAudit.auditQueries.foreach { q =>
      assert(ratios.contains(q), s"$q missing from SCALE_AUDIT.json")
      assert(ratios(q) <= graft.tools.ScaleAudit.MaxLinearHeadroom *
        graft.tools.ScaleAudit.Copies,
        s"$q ratio ${ratios(q)} is super-linear")
    }
    // the artifact must cover exactly the declared audit set
    assert(ratios.keySet == graft.tools.ScaleAudit.auditQueries.toSet)
  }
}
