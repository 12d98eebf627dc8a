package graft

import org.scalatest.funsuite.AnyFunSuite

/** The staging-root lifetime/safety contract: symlink-proof cleanup and
  * the touch-on-access refresh that keeps a live long-running process
  * out of a sibling's 24 h reaper.
  */
class StagePathsSuite extends AnyFunSuite {

  test("rmTree deletes symlinks as entries, never their targets") {
    val target = java.nio.file.Files.createTempDirectory("graft_keep_")
    val victim = target.resolve("precious.txt")
    java.nio.file.Files.write(victim, "keep me".getBytes("UTF-8"))
    val stale = java.nio.file.Files.createTempDirectory("graft_stale_")
    java.nio.file.Files.createSymbolicLink(
      stale.resolve("link_to_target"), target)
    java.nio.file.Files.write(stale.resolve("junk.txt"),
      "junk".getBytes("UTF-8"))

    StagePaths.rmTree(stale.toFile)

    assert(!java.nio.file.Files.exists(stale), "stale tree removed")
    assert(java.nio.file.Files.exists(victim),
      "symlink TARGET contents must survive cleanup")
    StagePaths.rmTree(target.toFile)
  }

  test("rmTree on a path that is ITSELF a symlink removes only the link") {
    val target = java.nio.file.Files.createTempDirectory("graft_keep2_")
    val victim = target.resolve("precious.txt")
    java.nio.file.Files.write(victim, "keep me".getBytes("UTF-8"))
    val link = java.nio.file.Paths.get(
      target.getParent.toString, "graft_link_" + System.nanoTime())
    java.nio.file.Files.createSymbolicLink(link, target)

    StagePaths.rmTree(link.toFile)

    assert(!java.nio.file.Files.exists(link,
      java.nio.file.LinkOption.NOFOLLOW_LINKS))
    assert(java.nio.file.Files.exists(victim))
    StagePaths.rmTree(target.toFile)
  }

  test("root access refreshes the live tree's mtime (age-gate immunity)") {
    val r = new java.io.File(StagePaths.root)
    r.mkdirs()
    try {
      val old = System.currentTimeMillis() - 30L * 3600 * 1000
      assert(r.setLastModified(old))
      assert(r.lastModified() < System.currentTimeMillis() - 24L * 3600 * 1000)
      StagePaths.root // any access while staging
      assert(r.lastModified() > System.currentTimeMillis() - 60 * 1000,
        "a live root older than the gate must be re-touched on use")
    } finally { StagePaths.rmTree(r); () }
  }
}
