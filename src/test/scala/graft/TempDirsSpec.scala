package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.util.TempDirs

/** Staging-dir reclamation: stale per-pid dirs (owner process dead) are
  * deleted recursively; the live process's own dir and non-pid-suffixed
  * siblings are untouched. No SparkSession needed. */
class TempDirsSpec extends AnyFunSuite {

  private val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
  // Unique per test-JVM so concurrent sbt runs can't collide.
  private val prefix =
    s"graft_tempdirs_spec_${ProcessHandle.current().pid()}_x"

  test("cleanStale deletes dead-pid dirs, keeps live-pid and non-pid") {
    // 999999999 exceeds the Linux default pid_max (4194304): never alive.
    val dead = tmp.resolve(prefix + "999999999_suffix")
    val live = tmp.resolve(prefix + ProcessHandle.current().pid())
    val nonPid = tmp.resolve(prefix + "notapid")
    Files.createDirectories(dead)
    Files.write(dead.resolve("inner.txt"), "x".getBytes("UTF-8"))
    Files.createDirectories(live)
    Files.createDirectories(nonPid)
    try {
      TempDirs.cleanStale(prefix)
      assert(!Files.exists(dead), "dead-pid dir (with contents) removed")
      assert(Files.exists(live), "current process's dir kept")
      assert(Files.exists(nonPid), "dir without a pid suffix kept")
    } finally {
      Seq(dead.resolve("inner.txt"), dead, live, nonPid)
        .foreach(Files.deleteIfExists)
    }
  }
}
