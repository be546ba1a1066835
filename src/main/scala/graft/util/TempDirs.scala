package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Lifecycle for the per-pid staging dirs the gate queries create under
  * `java.io.tmpdir` (stream-staged parquet, pipeline fixture TSVs).
  * Without cleanup every gate/bench process leaves its dir behind
  * forever. Two reclamation modes, because the dirs have different
  * lifetimes:
  *
  *  - [[deleteOnExit]] — recursive delete when THIS JVM exits. Only for
  *    dirs no other process reads later (the stream staging parquet is
  *    consumed by the same session's streaming query; its oracle reads
  *    the events table, not the staged file).
  *  - [[cleanStale]] — dirs whose literal paths are embedded in dumped
  *    oracle SQL (the pipeline fixture TSVs) MUST outlive their owner
  *    JVM: the driver's DuckDB pass reads oracle_sql.json in a separate
  *    process after Verify exits. The earliest safe reclaim point is
  *    therefore the NEXT process that stages the same kind of dir — it
  *    deletes siblings whose pid suffix names a process that is no
  *    longer alive. (A recycled pid makes the check conservative: the
  *    dir survives until the pid frees up — litter bounded by pid churn,
  *    not unbounded.)
  */
object TempDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.forEach(p => deleteRecursively(Paths.get(p)))))

  /** Register `path` for recursive deletion at JVM exit; returns it. */
  def deleteOnExit(path: String): String = {
    hookInstalled
    registered.add(path)
    path
  }

  /** Delete sibling dirs directly under tmpdir named `prefix<pid>` or
    * `prefix<pid>_<suffix>` whose pid is not a live process. */
  def cleanStale(prefix: String): Unit = {
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    if (!Files.isDirectory(tmp)) return
    val listing = Files.list(tmp)
    try {
      listing.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith(prefix)) {
          val pidPart = name.drop(prefix.length).takeWhile(_.isDigit)
          val stale = pidPart.nonEmpty &&
            pidPart.toLongOption.exists(pid =>
              pid != ProcessHandle.current().pid() &&
                !ProcessHandle.of(pid).map[Boolean](_.isAlive)
                  .orElse(false))
          if (stale) deleteRecursively(p)
        }
      }
    } finally listing.close()
  }

  /** Best-effort recursive delete: a concurrent cleaner (two gate
    * processes with the same prefix) or an undeletable entry must not
    * throw out of gate-query construction — the walk itself can fail
    * with UncheckedIOException when a sibling deletes the tree under
    * it, and each entry delete can race the same way. Whatever survives
    * is picked up by the next cleanStale pass. */
  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach { f =>
            try { Files.deleteIfExists(f); () }
            catch { case _: java.io.IOException => () }
          }
        finally walk.close()
        ()
      }
    } catch {
      case _: java.io.IOException | _: java.io.UncheckedIOException => ()
    }
}
