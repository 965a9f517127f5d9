package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-run scratch root for standing-index directories that registry
  * entries and bench harnesses write (incremental dedup/containment/
  * source-overlap indexes, SCD2 sink replays). Each JVM gets ONE root
  * under java.io.tmpdir, deleted recursively at exit, so repeated Verify /
  * Bench / spec runs stop accreting `graft_*` litter in /tmp (r14 verdict
  * hygiene item). Callers that need a dir to OUTLIVE the JVM (a real
  * deployment's standing index) should pass their own managed path to the
  * ops-layer writers instead — this helper is for run-scoped dirs only.
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_run_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh run-scoped directory; unique per call, removed at JVM exit. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  /** Same as [[dir]] but as a Path (for callers composing with NIO). */
  def path(prefix: String): Path =
    Files.createTempDirectory(root, prefix)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
