package graft

import java.nio.file.{Files, Path}

/** Shutdown-hook sweeper for the engine's process-scoped scratch
  * directories (staged replay feeds, streaming checkpoints/sinks,
  * demo-table roots). These are created under `java.io.tmpdir`, are
  * meaningless outside the creating JVM, and a multi-GB staged feed per
  * process adds up fast on a shared box — a round-13 audit found ~56 GB
  * of accumulated feed/checkpoint litter from prior runs. OS tmp sweeps
  * are too slow for that rate, so the engine cleans up after itself: every
  * registry-created scratch dir is [[track]]ed and recursively deleted at
  * JVM exit. Deletion is best-effort (errors swallowed — the process is
  * exiting), and nothing is deleted DURING the run, so lazily-evaluated
  * DataFrames over these dirs stay readable for the process's whole life. */
object TempDirs {
  private val tracked =
    scala.collection.concurrent.TrieMap.empty[Path, Unit]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tracked.keys.foreach(deleteRecursively)
    }, "graft-tempdir-sweep"))

  /** Register `p` for at-exit deletion; returns `p` for chaining. */
  def track(p: Path): Path = {
    hookInstalled
    tracked.put(p, ())
    p
  }

  /** Create AND track a fresh scratch directory. */
  def scratch(prefix: String): Path =
    track(Files.createTempDirectory(prefix))

  private def deleteRecursively(p: Path): Unit =
    try {
      val s = Files.walk(p)
      try {
        s.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f)
            catch { case _: Throwable => () })
      } finally s.close()
    } catch { case _: Throwable => () }
}
