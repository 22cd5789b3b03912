package graft.util

import java.nio.file.{Files, Path, Paths}

object Fs {
  /** Best-effort recursive delete of a directory tree: entries that vanish
    * mid-walk (concurrent cleanup, racing sweeps) are tolerated rather than
    * failing the caller — the shared idiom for cache eviction, temp-corpus
    * cleanup, and test-harness teardown.
    */
  def deleteTree(path: Path): Unit =
    try Files.walk(path).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
    catch { case _: java.io.IOException | _: java.io.UncheckedIOException => () }

  def deleteTree(path: String): Unit = deleteTree(Paths.get(path))
}
