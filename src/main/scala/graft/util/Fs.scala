package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Small filesystem helpers shared by the bench/test harnesses. */
object Fs {
  /** Depth-first recursive delete; closes the walk stream (an unclosed
    * Files.walk leaks a directory file descriptor per call — noticeable in
    * long-lived bench JVMs cycling trial tables). No-op if absent. */
  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val walk = Files.walk(p)
    try walk.sorted(Comparator.reverseOrder[Path]())
      .forEach(f => { Files.deleteIfExists(f); () })
    finally walk.close()
  }
}
