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

  /** Sorted *.parquet files directly under `dir`; a plain-file `dir` is
    * returned as itself (the one-file dataset case). The single listing
    * implementation behind BuildIvf.runFiles call sites — extend here
    * (hidden-file filtering, recursion) rather than per caller. */
  def listParquet(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir)
    if (!Files.isDirectory(p)) return Seq(dir)
    val listing = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toSeq.sorted
    } finally listing.close()
  }
}
