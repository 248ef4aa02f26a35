package graft

import java.nio.file.{Files, Paths}

import graft.images.ImageGen
import graft.jobs.{Cluster, Compact, DedupPhash}
import graft.table.GraftTable

/**
 * Headline engine benchmark (BASELINE.json metric): compaction + cluster
 * throughput in images/sec and GB/sec rewritten, measured on a deterministic
 * synthetic image+caption slice, at a chosen parallelism.
 *
 * The north rule's two-cluster-size scaling criterion is evidenced by running
 * this twice on the SAME input at two local parallelism levels (e.g.
 * local[8] vs local[32]) and reporting efficiency
 * = (throughput_4N / throughput_N) / 4 (BASELINE.md).
 *
 *   sbt "runMain graft.EngineBench <rows> <files> <cpus> [workdir] [targetMB] [big]"
 */
object EngineBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 20000L
    val nFiles = if (args.length > 1) args(1).toInt else 400
    val cpus = if (args.length > 2) args(2).toInt else 8
    val work = if (args.length > 3) args(3)
      else Files.createTempDirectory("graft-bench").toString
    val targetBytes = ((if (args.length > 4) args(4).toDouble else 1.0) * 1024 * 1024).toLong
    val sizes = if (args.length > 5 && args(5) == "big")
      Array(128, 160, 192, 224, 256) else ImageGen.Sizes
    val spark = GraftSession.get(cpus)

    // Phase 0 (untimed): deterministic fixture — rows images as nFiles tiny
    // files (the small-files problem at benchmark scale).
    val root = s"$work/table-$cpus"
    val t = GraftTable.create(root, spark)
    val genT0 = System.nanoTime()
    GraftTable.append(t, ImageGen.df(spark, rows, seed = 42L, partitions = nFiles,
      sizes = sizes))
    val genSec = (System.nanoTime() - genT0) / 1e9
    val bytesIn = t.currentFiles.map(_.fileSizeBytes).sum

    // Phase 1: compaction (timed).
    val c0 = System.nanoTime()
    val cRes = Compact.run(t, targetBytes = targetBytes,
      maxConcurrentBins = math.max(2, cpus))
    val compactSec = (System.nanoTime() - c0) / 1e9

    // Phase 2: clustering (timed).
    val k0 = System.nanoTime()
    val kRes = Cluster.run(t, curve = "zorder", mode = "global",
      targetBytes = targetBytes)
    val clusterSec = (System.nanoTime() - k0) / 1e9

    val rewrittenBytes = cRes.bytesIn + kRes.bytesIn
    val totalSec = compactSec + clusterSec
    val imagesPerSec = 2.0 * rows / totalSec // both phases rewrite every row
    val gbPerSec = rewrittenBytes / 1e9 / totalSec

    println(f"""{"metric":"compact+cluster throughput","images_per_sec":$imagesPerSec%.1f,"gb_per_sec":$gbPerSec%.4f,"unit":"images/sec","rows":$rows,"files_in":$nFiles,"bytes_in":$bytesIn,"cpus":$cpus,"gen_sec":$genSec%.1f,"compact_sec":$compactSec%.2f,"cluster_sec":$clusterSec%.2f,"compact_files_out":${cRes.filesOut},"cluster_files_out":${kRes.filesOut}}""")
    spark.stop()
  }
}
