package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.images.ImageGen
import graft.jobs.{Cluster, Compact}
import graft.table.GraftTable

/**
 * Two-parallelism scaling harness (BASELINE.md protocol): the SAME logical
 * input processed at N and 4N local cores, interleaved over several trials
 * with per-phase minima, to filter hypervisor noise (observed: identical
 * generation runs varying 47s..250s on this sandbox).
 *
 * The image fixture is generated ONCE to plain parquet; each trial stages it
 * into a fresh table (untimed) and times compact + cluster only.
 *
 *   sbt "runMain graft.ScalingBench <rows> <files> <targetMB> <trials> <cpusA> <cpusB>"
 */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 60000L
    val nFiles = if (args.length > 1) args(1).toInt else 512
    val targetMB = if (args.length > 2) args(2).toDouble else 4.0
    val trials = if (args.length > 3) args(3).toInt else 2
    val cpusA = if (args.length > 4) args(4).toInt else 8
    val cpusB = if (args.length > 5) args(5).toInt else 32
    // Work dir: put on /dev/shm (RAM-backed) to emulate the
    // bandwidth-scales-with-executors IO of an object-store cluster; a
    // single VM disk saturates at ~8 threads and would measure the disk,
    // not the engine (see SCALING.md).
    val work = if (args.length > 6) { Files.createDirectories(Paths.get(args(6))); args(6) }
      else Files.createTempDirectory("graft-scaling").toString
    // spark.local.dir (shuffle files) follows the same reasoning.
    System.setProperty("spark.local.dir", s"$work/spark-local")
    val targetBytes = (targetMB * 1024 * 1024).toLong

    // One-time fixture (big images so phases are IO/CPU-bound, not overhead);
    // reuse an existing parquet dir when given (args(7)).
    val sizes = Array(128, 160, 192, 224, 256)
    val srcDir = if (args.length > 7) args(7) else s"$work/src"
    if (args.length <= 7) {
      val s = GraftSession.get(cpusB)
      ImageGen.df(s, rows, seed = 42L, partitions = nFiles, sizes = sizes)
        .write.parquet(srcDir)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    case class Phase(compactSec: Double, clusterSec: Double, bytes: Long)
    val results = scala.collection.mutable.Map[Int, List[Phase]]().withDefaultValue(Nil)

    val dupFactor = if (args.length > 8) args(8).toInt else 1

    for (trial <- 1 to trials; cpus <- Seq(cpusA, cpusB)) {
      val spark = GraftSession.get(cpus)
      import org.apache.spark.sql.functions._

      // Warm-up (untimed): a miniature compact+cluster to compile codegen,
      // initialize parquet writer/committer classes and JIT the hot paths —
      // steady-state throughput is what scales on a long-running cluster.
      locally {
        val wroot = s"$work/warm-$cpus-$trial"
        val wt = GraftTable.create(wroot, spark)
        GraftTable.append(wt, spark.read.schema(wt.schema).parquet(srcDir)
          .limit(2000).repartition(16))
        Compact.run(wt, targetBytes = targetBytes, maxConcurrentBins = cpus)
        Cluster.run(wt, curve = "zorder", mode = "global", targetBytes = targetBytes)
      }

      val root = s"$work/tbl-$cpus-$trial"
      val t = GraftTable.create(root, spark)
      // Stage (untimed): copy the pregenerated parquet in as table files,
      // preserving the tiny-file layout; dupFactor self-unions the fixture
      // (re-keyed) to scale total bytes beyond the generated slice.
      val src0 = spark.read.schema(t.schema).parquet(srcDir)
      val staged = (1 to dupFactor).map { d =>
        if (d == 1) src0
        else src0.withColumn("image_id", concat(col("image_id"), lit(s"-$d")))
      }.reduce(_ unionAll _)
      GraftTable.append(t, staged.repartition(nFiles))
      val bytesIn = t.currentFiles.map(_.fileSizeBytes).sum
      val c0 = System.nanoTime()
      Compact.run(t, targetBytes = targetBytes, maxConcurrentBins = cpus)
      val cSec = (System.nanoTime() - c0) / 1e9
      val k0 = System.nanoTime()
      Cluster.run(t, curve = "zorder", mode = "global", targetBytes = targetBytes)
      val kSec = (System.nanoTime() - k0) / 1e9
      results(cpus) = Phase(cSec, kSec, bytesIn) :: results(cpus)
      System.err.println(f"[scaling] trial=$trial cpus=$cpus compact=$cSec%.2f cluster=$kSec%.2f")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      // Free the trial's table (tmpfs capacity); the fixture dir is kept.
      Seq(root, s"$work/warm-$cpus-$trial")
        .foreach(d => graft.util.Fs.deleteRecursively(Paths.get(d)))
    }

    def best(cpus: Int): Phase = {
      val ps = results(cpus)
      Phase(ps.map(_.compactSec).min, ps.map(_.clusterSec).min, ps.head.bytes)
    }
    val a = best(cpusA); val b = best(cpusB)
    val ta = a.compactSec + a.clusterSec
    val tb = b.compactSec + b.clusterSec
    val speedup = ta / tb
    val eff = speedup / (cpusB.toDouble / cpusA)
    val thA = 2.0 * rows / ta; val thB = 2.0 * rows / tb
    val gbA = 2.0 * a.bytes / 1e9 / ta; val gbB = 2.0 * b.bytes / 1e9 / tb
    println(f"""{"metric":"scaling efficiency","value":$eff%.3f,"unit":"ratio","cpusA":$cpusA,"cpusB":$cpusB,"trials":$trials,"rows":$rows,"bytes_in":${a.bytes},"tA_sec":$ta%.2f,"tB_sec":$tb%.2f,"compactA":${a.compactSec}%.2f,"clusterA":${a.clusterSec}%.2f,"compactB":${b.compactSec}%.2f,"clusterB":${b.clusterSec}%.2f,"images_per_sec_A":$thA%.1f,"images_per_sec_B":$thB%.1f,"gb_per_sec_A":$gbA%.4f,"gb_per_sec_B":$gbB%.4f,"speedup":$speedup%.2f}""")
  }
}
