package graft.jobs

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.{GraftTable, MetaIO, TableMetadata}

/**
 * Reference-counted snapshot expiration via an iterative reachability
 * DataFrame over the metadata tree (snapshot -> manifest -> data file).
 *
 * Direct re-grounding of the reference's refcounted orphan cleanup
 * (pipeline/src/indexing/pipeline.ts:263-308: delete entities whose
 * sourceChunkIds refcount drains to zero) and its depth-limited traversal
 * (sqlite-graph-storage.ts:201-226): the live set is computed by frontier
 * expansion over an edge DataFrame, then the universe of files/manifests is
 * anti-joined against it (U3/J3) — never deleting anything reachable from a
 * retained snapshot, no matter how many snapshots share a manifest.
 *
 * Scale design: edges live in DataFrames (at 10^12-row scale, manifests hold
 * millions of file entries — a driver-side set would not fly); the loop is a
 * handful of joins (metadata tree depth is 2), and only the final deletion
 * list is collected, partition-batched.
 */
object ExpireSnapshots {

  case class Result(
      retainedSnapshots: Seq[Long],
      expiredSnapshots: Seq[Long],
      deletedManifests: Long,
      deletedDataFiles: Long,
      deletedBytes: Long,
      orphansSwept: Long)

  /** Generic iterative reachability over an (src, dst) edge DataFrame.
    * Loops until the frontier is empty; each round is
    * frontier |><| edges -> new frontier \ visited (left-anti). */
  def reachable(spark: SparkSession, edges: DataFrame, seeds: DataFrame): DataFrame = {
    var visited = seeds.select(col("node")).distinct().localCheckpoint(true)
    var frontier = visited
    var n = frontier.count()
    while (n > 0) {
      val next = frontier.join(edges, frontier("node") === edges("src"))
        .select(edges("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(true) // truncate lineage each round (iterative plan growth)
      visited = visited.union(next).localCheckpoint(true)
      frontier = next
      n = frontier.count()
    }
    visited
  }

  def run(t: GraftTable, retain: Seq[Long], deleteFiles: Boolean = true,
      sweepOrphans: Boolean = true, orphanMinAgeMs: Long = 0L): Result = {
    val spark = t.spark
    import spark.implicits._
    val m = t.meta
    val retainSet = retain.toSet
    require(m.currentSnapshotId.forall(retainSet.contains),
      "refusing to expire the current snapshot")
    val known = m.snapshots.map(_.snapshotId).toSet
    require(retainSet.subsetOf(known), s"unknown snapshot ids: ${retainSet -- known}")

    // Edge DataFrame over the metadata tree.
    val snapManifest = m.snapshots
      .flatMap(s => s.manifests.map(mf => (s"snap:${s.snapshotId}", s"man:$mf")))
    val manFile = m.snapshots.flatMap(_.manifests).distinct
      .flatMap(mf => MetaIO.readManifest(t.root, mf).files
        .map(f => (s"man:$mf", s"file:${f.path}")))
    val edges = (snapManifest ++ manFile).toDF("src", "dst")
    val seeds = retainSet.toSeq.map(id => s"snap:$id").toDF("node")

    val live = reachable(spark, edges, seeds).as[String].collect().toSet

    val allManifests = m.snapshots.flatMap(_.manifests).distinct
    val allFiles = allManifests
      .flatMap(mf => MetaIO.readManifest(t.root, mf).files).distinctBy(_.path)
    val deadManifests = allManifests.filterNot(mf => live.contains(s"man:$mf"))
    val deadFiles = allFiles.filterNot(f => live.contains(s"file:${f.path}"))

    // Commit new metadata first (CAS), then physically delete: a crash
    // between the two only leaves sweepable orphans, never dangling refs.
    var attempts = 0
    var committed = false
    while (!committed) {
      attempts += 1
      val (v, cur) = MetaIO.load(t.root).get
      val nm: TableMetadata = cur.copy(
        snapshots = cur.snapshots.filter(s => retainSet.contains(s.snapshotId)))
      committed = MetaIO.tryCommit(t.root, v, nm)
      if (attempts > 20) throw new IllegalStateException("expire: CAS contention")
    }

    var deletedBytes = 0L
    if (deleteFiles) {
      deadFiles.foreach { f =>
        val p = Paths.get(f.absPath(t.root))
        if (Files.deleteIfExists(p)) deletedBytes += f.fileSizeBytes
      }
      deadManifests.foreach(mf =>
        Files.deleteIfExists(MetaIO.metadataDir(t.root).resolve(mf)))
    }

    // Orphan sweep: data files on disk referenced by NO manifest of any
    // retained snapshot (e.g. outputs of killed, never-committed units).
    var orphans = 0L
    if (sweepOrphans && deleteFiles) {
      val liveFilePaths = t.meta.snapshots
        .flatMap(_.manifests).distinct
        .flatMap(mf => MetaIO.readManifest(t.root, mf).files.map(_.path)).toSet
      val dataDir = Paths.get(t.root, "data")
      if (Files.exists(dataDir)) {
        Files.walk(dataDir).iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
          .foreach { p =>
            val rel = Paths.get(t.root).toAbsolutePath.relativize(p.toAbsolutePath).toString
            // Min-age guard: an in-flight job's just-written unit outputs are
            // not yet in any manifest; only sweep files old enough that no
            // live writer can still be about to commit them.
            val oldEnough = System.currentTimeMillis() -
              Files.getLastModifiedTime(p).toMillis >= orphanMinAgeMs
            if (!liveFilePaths.contains(rel) && oldEnough) {
              Files.deleteIfExists(p); orphans += 1
            }
          }
      }
    }

    Result(retainSet.toSeq.sorted, (known -- retainSet).toSeq.sorted,
      deadManifests.size, deadFiles.size, deletedBytes, orphans)
  }
}
