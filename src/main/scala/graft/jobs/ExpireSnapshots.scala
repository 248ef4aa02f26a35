package graft.jobs

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.{GraftTable, MetaIO, TableMetadata}

/**
 * Reference-counted snapshot expiration via an iterative reachability
 * DataFrame over the metadata tree (snapshot -> manifest -> data file).
 *
 * Direct re-grounding of the reference's refcounted orphan cleanup
 * (pipeline/src/indexing/pipeline.ts:263-308: delete entities whose
 * sourceChunkIds refcount drains to zero) and its depth-limited traversal
 * (sqlite-graph-storage.ts:201-226): manifest liveness is computed by
 * frontier expansion over the snapshot->manifest edge DataFrame, and file
 * liveness by a distributed anti-join (U3) of the dead manifests' file
 * entries against the live manifests' — never deleting anything reachable
 * from a retained snapshot, no matter how many snapshots share a manifest.
 *
 * Scale design: the live FILE set is never materialized on the driver (at
 * 10^12-row scale manifests hold ~10^6-10^8 file entries — hundreds of MB of
 * path strings). Manifests are read as a distributed JSON scan; liveness is
 * a left-anti join; physical deletion is executor-side (foreachPartition —
 * the natural place for object-store bulk-DELETE batches), with a driver
 * loop only below [[DriverDeleteMax]]. Manifest NAMES (one per ~1000 files)
 * stay driver-side — metadata scale, same as every commit.
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

  /** (path, fileSizeBytes) of every file entry in `manifests`, read as a
    * DISTRIBUTED json scan of the manifest files (schema-projected: stats
    * maps never deserialize). Empty manifest list -> empty frame. */
  private def manifestFilesDf(t: GraftTable, manifests: Seq[String]): DataFrame = {
    val spark = t.spark
    val entry = StructType(Seq(
      StructField("path", StringType), StructField("fileSizeBytes", LongType)))
    val sch = StructType(Seq(StructField("files", ArrayType(entry))))
    if (manifests.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(entry.fields))
    val paths = manifests.map(m => MetaIO.metadataDir(t.root).resolve(m).toString)
    spark.read.schema(sch).json(paths: _*)
      .select(explode(col("files")).as("f"))
      .select(col("f.path").as("path"), col("f.fileSizeBytes").as("fileSizeBytes"))
  }

  /** Driver-loop cutoff: deletion lists at or below this stream through
    * toLocalIterator on the driver (cheaper than a Spark job for tiny N);
    * above it, deletes run executor-side via foreachPartition. */
  val DriverDeleteMax = 512

  /** Physically delete `files` (path, fileSizeBytes), returning
    * (deletedCount, deletedBytes). Distributed by default: each executor
    * partition deletes its slice (on object storage this is where the bulk
    * DELETE batch call goes), counts flow back via accumulators; a small
    * list (<= DriverDeleteMax) short-circuits to a driver loop. At 10^7
    * dead files the driver-serial alternative is hours of wall clock. */
  private[graft] def deleteListed(spark: SparkSession, root: String,
      files: DataFrame): (Long, Long) = {
    // Absolutized ON THE DRIVER before the closure captures it: executor JVMs
    // under local-cluster have different working directories, so a relative
    // root would make executor-side deleteIfExists silently no-op.
    val rootAbs = Paths.get(root).toAbsolutePath.toString
    val work = files.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = work.count()
      if (n == 0) (0L, 0L)
      else if (n <= DriverDeleteMax) {
        var cnt = 0L; var bytes = 0L
        val it = work.toLocalIterator()
        while (it.hasNext) {
          val r = it.next()
          if (Files.deleteIfExists(Paths.get(rootAbs, r.getString(0)))) {
            cnt += 1; bytes += r.getLong(1)
          }
        }
        (cnt, bytes)
      } else {
        val cnt = spark.sparkContext.longAccumulator("expire.deletedFiles")
        val bytes = spark.sparkContext.longAccumulator("expire.deletedBytes")
        work.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
          it.foreach { r =>
            if (Files.deleteIfExists(Paths.get(rootAbs, r.getString(0)))) {
              cnt.add(1); bytes.add(r.getLong(1))
            }
          }
        }
        (cnt.value, bytes.value)
      }
    } finally { work.unpersist(); () }
  }

  /** Retain set from a declarative policy (Iceberg's retain-last /
    * max-snapshot-age): the current snapshot always, plus the newest
    * `keepLast` snapshots, plus every snapshot younger than `maxAgeMs`.
    * Metadata-only computation. */
  def retainByPolicy(m: TableMetadata, keepLast: Option[Int] = None,
      maxAgeMs: Option[Long] = None,
      nowMs: Long = System.currentTimeMillis()): Seq[Long] = {
    val ids = m.snapshots.sortBy(_.snapshotId)
    val byLast = keepLast.map(n => ids.takeRight(math.max(0, n)).map(_.snapshotId))
      .getOrElse(Nil)
    val byAge = maxAgeMs.map(a => ids.filter(_.timestampMs > nowMs - a).map(_.snapshotId))
      .getOrElse(Nil)
    (byLast ++ byAge ++ m.currentSnapshotId.toSeq).distinct.sorted
  }

  def run(t: GraftTable, retain: Seq[Long], deleteFiles: Boolean = true,
      sweepOrphans: Boolean = true, orphanMinAgeMs: Long = 60L * 60 * 1000): Result = {
    val jobT0 = System.nanoTime()
    val spark = t.spark
    import spark.implicits._
    val m = t.meta
    val retainSet = retain.toSet
    require(m.currentSnapshotId.forall(retainSet.contains),
      "refusing to expire the current snapshot")
    val known = m.snapshots.map(_.snapshotId).toSet
    require(retainSet.subsetOf(known), s"unknown snapshot ids: ${retainSet -- known}")

    // Manifest liveness: reachability over the (small) snapshot->manifest
    // edge frame. Manifest names are metadata-scale (~1 per 1000 files).
    val snapManifest = m.snapshots
      .flatMap(s => s.manifests.map(mf => (s"snap:${s.snapshotId}", s"man:$mf")))
    val seeds = retainSet.toSeq.map(id => s"snap:$id").toDF("node")
    val liveManifests = reachable(spark, snapManifest.toDF("src", "dst"), seeds)
      .as[String].collect().collect { case s if s.startsWith("man:") => s.stripPrefix("man:") }
      .toSet
    val allManifests = m.snapshots.flatMap(_.manifests).distinct
    val deadManifests = allManifests.filterNot(liveManifests.contains)

    // File liveness: distributed anti-join; only the DELETION list is
    // collected, in partition batches. The live set never leaves the cluster.
    val liveFiles = manifestFilesDf(t, liveManifests.toSeq.sorted)
    val deadFiles = manifestFilesDf(t, deadManifests)
      .join(liveFiles, Seq("path"), "left_anti")
      .groupBy(col("path")).agg(max(col("fileSizeBytes")).as("fileSizeBytes"))

    // Commit new metadata first (CAS), then physically delete: a crash
    // between the two only leaves sweepable orphans, never dangling refs.
    // Retry semantics under concurrent writers: snapshots committed AFTER
    // planning are preserved (they descend from a retained snapshot, so
    // their manifests/files are live by construction), and the refreshed
    // current pointer is re-validated each attempt.
    var attempts = 0
    var committed = false
    while (!committed) {
      attempts += 1
      val (v, cur) = MetaIO.load(t.root).get
      val keep = cur.snapshots.filter(s =>
        retainSet.contains(s.snapshotId) || !known.contains(s.snapshotId))
      require(cur.currentSnapshotId.forall(id => keep.exists(_.snapshotId == id)),
        "concurrent commit moved the current snapshot to an id this expire would drop")
      // Legacy streaming idempotence markers live ONLY in snapshot
      // summaries on tables written before the properties watermark;
      // deleting those snapshots would reopen the duplicate window for a
      // batch redelivered across the upgrade boundary. Fold the max batch
      // id per checkpoint into the watermark properties in the SAME CAS
      // (properties survive expiry; StreamingIngest checks them first).
      // The fold covers ALL snapshots' markers — kept AND dropped: folding
      // only dropped ones could write a watermark BELOW a kept snapshot's
      // marker (drop batch 5, keep batch 7 -> property 5), and
      // alreadyCommitted short-circuits on the property when present, so a
      // redelivery of batch 7 would re-append duplicate rows. The property
      // is a running max over committed batches, so folding kept markers
      // early is always sound.
      val legacyWm: Map[String, String] = cur.snapshots
        .flatMap(s => for {
          ck <- s.summary.get(graft.streaming.StreamingIngest.CheckpointKey)
          bid <- s.summary.get(graft.streaming.StreamingIngest.BatchIdKey)
        } yield (graft.streaming.StreamingIngest.watermarkKey(ck), bid.toLong))
        .groupBy(_._1)
        .map { case (k, vs) =>
          k -> math.max(vs.map(_._2).max,
            cur.properties.get(k).map(_.toLong).getOrElse(Long.MinValue)).toString
        }
      val nm: TableMetadata = cur.copy(snapshots = keep,
        properties = cur.properties ++ legacyWm)
      committed = MetaIO.tryCommit(t.root, v, nm)
      if (attempts > 20) throw new IllegalStateException("expire: CAS contention")
    }

    var deletedBytes = 0L
    var deletedFiles = 0L
    if (!deleteFiles) {
      // Dry run: report the PLANNED reclamation so callers can preview.
      val planned = deadFiles.agg(count(lit(1)), coalesce(sum(col("fileSizeBytes")), lit(0L))).head()
      deletedFiles = planned.getLong(0)
      deletedBytes = planned.getLong(1)
    }
    if (deleteFiles) {
      val (n, b) = deleteListed(spark, t.root,
        deadFiles.select(col("path"), col("fileSizeBytes")))
      deletedFiles = n; deletedBytes = b
      deadManifests.foreach(mf =>
        Files.deleteIfExists(MetaIO.metadataDir(t.root).resolve(mf)))
    }

    // Manifest-orphan sweep: manifest files on disk referenced by no
    // snapshot at all (lost CAS attempts write manifests first) — metadata
    // scale, age-guarded like data orphans. Gated on sweepOrphans: that
    // flag exists precisely to protect in-flight writers' not-yet-committed
    // artifacts, and a pre-CAS manifest is exactly such an artifact.
    if (sweepOrphans && deleteFiles) {
      val mdDir = MetaIO.metadataDir(t.root)
      val referenced = t.meta.snapshots.flatMap(_.manifests).toSet
      val now = System.currentTimeMillis()
      val listing = Files.list(mdDir)
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("manifest-") &&
          !referenced.contains(p.getFileName.toString) &&
          now - Files.getLastModifiedTime(p).toMillis >= orphanMinAgeMs)
        .foreach(Files.deleteIfExists(_))
      finally listing.close()
    }

    // Orphan sweep: data files on disk referenced by NO manifest of any
    // retained snapshot (e.g. outputs of killed, never-committed units).
    // The disk listing is driver-side (a storage-API LIST); liveness is the
    // same distributed anti-join, so the live set again stays distributed.
    var orphans = 0L
    if (sweepOrphans && deleteFiles) {
      val dataDir = Paths.get(t.root, "data")
      if (Files.exists(dataDir)) {
        val rootAbs = Paths.get(t.root).toAbsolutePath
        val now = System.currentTimeMillis()
        val walk = Files.walk(dataDir)
        val onDisk = try walk.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
          .collect {
            // Min-age guard: an in-flight job's just-written unit outputs are
            // not yet in any manifest; only sweep files old enough that no
            // live writer can still be about to commit them.
            case p if now - Files.getLastModifiedTime(p).toMillis >= orphanMinAgeMs =>
              rootAbs.relativize(p.toAbsolutePath).toString
          }.toSeq
        finally walk.close()
        if (onDisk.nonEmpty) {
          // Liveness against FRESH post-CAS metadata, not the planning-time
          // set: a snapshot committed concurrently between planning and the
          // sweep references files absent from the old live set, and the
          // min-age guard alone must not be their only protection
          // (orphanMinAgeMs=0 is a supported single-writer mode).
          val freshManifests = t.meta.snapshots.flatMap(_.manifests).distinct
          val freshLive = manifestFilesDf(t, freshManifests)
          val sweepList = onDisk.toDF("path")
            .join(freshLive.select("path"), Seq("path"), "left_anti")
            .select(col("path"), lit(0L).as("fileSizeBytes"))
          orphans = deleteListed(spark, t.root, sweepList)._1
        }
      }
    }

    graft.lineage.Metrics.recordJob(t.root, "expire",
      (System.nanoTime() - jobT0) / 1000000, Map(
      "expired" -> (known -- retainSet).size.toString,
      "deleted-files" -> deletedFiles.toString,
      "deleted-bytes" -> deletedBytes.toString,
      "orphans" -> orphans.toString))
    Result(retainSet.toSeq.sorted, (known -- retainSet).toSeq.sorted,
      deadManifests.size, deletedFiles, deletedBytes, orphans)
  }
}
