package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingIngest
import graft.table.GraftTable

/** Streaming ingest with inline table upkeep: small files produced by
  * micro-batches get compacted + incrementally clustered as part of the
  * stream, and every row survives the maintenance commits. */
class StreamingUpkeepSpec extends GraftSuite {

  test("appendStreamWithUpkeep compacts and incrementally clusters once small files accumulate") {
    val work = TestFixtures.workRoot.resolve("stream-upkeep")
    val srcDir = work.resolve("src").toString
    // 200 rows in 20 parquet files -> 20 micro-batch appends of tiny files
    // (maxFilesPerTrigger=4 -> 5 batches of 4 files each).
    graft.images.ImageGen.df(spark, 200, seed = 13L, partitions = 20)
      .write.parquet(srcDir)
    val t = GraftTable.create(work.resolve("tbl").toString, spark)
    val stream = spark.readStream.schema(t.schema)
      .option("maxFilesPerTrigger", "4").parquet(srcDir)
    val q = StreamingIngest.appendStreamWithUpkeep(t, stream,
      checkpointDir = work.resolve("ckpt").toString,
      targetBytes = 4L * 1024 * 1024,
      maintainEveryFiles = 8,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(!q.isActive)

    val ops = t.meta.snapshots.map(_.operation)
    assert(ops.count(_ == "append") >= 2, s"expected several micro-batch appends: $ops")
    assert(ops.contains("compact"), s"upkeep should have compacted: $ops")
    assert(ops.contains("cluster"), s"upkeep should have clustered: $ops")

    // No rows lost or duplicated through ingest + maintenance.
    val ids = t.scan().select("image_id").collect().map(_.getString(0))
    assert(ids.length == 200)
    assert(ids.distinct.length == 200)
    // Upkeep actually erased the accumulated small-file population.
    val small = t.currentFiles.count(_.fileSizeBytes < 3L * 1024 * 1024)
    assert(t.currentFiles.size < 20,
      s"expected upkeep to shrink the file count, got ${t.currentFiles.size} (small=$small)")
  }

  test("streaming append is idempotent per (checkpoint, batchId): a re-delivered batch is skipped") {
    val work = TestFixtures.workRoot.resolve("stream-idem")
    val t = GraftTable.create(work.resolve("tbl").toString, spark)
    val batch = graft.images.ImageGen.df(spark, 20, seed = 77L, partitions = 2)
    val ckpt = work.resolve("ckpt").toString
    // First delivery commits; the foreachBatch redelivery of the SAME
    // batchId (at-least-once after a crash between table commit and
    // checkpoint offset commit) must be a no-op.
    assert(StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 0L))
    assert(t.scan().count() == 20)
    assert(!StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 0L))
    assert(t.scan().count() == 20)
    assert(t.meta.snapshots.count(_.operation == "append") == 1)
    // A different batch id (or another checkpoint) is new work.
    assert(StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 1L))
    assert(t.scan().count() == 40)
    assert(StreamingIngest.idempotentAppend(t, batch, work.resolve("ckpt2").toString, 1L))
    assert(t.scan().count() == 60)

    // The guard is a per-checkpoint WATERMARK in table properties, committed
    // in the same CAS as the append — so it is O(1) to check and SURVIVES
    // snapshot expiry (the old snapshot-summary markers were deleted with
    // their snapshots, reopening the duplicate window on a late replay).
    assert(t.meta.properties.get(StreamingIngest.watermarkKey(ckpt)).contains("1"))
    graft.jobs.ExpireSnapshots.run(t, Seq(t.currentSnapshot.snapshotId))
    assert(t.meta.snapshots.size == 1, "history expired to current only")
    assert(!StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 0L),
      "replay of an expired-snapshot batch must STILL be skipped")
    assert(!StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 1L))
    assert(t.scan().count() == 60)
  }

  test("legacy streaming table (summary markers, no watermark property): replay across the upgrade boundary is still skipped") {
    val work = TestFixtures.workRoot.resolve("stream-legacy")
    val t = GraftTable.create(work.resolve("tbl").toString, spark)
    val batch = graft.images.ImageGen.df(spark, 15, seed = 91L, partitions = 2)
    val ckpt = work.resolve("ckpt").toString
    // Simulate a pre-watermark-scheme commit: batch markers live ONLY in the
    // snapshot summary (what the old code wrote), no table property.
    GraftTable.append(t, batch, summary = Map(
      "stream-batch-id" -> "3", "stream-checkpoint" -> ckpt))
    assert(t.meta.properties.get(StreamingIngest.watermarkKey(ckpt)).isEmpty)
    // Redelivery of a legacy-committed batch must be recognized via the
    // summary-scan fallback, not re-appended as duplicates.
    assert(!StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 3L))
    assert(!StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 2L))
    assert(t.scan().count() == 15)
    // A marker for a DIFFERENT checkpoint does not mask this one's batches.
    assert(StreamingIngest.idempotentAppend(t, batch,
      work.resolve("other-ckpt").toString, batchId = 3L))
    // New batches append and write the watermark; from then on the O(1)
    // property path covers the legacy ids too (monotonic batch ids).
    assert(StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 4L))
    assert(t.meta.properties.get(StreamingIngest.watermarkKey(ckpt)).contains("4"))
    assert(!StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 3L))
    assert(t.scan().count() == 45)
  }

  test("expire backfills legacy stream markers into watermark properties (no reopened duplicate window)") {
    val work = TestFixtures.workRoot.resolve("stream-legacy-expire")
    val t = GraftTable.create(work.resolve("tbl").toString, spark)
    val batch = graft.images.ImageGen.df(spark, 10, seed = 92L, partitions = 1)
    val ckpt = work.resolve("ckpt").toString
    // Legacy streaming commit (summary markers only), then an unrelated
    // commit so the legacy snapshot is expirable.
    GraftTable.append(t, batch, summary = Map(
      "stream-batch-id" -> "5", "stream-checkpoint" -> ckpt))
    GraftTable.append(t, batch)
    graft.jobs.ExpireSnapshots.run(t, Seq(t.currentSnapshot.snapshotId))
    assert(t.meta.snapshots.size == 1, "legacy snapshot expired")
    // The expire folded the marker into the watermark property in the same
    // CAS — a redelivery after routine upkeep must still be recognized.
    assert(t.meta.properties.get(StreamingIngest.watermarkKey(ckpt)).contains("5"))
    assert(!StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 5L))
    assert(!StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 4L))
    assert(t.scan().count() == 20)
  }

  test("expire dropping an OLDER legacy marker while keeping a newer one never regresses the watermark") {
    val work = TestFixtures.workRoot.resolve("stream-legacy-two")
    val t = GraftTable.create(work.resolve("tbl").toString, spark)
    val batch = graft.images.ImageGen.df(spark, 10, seed = 93L, partitions = 1)
    val ckpt = work.resolve("ckpt").toString
    // Two legacy streaming commits (summary markers only, no property) for
    // the SAME checkpoint: batch 5, then batch 7.
    GraftTable.append(t, batch, summary = Map(
      "stream-batch-id" -> "5", "stream-checkpoint" -> ckpt))
    val newer = GraftTable.append(t, batch, summary = Map(
      "stream-batch-id" -> "7", "stream-checkpoint" -> ckpt))
    // Expire DROPS the batch-5 snapshot but KEEPS the batch-7 one. The
    // backfilled property must fold markers from kept AND dropped
    // snapshots: a property of 5 would make alreadyCommitted (which
    // short-circuits on the property when present) re-append a redelivered
    // batch 7 — the canonical restart-redelivery case — as duplicates,
    // even though its marker snapshot is still live.
    graft.jobs.ExpireSnapshots.run(t, Seq(newer.snapshotId))
    assert(t.meta.snapshots.map(_.snapshotId) == Seq(newer.snapshotId))
    assert(t.meta.properties.get(StreamingIngest.watermarkKey(ckpt)).contains("7"),
      s"watermark must cover the KEPT legacy marker: ${t.meta.properties}")
    assert(!StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 7L),
      "redelivery of the kept legacy batch must be skipped")
    assert(!StreamingIngest.idempotentAppend(t, batch, ckpt, batchId = 5L))
    assert(t.scan().count() == 20)
  }

  test("cluster exchange is skew-safe: a hot curve key collapses to one partition, rows survive") {
    val work = TestFixtures.workRoot.resolve("cluster-skew")
    val t = GraftTable.create(work.resolve("tbl").toString, spark)
    // 70% of rows share ONE (phash,w,h) key -> duplicate quantile boundaries
    // must collapse (distinct) and the exchange still routes every row.
    val base = graft.images.ImageGen.df(spark, 300, seed = 21L, partitions = 6)
    val skewed = base.withColumn("phash",
      when(rand(42) < 0.7, lit(1234567890123L)).otherwise(col("phash")))
      .withColumn("w", when(rand(43) < 0.7, lit(64)).otherwise(col("w")))
      .withColumn("h", when(rand(44) < 0.7, lit(64)).otherwise(col("h")))
    GraftTable.append(t, skewed, targetFiles = Some(6))
    val rows = t.scan().count()
    val r = graft.jobs.Cluster.run(t, curve = "zorder", mode = "global",
      targetBytes = 256L * 1024)
    assert(r.snapshot.isDefined)
    assert(t.scan().count() == rows, "skewed exchange must not lose rows")
    assert(canon(t.scan()).size == rows.toInt)
  }
}
