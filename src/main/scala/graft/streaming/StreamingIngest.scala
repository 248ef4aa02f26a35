package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.table.GraftTable

/**
 * Structured Streaming surface (SURVEY.md §2.9: the reference has no streams;
 * its incrementality is batch-diff — the lakehouse-native streaming analog is
 * micro-batch append with exactly-once table commits).
 *
 *  - [[appendStream]]: readStream -> foreachBatch -> snapshot-committed
 *    appends. Each micro-batch becomes one atomic snapshot; the table's
 *    commit protocol makes replayed batches idempotent at the snapshot level
 *    (re-grounding I2 hash-after-success ordering,
 *    indexing/pipeline.ts:93-94).
 *  - [[windowedEventStats]]: watermarked event-time windowed aggregation —
 *    the progress-event statistics surface (I6,
 *    pipeline/src/types.ts:86-101) as a streaming query.
 */
object StreamingIngest {

  // private[graft]: ExpireSnapshots folds these summary markers into the
  // watermark properties before deleting pre-watermark-scheme snapshots.
  private[graft] val BatchIdKey = "stream-batch-id"
  private[graft] val CheckpointKey = "stream-checkpoint"

  private[graft] def watermarkKey(checkpointDir: String): String =
    s"stream.batch-watermark.$checkpointDir"

  /** foreachBatch is AT-LEAST-once: a crash between the table's snapshot
    * commit and the streaming checkpoint's offset commit re-delivers the
    * batch on restart. The table-side guard (Iceberg's WAP-style watermark):
    * the highest committed batchId per checkpoint lives in TABLE PROPERTIES,
    * written in the SAME CAS as the append snapshot — so the check is an
    * O(1) property lookup (not a scan of the ever-growing snapshot list),
    * and ExpireSnapshots can never delete the marker (properties survive
    * snapshot expiry). batchIds are monotonic per checkpoint (foreachBatch
    * is serial), so <= watermark means already committed. */
  private def alreadyCommitted(t: GraftTable, checkpointDir: String,
      batchId: Long): Boolean =
    t.meta.properties.get(watermarkKey(checkpointDir)) match {
      case Some(w) => w.toLong >= batchId
      case None =>
        // Upgrade path: tables whose streaming history predates the
        // properties watermark carry only per-snapshot summary markers. A
        // batch redelivered across that boundary must still be recognized,
        // so fall back to the snapshot-summary scan (the next successful
        // append writes the watermark property, and ExpireSnapshots
        // backfills it from any summaries it deletes — the markers cannot
        // be expired away).
        t.meta.snapshots.exists(s =>
          s.summary.get(CheckpointKey).contains(checkpointDir) &&
            s.summary.get(BatchIdKey).exists(_.toLong >= batchId))
    }

  private[graft] def idempotentAppend(t: GraftTable, batch: DataFrame,
      checkpointDir: String, batchId: Long): Boolean = {
    if (alreadyCommitted(t, checkpointDir, batchId)) false
    else {
      GraftTable.append(t, batch,
        summary = Map(BatchIdKey -> batchId.toString, CheckpointKey -> checkpointDir),
        propertiesUpdate = Map(watermarkKey(checkpointDir) -> batchId.toString))
      true
    }
  }

  /** Micro-batch append of a streaming DataFrame (table schema) into the
    * table. Returns the started query; caller owns lifecycle. */
  def appendStream(t: GraftTable, stream: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Each delivered batch becomes one atomic snapshot, idempotent per
        // (checkpoint, batchId) so at-least-once delivery never duplicates.
        if (!batch.isEmpty) idempotentAppend(t, batch, checkpointDir, batchId): Unit
      }
      .start()

  /** Micro-batch append with INLINE table upkeep: after each committed
    * batch, if the small-file population crossed `maintainEveryFiles`, run a
    * compaction and fold the newly compacted files into the clustered layout
    * (incremental groups-mode cluster — no global shuffle). This is the
    * steady-state 10^12-row shape: ingest keeps the table query-optimal
    * continuously instead of letting small files pile up for a nightly job;
    * both maintenance commits are snapshot-atomic, so concurrent readers
    * only ever see before/after states. Re-grounds the reference's
    * index-after-ingest refresh (pipeline.ts:63-94) as table upkeep. */
  def appendStreamWithUpkeep(t: GraftTable, stream: DataFrame,
      checkpointDir: String,
      targetBytes: Long = 8L * 1024 * 1024,
      maintainEveryFiles: Int = 64,
      curve: String = "zorder",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // Maintenance still runs when the batch itself was a replayed
          // duplicate — the small-file population it reacts to is real.
          idempotentAppend(t, batch, checkpointDir, batchId)
          val small = t.currentFiles
            .count(_.fileSizeBytes < (targetBytes * 3) / 4)
          if (small >= maintainEveryFiles) {
            graft.jobs.Compact.run(t, targetBytes)
            graft.jobs.Cluster.runIncremental(t, curve, targetBytes): Unit
          }
        }
      }
      .start()

  /** Watermark + sliding window aggregation over an event stream
    * (ts, event_type, value). */
  def windowedEventStats(events: DataFrame,
      window_ : String = "5 minutes", slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))
}
