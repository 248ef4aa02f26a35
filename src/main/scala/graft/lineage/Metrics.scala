package graft.lineage

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.table.TableJson

/**
 * Observability hooks: per-action query metrics and per-job summaries, as
 * JSONL under `<root>/lineage/_metrics/`.
 *
 * Re-grounds the reference's pipeline hook surface — onSearch/onEmbedding
 * duration callbacks (pipeline/src/types.ts:50-59) — as a Spark
 * [[QueryExecutionListener]]: every DataFrame action that touches the table's
 * session records (action, duration, output rows, bytes read/written), and
 * every maintenance job records a one-line summary via [[recordJob]].
 *
 * Scale notes: the listener runs on the driver's listener bus off the query
 * hot path; rows are appended with O(1) metadata per ACTION (not per row or
 * per task), so the overhead is invisible at any data scale. Files are
 * per-process (pid-suffixed) so concurrent writers never interleave bytes.
 */
object Metrics {

  private val installed = ConcurrentHashMap.newKeySet[String]()
  private val lock = new Object

  case class QueryEvent(
      ts: Long,
      kind: String, // "query" | "job"
      name: String,
      durationMs: Long,
      outputRows: Option[Long],
      bytesRead: Option[Long],
      bytesWritten: Option[Long],
      detail: Map[String, String])

  def dir(root: String): Path = Paths.get(root, "lineage", "_metrics")

  private def file(root: String): Path =
    dir(root).resolve(s"metrics-${ProcessHandle.current().pid()}.jsonl")

  private def append(root: String, e: QueryEvent): Unit = lock.synchronized {
    // A deleted table (bench trial cleanup) must not be resurrected by its
    // still-registered listener writing metrics into a fresh dir tree.
    if (!Files.exists(Paths.get(root))) return
    Files.createDirectories(dir(root))
    Files.write(file(root),
      (TableJson.write(e) + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** One summary row per finished maintenance job (compact/cluster/...). */
  def recordJob(root: String, name: String, durationMs: Long,
      detail: Map[String, String] = Map.empty): Unit =
    append(root, QueryEvent(System.currentTimeMillis(), "job", name,
      durationMs, None, None, None, detail))

  /** Install the per-action listener for `root` on `spark` (idempotent per
    * session+root). Every successful DataFrame action then logs duration,
    * output rows, and scan/write byte counters from the executed plan's
    * SQL metrics. */
  def install(spark: SparkSession, root: String): Unit = {
    val key = s"${System.identityHashCode(spark)}|$root"
    if (!installed.add(key)) return
    spark.listenerManager.register(new QueryExecutionListener {
      private def metricSum(qe: QueryExecution, names: Set[String]): Option[Long] = {
        var sum = 0L; var seen = false
        qe.executedPlan.foreach { p =>
          p.metrics.foreach { case (k, m) =>
            if (names.contains(k)) { sum += m.value; seen = true }
          }
        }
        if (seen) Some(sum) else None
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        try {
          val rows = {
            var last: Option[Long] = None
            qe.executedPlan.metrics.get("numOutputRows").foreach(m => last = Some(m.value))
            last
          }
          append(root, QueryEvent(System.currentTimeMillis(), "query", funcName,
            durationNs / 1000000,
            rows,
            metricSum(qe, Set("bytesRead", "filesSize")),
            metricSum(qe, Set("bytesWritten", "numOutputBytes")),
            Map.empty))
        } catch { case _: Throwable => () } // observability never fails the query
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
        try append(root, QueryEvent(System.currentTimeMillis(), "query",
          s"$funcName!failed", 0, None, None, None,
          Map("error" -> String.valueOf(ex.getMessage).take(200))))
        catch { case _: Throwable => () }
    })
  }

  /** All recorded events under `root` (driver-side read; test/CLI surface). */
  def events(root: String): Seq[QueryEvent] = {
    val d = dir(root)
    if (!Files.exists(d)) return Nil
    import scala.jdk.CollectionConverters._
    Files.list(d).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".jsonl"))
      .flatMap(p => new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .split("\n").iterator.filter(_.nonEmpty)
        .map(TableJson.read[QueryEvent]))
      .toSeq.sortBy(_.ts)
  }
}
