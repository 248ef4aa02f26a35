package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.KMeans
import graft.table.{EqLong, GraftTable, PartitionSpec}

/**
 * IVF ANN index BUILD as a lakehouse table-maintenance job — the batch
 * analog of the reference ANN backends' index construction
 * (storage-redis/src/vector-storage.ts:31-46,
 * storage-opensearch/src/vector-storage.ts:24-39): train the coarse
 * quantizer ([[KMeans]]), assign every vector to its inverted list, and
 * PERSIST the lists as a bucket-partitioned graft table whose manifests
 * prune probes.
 *
 * Why a table rather than an in-memory index: at 10^12 vectors the
 * inverted lists ARE the storage layout. Each bucket is a partition value,
 * so a probe is a manifest-pruned scan that opens only its bucket's files
 * (~nprobe/k of the table); the centroids (k x dims fixed-point longs)
 * travel in TABLE PROPERTIES, making the index self-describing and
 * snapshot-versioned with its data — a rebuild is just a new snapshot, and
 * time travel applies to the index like any other table.
 */
object BuildIvf {

  /** Property key holding `cid:c1,c2,...|cid:...` (components scaled 1e6,
    * [[KMeans.Scale]]). k x dims longs — metadata-sized at any N. */
  val CentroidsProp = "ivf.centroids"
  val KProp = "ivf.k"

  case class Result(table: GraftTable, k: Int, rows: Long, files: Int)

  private[graft] def encodeCentroids(cs: Seq[(Long, Array[Long])]): String =
    cs.map { case (cid, cv) => s"$cid:${cv.mkString(",")}" }.mkString("|")

  private[graft] def decodeCentroids(s: String): Seq[(Long, Array[Long])] =
    s.split('|').toSeq.map { part =>
      val Array(cid, vs) = part.split(':')
      (cid.toLong, vs.split(',').map(_.toLong))
    }

  def centroidsOf(t: GraftTable): Seq[(Long, Array[Long])] =
    decodeCentroids(t.meta.properties.getOrElse(CentroidsProp,
      throw new IllegalStateException(s"${t.root} is not an IVF index table")))

  /** Build the index table at `root` from `vectors` (idCol: long-castable
    * id, vecCol: float/double array). Deterministic end-to-end: the
    * fixed-point fit plus value-routed writes make a rebuild of the same
    * data byte-comparable. */
  /** Assign + partition-PURE routing: bucket with index i lands exactly at
    * output partition i via the Murmur3 representative trick
    * ([[Cluster.partitionReps]]), so every data file holds ONE bucket and
    * the manifests carry per-bucket partition values — a plain
    * repartition(col("bucket")) hash-collides buckets into shared files
    * and silently demotes probe pruning to zero. */
  private def routed(vectors: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Long, Array[Long])]): DataFrame = {
    val k = cents.size
    val reps = Cluster.partitionReps(k)
    val repCol = cents.zipWithIndex.foldLeft(lit(0L)) {
      case (els, ((cid, _), i)) =>
        when(col("bucket") === lit(cid), lit(reps(i))).otherwise(els)
    }
    vectors
      .select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<float>").as("embedding"))
      .withColumn("bucket",
        KMeans.assignScaled(KMeans.scaled(col("embedding")), cents))
      .withColumn("__rep", repCol)
      .repartition(k, col("__rep")).drop("__rep")
  }

  def run(spark: SparkSession, vectors: DataFrame, idCol: String,
      vecCol: String, root: String, initIds: Seq[Long],
      iters: Int = 3): Result = {
    val fit = KMeans.fit(vectors, vecCol, idCol, initIds, iters)
    val t = GraftTable.create(root, spark,
      schemaDdl = "vec_id BIGINT, embedding ARRAY<FLOAT>, bucket BIGINT",
      properties = Map(
        CentroidsProp -> encodeCentroids(fit.centroids),
        KProp -> fit.centroids.size.toString),
      partitionSpec = Some(PartitionSpec("bucket", "identity")))
    val k = fit.centroids.size
    GraftTable.append(t, routed(vectors, idCol, vecCol, fit.centroids),
      summary = Map("job" -> "build-ivf"))
    val files = t.currentFiles
    graft.lineage.Metrics.recordJob(root, "build-ivf", 0, Map(
      "k" -> k.toString, "files" -> files.size.toString,
      "rows" -> files.map(_.rowCount).sum.toString))
    Result(t, k, files.map(_.rowCount).sum, files.size)
  }

  /** Incremental index maintenance: assign NEW vectors with the STORED
    * centroids and append bucket-pure files — one snapshot, no retrain.
    * The steady-state 10^12-row path: continuous ingest appends into the
    * lists; the assignment stays consistent because the quantizer is
    * frozen in table properties (a periodic [[run]] rebuild re-trains when
    * drift warrants it, as reference backends re-index). Appended files
    * are small per batch — the standard compaction job folds them, and
    * partition-pure bins keep every output file single-bucket. */
  def append(t: GraftTable, vectors: DataFrame, idCol: String,
      vecCol: String): Long = {
    val before = t.currentFiles.map(_.rowCount).sum
    GraftTable.append(t, routed(vectors, idCol, vecCol, centroidsOf(t)),
      summary = Map("job" -> "ivf-append"))
    t.currentFiles.map(_.rowCount).sum - before
  }

  /** nprobe-pruned cosine top-k over the index table. Probe lists are
    * picked DRIVER-side against the property centroids (k distances — no
    * job); the scan unions one manifest-pruned branch per probed bucket, so
    * only ~nprobe/k of the table's files are opened. */
  def probe(t: GraftTable, query: Array[Double], nprobe: Int,
      topK: Int): DataFrame = {
    val cents = centroidsOf(t)
    val q = query.map(KMeans.scaleValue)
    val probes = cents
      .map { case (cid, cv) =>
        var d = 0L
        var i = 0
        while (i < cv.length) { val x = q(i) - cv(i); d += x * x; i += 1 }
        (d, cid)
      }
      .sorted.take(math.max(1, nprobe)).map(_._2)
    val scanned = probes
      .map(cid => t.scanWhere(Seq(EqLong("bucket", cid))))
      .reduce(_ unionByName _)
    val qArr = array(query.toIndexedSeq.map(x => lit(x)): _*)
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    scanned
      .withColumn("cos",
        aggregate(zip_with(col("embedding"), qArr, (x, y) => x * y),
          lit(0.0d), (acc, v) => acc + v) /
          (sqrt(aggregate(col("embedding"), lit(0.0d),
            (acc, v) => acc + v * v)) * lit(qNorm)))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(topK)
      .select(col("vec_id"), col("bucket"), col("cos"))
  }
}
