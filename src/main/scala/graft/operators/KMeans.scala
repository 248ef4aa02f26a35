package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed Lloyd's k-means over an embedding column — the offline
 * centroid trainer for the IVF ANN path (q34). The reference's ANN backends
 * train their index structure at build time (storage-redis/src/
 * vector-storage.ts:31-46, storage-opensearch/src/vector-storage.ts:24-39);
 * this is the lakehouse analog: train the inverted-list partitioner once,
 * then assignment stays a map-side literal-folded projection.
 *
 * Design:
 *  - Assignment is MAP-SIDE: the k centroids are driver-held literals folded
 *    into one codegen'd projection (k * dims constants) — no join, no
 *    broadcast variable, no shuffle. The only exchange per iteration is the
 *    re-center partial aggregation (k * dims groups), and only k * dims
 *    (sum, count) rows ever reach the driver — bounded state, independent of
 *    data scale. That is the 10^12-row shape: each partition scans its rows
 *    once per iteration against constants.
 *  - FIXED-POINT arithmetic (1e-6 resolution): vectors are scaled to longs
 *    once; distances and re-center sums are exact integer math, so the fit
 *    is BIT-REPRODUCIBLE at any partition count / cluster size — a
 *    floating-point sum's value depends on reduction order, which would make
 *    "same data, same centroids" a property of the cluster layout instead of
 *    the algorithm. Reproducibility is what lets a DuckDB oracle replay the
 *    exact training (SparkEntry q40) and what makes index rebuilds stable
 *    across re-partitioning. Resolution cost: ~1e-6 per component, far below
 *    the noise floor of any learned embedding.
 *  - Empty clusters keep their previous centroid (deterministic, no
 *    re-seeding randomness).
 *
 * At 100 TB one trains on a bounded sample (pass a sampled df — e.g.
 * `df.sample(frac, seed)`); the trained centroids then drive full-scale
 * assignment exactly as q34 does.
 */
object KMeans {

  /** Fixed-point scale: 1e6 (micro-units). */
  val Scale = 1000000L

  /** array<float|double> -> scaled long array (the fit's working space).
    * round-half-away-from-zero, matching SQL ROUND in Spark and DuckDB.
    *
    * INPUT-MAGNITUDE BOUND (exactness contract): the integer distance math
    * is exact only while it cannot wrap Long. Per-dimension diffs reach
    * 2 x maxAbs(scaled), so sum-of-squares over `dims` dimensions requires
    * maxAbs <= sqrt(Long.MaxValue / dims) / 2 ([[maxSafeScaled]] — ~1.9e8
    * scaled = ~190 original units at dims = 64); the re-center sums
    * additionally require rows x maxAbs < Long.MaxValue (normalized
    * embeddings, maxAbs <= 1e6 scaled, are safe past 9e12 rows). [[fit]]
    * validates the distance bound against the init vectors; callers own
    * the (documented) guarantee for the rest of the data — typical
    * normalized embeddings sit orders of magnitude inside. */
  def scaled(vec: Column): Column = graft.expr.functions.scale_vec(vec)

  /** Largest scaled component magnitude for which squared-distance sums
    * over `dims` dimensions provably fit in a Long (see [[scaled]]). */
  def maxSafeScaled(dims: Int): Long =
    math.sqrt(Long.MaxValue.toDouble / math.max(1, dims)).toLong / 2

  /** Driver-side twin of [[scaled]] for single values (probe-time query
    * vectors): same HALF_UP semantics as SQL ROUND. */
  def scaleValue(x: Double): Long =
    java.math.BigDecimal.valueOf(x * Scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Nearest-centroid id by squared distance in scaled space: one
    * codegen'd projection with the centroid matrix as a reference object
    * and a deterministic smallest-cid tie-break
    * ([[graft.expr.NearestCentroid]] — the earlier composed
    * array_min-over-structs form paid k x dims x 2 INTERPRETED lambda
    * evaluations per row in Spark's higher-order functions, and dominated
    * the whole IVF build). */
  def assignScaled(vs: Column, cents: Seq[(Long, Array[Long])]): Column = {
    require(cents.nonEmpty, "no centroids")
    graft.expr.functions.nearest_centroid(vs, cents)
  }

  case class Result(
      centroids: Seq[(Long, Array[Long])], // (cid, scaled components)
      sizes: Map[Long, Long], // cluster sizes under the FINAL centroids
      iters: Int) {
    /** Centroids in original (double) space, for cosine/IVF consumers. */
    def centroidsDouble: Seq[(Long, Array[Double])] =
      centroids.map { case (cid, cv) => (cid, cv.map(_.toDouble / Scale)) }
  }

  /** SQL-ROUND (half away from zero) of the exact mean — the one
    * driver-side arithmetic step, kept identical to what `round(CAST(sum AS
    * DOUBLE) / n)` computes in Spark SQL and DuckDB so oracles can replay
    * the fit. */
  private def meanRounded(sum: Long, n: Long): Long =
    java.math.BigDecimal.valueOf(sum.toDouble / n)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Lloyd's iterations as DataFrame aggregations. `initIds`: the rows whose
    * `idCol` matches seed the centroids (deterministic init — k-means|| adds
    * randomness that breaks replayability; callers pick spread seeds). The
    * returned cids ARE the init ids. */
  def fit(df: DataFrame, vecCol: String, idCol: String, initIds: Seq[Long],
      iters: Int = 3): Result = {
    // Seed collect runs against the SOURCE frame (the id predicate pushes
    // into a file-backed scan) with driver-side scaling — scaleValue is
    // bit-identical to the `scaled` column (same double multiply, same
    // HALF_UP BigDecimal round) — so the persisted working set below is
    // scanned exactly iters + 1 times: one re-center aggregation per
    // Lloyd's iteration plus the final-sizes pass. Routing the seed lookup
    // through the cache cost an extra full materializing scan.
    var cents: Seq[(Long, Array[Long])] = df
      .filter(col(idCol).cast("long").isin(initIds.map(Long.box): _*))
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Number](1).map(n => scaleValue(n.doubleValue())).toArray))
      .toSeq.sortBy(_._1)
    require(cents.size == initIds.distinct.size,
      s"init ids missing from data: found ${cents.map(_._1)} of $initIds")
    // Exactness guard (see `scaled`): a seed vector outside the magnitude
    // bound means the data is outside the fixed-point contract — fail fast
    // instead of silently wrapping Long in the distance math.
    val dims = cents.head._2.length
    val bound = maxSafeScaled(dims)
    val maxAbs = cents.iterator.flatMap(_._2.iterator).map(math.abs).max
    require(maxAbs <= bound,
      s"component magnitude $maxAbs (scaled 1e6) exceeds the exact-Long " +
        s"distance bound $bound for dims=$dims; normalize or rescale inputs")
    // Null vectors are excluded from the working set: they have no
    // assignment, and the replaced posexplode shape dropped them too
    // (a generator emits zero rows for a null array) — without the filter
    // they would surface as a null-cid aggregation group.
    val scaledDf = df
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"), scaled(col(vecCol)).as("__v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 1 to iters) {
        // Re-center: one array-add per row via the SumLongArray typed
        // aggregate — k result rows of (cid, dims-long sums, n). Exact long
        // arithmetic, so partial-agg/merge order cannot change the result.
        // (The earlier posexplode+sum shape multiplied the aggregated row
        // count by dims: 64 M hash-agg updates per iteration at 1 M x 64-d
        // vectors, where this does 1 M array adds.)
        val sums = scaledDf
          .withColumn("__cid", assignScaled(col("__v"), cents))
          .groupBy(col("__cid"))
          .agg(graft.expr.functions.sum_long_array(col("__v")).as("s"),
            count(lit(1)).as("n"))
          .collect()
        val byCid = sums.map(r =>
          r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
        cents = cents.map { case (cid, old) =>
          byCid.get(cid) match {
            case None => (cid, old) // empty cluster: centroid carries over
            case Some((s, n)) =>
              val nv = new Array[Long](old.length)
              var i = 0
              while (i < old.length) { nv(i) = meanRounded(s(i), n); i += 1 }
              (cid, nv)
          }
        }
      }
      val sizes = scaledDf
        .select(assignScaled(col("__v"), cents).as("__cid"))
        .groupBy(col("__cid")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Result(cents, sizes, iters)
    } finally { scaledDf.unpersist(); () }
  }
}
