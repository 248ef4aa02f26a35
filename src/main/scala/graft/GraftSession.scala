package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession config for the engine: AQE with skew-join
  * splitting (north rule O9 backstop), shuffle partitions sized to cores
  * (not the 200 default), UTC for oracle parity. */
object GraftSession {
  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Spark 4's partitioning-aware union zips same-partitioned children
      // (SQLPartitioningAwareUnionRDD); compaction waves rely on Union
      // CONCATENATING its per-bin coalesce(1) children into one partition
      // per bin, so keep the legacy concatenating behavior.
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      // The dominant shuffle payload is the `bytes` column — already-
      // compressed PNG/JPG — so lz4-ing the exchange is pure CPU loss:
      // measured -40% cluster-phase time at 4x2-core executors and -27%
      // at 1 executor with compression off (BENCH/BASELINE.md §2 A/B).
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.reducer.maxSizeInFlight", "96m")
      .config("spark.ui.enabled", "false")

  def get(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
