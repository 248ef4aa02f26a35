package graft

import org.apache.spark.sql.SparkSession

/** Driver-run query benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line (driver contract).
  *
  * Methodology (round-4 fix):
  *  - The consuming action is a `noop`-format write, which materializes EVERY
  *    output column. The earlier `count()` let Catalyst prune projection-only
  *    queries down to their cardinality (q31/q33's computed columns and q20's
  *    final simhash projection were dead code under count).
  *  - Each query runs `Trials` times, INTERLEAVED (full passes over the
  *    sorted query list), and the reported number is the per-query minimum —
  *    the host's documented 2-10x timing drift makes one-shot numbers
  *    unattributable (round 3's q18 "regression" was exactly that hole).
  * The first pass is reported separately as `cold` (JIT + first-read cost). */
object Bench {
  val Trials = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // Query-surface session: shuffle compression ON (text-heavy shuffles);
    // the compress-off engine default is for image-payload exchanges only.
    val spark = GraftSession.get(cpus, shuffleCompress = true)
    // One warm-up action so JIT/classloading doesn't tax the first query.
    scala.util.Try(spark.read.parquet(s"$sfDir/nation.parquet").count())
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map[String, List[(Double, Double)]]()
    // A failed trial must NOT contribute a timing: min-over-trials would
    // report the (truncated) throw-path time as a legitimate fast number and
    // the JSON would carry no hint. Failures go to `err` instead; a query
    // with zero successful trials reports -1.
    val errs = scala.collection.mutable.Map[String, String]()
    for (trial <- 1 to Trials; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = times.getOrElse(name, Nil) :+ (trial.toDouble, dt)
      } catch {
        case e: Throwable =>
          errs(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}"
      }
    }
    def fmtMap(sel: List[(Double, Double)] => Option[Double]): String =
      names.map { n =>
        val v = times.get(n).filter(_.nonEmpty).flatMap(sel)
        "\"" + n + "\":" + v.map(x => f"$x%.3f").getOrElse("-1")
      }.mkString("{", ",", "}")
    // JSON-string escape incl. ALL control chars (exception messages carry
    // tabs/CRs from plan fragments; a raw control char breaks the
    // line-level JSON parse the err field exists to serve).
    def esc(s: String) = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => " "
      case c => c.toString
    }
    val errJson = names.map(n =>
      "\"" + n + "\":" + errs.get(n).map(m => "\"" + esc(m) + "\"").getOrElse("null"))
      .mkString("{", ",", "}")
    val qs = fmtMap(ts => Some(ts.map(_._2).min))
    // cold = the FIRST-trial time only: if trial 1 failed, a later (warm)
    // success must not masquerade as the cold number — report -1 instead.
    val cold = fmtMap(_.find(_._1 == 1.0).map(_._2))
    val total = names.flatMap(n => times.get(n).filter(_.nonEmpty)
      .map(_.map(_._2).min)).sum
    // Probe-only serving-path number (kept OUT of the query total): build
    // the IVF index once from the sf embeddings — same geometry as q34 —
    // then time BuildIvf.probe against the prebuilt index. q34 keeps
    // training in-query because its oracle replays the fit; this isolates
    // the path a serving engine actually runs (stored centroids, manifest-
    // pruned bucket scans, zero training jobs).
    val ivfJson: String = try {
      import org.apache.spark.sql.functions.col
      val tmp = java.nio.file.Files.createTempDirectory("graft-bench-ivf")
      try {
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val tB = System.nanoTime()
        val idx = graft.jobs.BuildIvf.run(spark,
          e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          tmp.resolve("ivf").toString, initIds = 1L to 8L, iters = 3)
        val build = (System.nanoTime() - tB) / 1e9
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble).toArray
        var best = Double.MaxValue
        var first = -1.0
        for (i <- 1 to Trials) {
          val t0 = System.nanoTime()
          graft.jobs.BuildIvf.probe(idx.table, qv, nprobe = 2, topK = 10)
            .write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          if (i == 1) first = dt
          best = math.min(best, dt)
        }
        f""","ivf_build":$build%.3f,"ivf_probe":$best%.3f,"ivf_probe_cold":$first%.3f"""
      } finally graft.util.Fs.deleteRecursively(tmp)
    } catch {
      case e: Throwable =>
        s""","ivf_probe_err":"${esc(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")}""""
    }
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"trials":$Trials,"action":"noop","cold":$cold,"err":$errJson$ivfJson,"sf":"$sfDir","cpus":$cpus}"""
    println(json)
    // sbt prefixes forked stdout with "[info] ", which breaks line-level JSON
    // parsing downstream — also write the bare line to a file.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json"))
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
