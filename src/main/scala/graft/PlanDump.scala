package graft

/** Plan-audit tool (guide §1/§7.2): writes `.explain("formatted")` output for
  * every SparkEntry query (or the subset named in args) to a directory, so
  * plan shapes (Exchange count, join strategy, PushedFilters/ReadSchema,
  * WholeStageCodegen spans) can be diffed before/after an optimization.
  * Usage: runMain graft.PlanDump <outDir> [query ...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench). Not part of
  * the frozen bench harness — it never times anything. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/dump")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.get(cpus, shuffleCompress = true)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] $name ok")
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    // Nonzero exit on any failure: a silently missing plan file would make
    // a before/after diff read as "no change" for a broken query.
    if (failed > 0) sys.exit(1)
  }
}
