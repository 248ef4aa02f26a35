package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc isolation bench (guide §1.4): times named query VARIANTS with the
  * noop sink, interleaved trials, per-variant minima — for choosing between
  * equivalent formulations without touching the frozen graft.Bench harness.
  * Usage: runMain graft.BenchExtra [trials]; env as Bench. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val trials = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.get(cpus, shuffleCompress = true)
    def ld(t: String): DataFrame = spark.read.parquet(s"$sfDir/$t.parquet")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q09_distinct2col" -> (() => {
        val o = ld("orders")
        o.filter(col("o_orderstatus") === "F")
          .unionByName(o.filter(col("o_totalprice") > 100000))
          .select(col("o_orderkey"), col("o_orderpriority"))
          .distinct()
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
      }),
      "q09_dropdup_projected" -> (() => {
        val o = ld("orders")
        o.filter(col("o_orderstatus") === "F")
          .unionByName(o.filter(col("o_totalprice") > 100000))
          .select(col("o_orderkey"), col("o_orderpriority"))
          .dropDuplicates("o_orderkey")
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
      }),
      "q09_original" -> (() => {
        val o = ld("orders")
        o.filter(col("o_orderstatus") === "F")
          .unionByName(o.filter(col("o_totalprice") > 100000))
          .dropDuplicates("o_orderkey")
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
      }))

    scala.util.Try(ld("nation").count())
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (t <- 1 to trials; (name, fn) <- variants) {
      spark.sparkContext.setJobDescription(s"$name trial $t")
      val t0 = System.nanoTime()
      fn().write.mode("overwrite").format("noop").save()
      times(name) = ((System.nanoTime() - t0) / 1e9) :: times(name)
    }
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"$name%-24s min=${ts.min}%.3f all=${ts.reverse.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
