package graft

import org.apache.spark.sql.functions._

import graft.jobs.MergeInto

/** Forces the large-source path: sort-merge join + AQE skew split instead of
  * broadcast (MergeInto picks SMJ when the source estimate exceeds the
  * broadcast threshold). */
class MergeSmjSpec extends GraftSuite {

  test("merge via sort-merge join path produces identical results to broadcast path") {
    import spark.implicits._
    val tA = TestFixtures.freshTable("merge-smj")
    val tB = TestFixtures.freshTable("merge-bcast")
    val fixes = (0 until 200).map(i => (f"img-$i%012d", s"bulk corrected $i"))
      .toDF("image_id", "caption")

    val rA = MergeInto.run(tA, fixes, broadcastThresholdBytes = 0L) // force SMJ
    val rB = MergeInto.run(tB, fixes) // broadcast
    assert(rA.strategy == "sort-merge+aqe-skew")
    assert(rB.strategy == "broadcast")
    assert(canon(tA.scan()) == canon(tB.scan()),
      "SMJ and broadcast merge must produce identical tables")
    assert(tA.scan().filter(col("caption").startsWith("bulk corrected")).count() == 200)
  }
}
