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

  test("bytes-bearing source is NOT broadcast: measured payload drives the strategy") {
    import spark.implicits._
    val t = TestFixtures.freshTable("merge-payload-est")
    // 64 rows but each carries a ~96 KB payload: a rows*256 estimate would
    // broadcast; the measured-bytes estimate must pick the SMJ path.
    val big = graft.images.ImageCodec.encodePng(noiseImage(256, 256, seed = 9L))
    assert(big.length > 16 * 1024, s"fixture payload too small: ${big.length}")
    val src = (0 until 64).map(i => (f"img-$i%012d", s"payload cap $i", big))
      .toDF("image_id", "caption", "bytes")
    val r = MergeInto.run(t, src, broadcastThresholdBytes = 1L * 1024 * 1024)
    assert(r.strategy == "sort-merge+aqe-skew",
      s"64 x ~100KB source (~6 MB) must exceed a 1 MB broadcast threshold, got ${r.strategy}")
    assert(r.matchedRows == 64)
    assert(t.scan().filter(col("caption").startsWith("payload cap")).count() == 64)
  }

  test("bulk insert batch writes distributed (multiple files, not coalesce(1))") {
    import spark.implicits._
    val t = TestFixtures.freshTable("merge-bulk-insert")
    val png = graft.images.ImageCodec.encodePng(noiseImage(96, 96, seed = 3L))
    val src = (0 until 600).map(i => (f"new-$i%012d", s"inserted $i", png))
      .toDF("image_id", "caption", "bytes")
    // Shrink the AQE coalesce target so "distributed write" is observable at
    // test scale (production advisory is 64 MB; a small batch SHOULD coalesce
    // to one file there — the property under test is that a batch larger
    // than the advisory size fans out instead of funneling through one task).
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "65536")
    val r = try MergeInto.run(t, src)
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    assert(r.insertedRows == 600)
    val insertFiles = t.currentSnapshot.summary("added-files").toInt - r.updatedFiles
    assert(insertFiles > 1,
      s"a 600-row bulk insert must not funnel through one task/file (got $insertFiles)")
    assert(t.scan().filter(col("image_id").startsWith("new-")).count() == 600)
  }

  /** Incompressible fixture payload (random pixels defeat PNG compression). */
  private def noiseImage(w: Int, h: Int, seed: Long): java.awt.image.BufferedImage = {
    val rng = new scala.util.Random(seed)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rng.nextInt()); x += 1 }
      y += 1
    }
    img
  }
}
