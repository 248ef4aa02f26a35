package graft

import org.apache.spark.sql.functions._

import graft.jobs.DedupPhash
import graft.table.GraftTable

/** Hot-bucket skew fixture (north rule: explicit handling for hot phash
  * buckets): the same images re-appended under new ids — the classic
  * duplicated-training-image case — until single phash values hold the
  * majority of all rows. The salted two-stage canonical selection must both
  * survive the skew and produce the exact per-group result. */
class DedupSkewSpec extends GraftSuite {

  test("dedup collapses a 4x-replicated table with hot phash buckets") {
    val t = TestFixtures.freshTable("dedup-skew")
    val base = t.scan()
    // Re-append the whole table 3x under fresh ids: every phash bucket now
    // holds >= 4 identical-pixel rows; the fixture's near-dup cluster
    // buckets become hot (hundreds of rows on one phash).
    for (i <- 1 to 3) {
      GraftTable.append(t, base
        .withColumn("image_id", concat(col("image_id"), lit(s"-copy$i"))))
    }
    val total = t.scan().count()
    assert(total == 4L * TestFixtures.BaseRows)
    val hot = t.scan().groupBy("phash").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(hot >= 150, s"expected a hot bucket (>=150 rows on one phash), got $hot")

    val distinctPhash = t.scan().select("phash").distinct().count()
    val res = DedupPhash.run(t)
    assert(res.victims == total - distinctPhash)
    assert(t.scan().count() == distinctPhash)
    // Exactly one row per phash remains; canonical has the longest caption.
    assert(t.scan().groupBy("phash").count()
      .agg(max("count")).collect().head.getLong(0) == 1L)
  }
}
