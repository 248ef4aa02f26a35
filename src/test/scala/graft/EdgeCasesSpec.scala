package graft

import org.apache.spark.sql.functions._

import graft.jobs.{Compact, ExpireSnapshots, MergeInto}

class EdgeCasesSpec extends GraftSuite {

  test("compact is a no-op when no small files exist") {
    val t = TestFixtures.freshTable("edge-compact-noop")
    Compact.run(t, targetBytes = 4L * 1024 * 1024) // collapses everything
    val snapBefore = t.currentSnapshot.snapshotId
    // Target so small every file exceeds the small-file threshold.
    val res = Compact.run(t, targetBytes = 1024)
    assert(res.snapshot.isEmpty && res.binsPlanned == 0)
    assert(t.currentSnapshot.snapshotId == snapBefore)
  }

  test("merge with an empty source commits nothing") {
    import spark.implicits._
    val t = TestFixtures.freshTable("edge-merge-empty")
    val snapBefore = t.currentSnapshot.snapshotId
    val res = MergeInto.run(t, Seq.empty[(String, String)].toDF("image_id", "caption"))
    assert(res.snapshot.isEmpty)
    assert(t.currentSnapshot.snapshotId == snapBefore)
  }

  test("merge source keys matching nothing insert nothing without bytes") {
    import spark.implicits._
    val t = TestFixtures.freshTable("edge-merge-miss")
    val before = t.scan().count()
    val res = MergeInto.run(t, Seq(("img-does-not-exist", "caption"))
      .toDF("image_id", "caption"))
    assert(res.insertedRows == 0)
    assert(t.scan().count() == before)
  }

  test("expire retaining every snapshot deletes nothing") {
    val t = TestFixtures.freshTable("edge-expire-all")
    Compact.run(t, targetBytes = 4L * 1024 * 1024)
    val all = t.meta.snapshots.map(_.snapshotId)
    val res = ExpireSnapshots.run(t, retain = all)
    assert(res.expiredSnapshots.isEmpty && res.deletedDataFiles == 0)
    assert(t.scan().count() == TestFixtures.BaseRows)
  }

  test("scan of an unknown snapshot id fails loudly (no silent fallback)") {
    val t = TestFixtures.baseTable
    val e = intercept[IllegalArgumentException](t.scan(Some(99999L)))
    assert(e.getMessage.contains("unknown snapshot id 99999"))
  }
}
