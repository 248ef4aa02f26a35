package graft

import java.nio.file.{Files, Paths}

import graft.jobs.{Compact, ExpireSnapshots}
import graft.table.GraftTable

/** Refcount-cascade fixtures (FIXTURES.md §2; reference behavior:
  * pipeline.test.ts:641-853 refcount delete variants). */
class ExpireSnapshotsSpec extends GraftSuite {

  test("expire deletes only files unreachable from every retained snapshot; shared files survive") {
    val t = TestFixtures.freshTable("expire-shared")
    val s1 = t.currentSnapshot.snapshotId // append snapshot

    // Compact creates s2; s1 and s2 SHARE zero data files (full rewrite),
    // but append more rows to s2 -> s3 shares s2's files via manifest reuse.
    Compact.run(t, targetBytes = 4L * 1024 * 1024)
    val s2 = t.currentSnapshot.snapshotId
    val s2Files = t.currentFiles.map(_.path).toSet
    GraftTable.append(t, graft.images.ImageGen.df(spark, 50, seed = 99L, partitions = 2))
    val s3 = t.currentSnapshot.snapshotId
    assert(t.currentFiles.map(_.path).toSet.intersect(s2Files) == s2Files,
      "append must share the compacted files via manifest reuse")

    // Expire s1 and s2, retain s3: s1's original files die; s2's files
    // survive because s3 still references them (shared manifest).
    val res = ExpireSnapshots.run(t, retain = Seq(s3))
    assert(res.expiredSnapshots.toSet == Set(s1, s2))
    assert(res.deletedDataFiles > 0, "s1's small files must be deleted")
    s2Files.foreach { p =>
      assert(Files.exists(Paths.get(s"${t.root}/$p")), s"shared file $p must survive")
    }
    // The retained snapshot still reads perfectly.
    assert(t.scan().count() == TestFixtures.BaseRows + 50)
  }

  test("expire refuses to drop the current snapshot") {
    val t = TestFixtures.freshTable("expire-refuse")
    val cur = t.currentSnapshot.snapshotId
    Compact.run(t, targetBytes = 4L * 1024 * 1024)
    intercept[IllegalArgumentException] {
      ExpireSnapshots.run(t, retain = Seq(cur)) // retains only the OLD one
    }
  }

  test("orphan sweep removes uncommitted unit outputs but never live files") {
    val t = TestFixtures.freshTable("expire-orphans")
    // Simulate a killed job: write data files that no manifest references.
    val orphanDf = graft.images.ImageGen.df(spark, 20, seed = 5L, partitions = 1)
    t.writeDataFiles(orphanDf) // returns metadata but we never commit it
    val liveCount = t.scan().count()
    // orphanMinAgeMs = 0: production default is 1h (so in-flight writers'
    // uncommitted outputs survive); tests sweep immediately.
    val res = ExpireSnapshots.run(t, retain = Seq(t.currentSnapshot.snapshotId),
      orphanMinAgeMs = 0L)
    assert(res.orphansSwept > 0, "uncommitted unit outputs must be swept")
    assert(t.scan().count() == liveCount)
  }

  test("orphan sweep min-age guard protects just-written uncommitted outputs") {
    val t = TestFixtures.freshTable("expire-minage")
    t.writeDataFiles(graft.images.ImageGen.df(spark, 20, seed = 5L, partitions = 1))
    val res = ExpireSnapshots.run(t, retain = Seq(t.currentSnapshot.snapshotId))
    assert(res.orphansSwept == 0, "default min-age must protect fresh files")
  }

  test("concurrent snapshot committed after planning survives the expire CAS retry") {
    val t = TestFixtures.freshTable("expire-race")
    val s1 = t.currentSnapshot.snapshotId
    Compact.run(t, targetBytes = 4L * 1024 * 1024)
    val s2 = t.currentSnapshot.snapshotId
    // A writer commits between expire's planning and its CAS: the refreshed
    // current pointer must be re-validated (not silently dropped), so
    // expire(retain=s2) refuses once current has moved to s3.
    GraftTable.append(t, graft.images.ImageGen.df(spark, 10, seed = 7L, partitions = 1))
    val s3 = t.currentSnapshot.snapshotId
    intercept[IllegalArgumentException] {
      ExpireSnapshots.run(t, retain = Seq(s2)) // current is s3 now
    }
    // Retaining the true current works and expires only the old ones.
    val res = ExpireSnapshots.run(t, retain = Seq(s3), orphanMinAgeMs = 0L)
    assert(res.expiredSnapshots.toSet == Set(s1, s2))
    assert(t.meta.snapshots.map(_.snapshotId) == Seq(s3))
  }

  test("physical deletes above the driver cutoff run distributed across partitions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = TestFixtures.workRoot.resolve("expire-dist-del")
    Files.createDirectories(root.resolve("data"))
    // Strictly above DriverDeleteMax so the foreachPartition branch (no
    // driver-side full iteration) is the one exercised, spread over 8
    // shuffle partitions.
    val n = ExpireSnapshots.DriverDeleteMax + 48
    val rels = (0 until n).map { i =>
      val rel = s"data/f$i.parquet"
      Files.write(root.resolve(rel), Array[Byte](1, 2, 3))
      rel
    }
    val listed = rels.toDF("path")
      .withColumn("fileSizeBytes", lit(3L)).repartition(8)
    val (cnt, bytes) = ExpireSnapshots.deleteListed(spark, root.toString, listed)
    assert(cnt == n.toLong, s"expected $n deletions, got $cnt")
    assert(bytes == 3L * n)
    assert(rels.forall(r => !Files.exists(root.resolve(r))))
    // Idempotent on re-run: nothing left to delete.
    assert(ExpireSnapshots.deleteListed(spark, root.toString, listed) == ((0L, 0L)))
  }

  test("reachability helper computes multi-hop closure") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val r = ExpireSnapshots.reachable(spark, edges, seeds)
      .as[String].collect().toSet
    assert(r == Set("a", "b", "c", "d"))
  }
}
