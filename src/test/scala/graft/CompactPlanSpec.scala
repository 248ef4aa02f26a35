package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.Compact
import graft.table.{ColStats, DataFileMeta}

/** FFD packing invariants (SURVEY.md §5 property tests): capacity respected,
  * every candidate placed at most once, no file in two bins, determinism. */
class CompactPlanSpec extends AnyFunSuite {

  private def files(sizes: Seq[Long]): Seq[DataFileMeta] =
    sizes.zipWithIndex.map { case (sz, i) =>
      DataFileMeta(f"data/x/f$i%05d.parquet", sz, 10, Map.empty[String, ColStats])
    }

  test("FFD invariants over seeded random size distributions") {
    val rng = new scala.util.Random(99)
    for (trial <- 0 until 50) {
      val n = 1 + rng.nextInt(300)
      val target = 1000L + rng.nextInt(100000)
      val sizes = Seq.fill(n)((rng.nextDouble() * rng.nextDouble() * target * 1.5).toLong max 1L)
      val fs = files(sizes)
      val bins = Compact.plan(fs, target)

      // Capacity: no bin exceeds target (candidates are all < threshold so
      // no single-oversized-file exception can occur).
      bins.foreach { b =>
        assert(b.map(_.fileSizeBytes).sum <= target,
          s"trial $trial: bin over capacity")
      }
      // Uniqueness: each file placed at most once.
      val placed = bins.flatten.map(_.path)
      assert(placed.distinct.size == placed.size, s"trial $trial: file placed twice")
      // Only small-file candidates participate.
      val threshold = (target * 0.75).toLong
      bins.flatten.foreach(f => assert(f.fileSizeBytes < threshold))
      // Every bin merges at least two files (singleton bins dropped).
      bins.foreach(b => assert(b.size >= 2))
      // Determinism.
      assert(Compact.plan(fs, target) == bins)
    }
  }

  test("packing quality: bins are reasonably full (FFD guarantee)") {
    val rng = new scala.util.Random(7)
    val target = 100000L
    val fs = files(Seq.fill(500)((rng.nextDouble() * 60000).toLong max 1L))
    val bins = Compact.plan(fs, target)
    // All but at most one bin should be at least half full — a weak but
    // robust consequence of first-fit: two half-empty bins would have been
    // merged by first-fit placement.
    val underHalf = bins.count(_.map(_.fileSizeBytes).sum < target / 2)
    assert(underHalf <= 1, s"$underHalf bins under half capacity")
  }
}
