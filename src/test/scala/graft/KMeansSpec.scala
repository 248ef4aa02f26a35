package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeans

/** Offline IVF centroid training (KMeans.fit): cluster recovery on a seeded
  * fixture, bit-reproducibility across partition counts, and the documented
  * degenerate cases. */
class KMeansSpec extends GraftSuite {

  /** 3 well-separated planted clusters in 4-d, 60 points each, deterministic
    * pseudo-noise (no Random: reproducible by construction). */
  private def fixture(parts: Int) = {
    import spark.implicits._
    val centers = Seq(
      Array(10.0, 0.0, 0.0, 0.0),
      Array(0.0, 10.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 0.0))
    val rows = for {
      c <- centers.indices
      j <- 0 until 60
    } yield {
      val id = (c * 60 + j + 1).toLong
      // noise in [-0.5, 0.5), varying per (id, dim) — far below separation.
      val v = centers(c).zipWithIndex.map { case (x, dim) =>
        (x + (((id * 31 + dim * 17) % 100) - 50) / 100.0).toFloat }
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").repartition(parts)
  }

  test("recovers planted clusters; sizes and centroids match the plant") {
    val df = fixture(4)
    // Seeds: one point from each planted cluster.
    val r = KMeans.fit(df, "embedding", "vec_id", initIds = Seq(1L, 61L, 121L),
      iters = 3)
    assert(r.sizes.values.toSeq.sorted == Seq(60L, 60L, 60L),
      s"each planted cluster recovered whole: ${r.sizes}")
    // Each trained centroid sits at a planted center (within the noise
    // bound, scaled 1e6): dominant component ~10e6, others < 1e6.
    val doms = r.centroids.map { case (_, cv) =>
      val i = cv.indices.maxBy(cv(_))
      assert(cv(i) > 9000000L && cv(i) < 11000000L, s"dominant ${cv.toSeq}")
      cv.indices.filterNot(_ == i).foreach(j =>
        assert(math.abs(cv(j)) < 1000000L, s"off-axis ${cv.toSeq}"))
      i
    }
    assert(doms.toSet == Set(0, 1, 2), "one centroid per planted axis")
  }

  test("fixed-point fit is bit-identical across partition counts") {
    val r2 = KMeans.fit(fixture(2), "embedding", "vec_id",
      initIds = Seq(1L, 61L, 121L), iters = 3)
    val r16 = KMeans.fit(fixture(16), "embedding", "vec_id",
      initIds = Seq(1L, 61L, 121L), iters = 3)
    assert(r2.centroids.map { case (c, v) => (c, v.toSeq) } ==
      r16.centroids.map { case (c, v) => (c, v.toSeq) },
      "float-sum reduction order must not leak into the result")
    assert(r2.sizes == r16.sizes)
  }

  test("empty cluster keeps its previous centroid; missing init id rejected") {
    import spark.implicits._
    // Seeds 1 and 2 are IDENTICAL points: every tie breaks to the smaller
    // cid, so cluster 2 is EMPTY after the first update and must carry its
    // centroid forward (deterministically, no re-seeding) instead of
    // crashing or vanishing. By iteration 2 the carried centroid (still at
    // the origin) reclaims the origin points while centroid 1 drifts to the
    // outlier — the carry is observable in the final state.
    val pts = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(0f, 0f)),
      (4L, Seq(0.4f, 0f))).toDF("vec_id", "embedding")
    val r = KMeans.fit(pts, "embedding", "vec_id", initIds = Seq(1L, 2L),
      iters = 2)
    val byCid = r.centroids.toMap
    assert(byCid(2L).toSeq == Seq(0L, 0L),
      s"empty cluster carried its centroid: ${r.centroids}")
    assert(byCid(1L).toSeq == Seq(400000L, 0L),
      s"centroid 1 converged on the outlier: ${r.centroids}")
    assert(r.sizes == Map(1L -> 1L, 2L -> 3L), s"sizes: ${r.sizes}")
    intercept[IllegalArgumentException] {
      KMeans.fit(pts, "embedding", "vec_id", initIds = Seq(999L), iters = 1)
    }
  }

  test("fixed-point magnitude bound: out-of-contract inputs fail fast instead of wrapping Long") {
    import spark.implicits._
    // dims=2 -> maxSafeScaled ~ 1.07e9 scaled = ~1073 original units. A
    // 1e4-unit component would overflow (x-y)^2 silently; the fit must
    // refuse it at seed validation.
    val big = Seq((1L, Seq(10000f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      KMeans.fit(big, "embedding", "vec_id", initIds = Seq(1L, 2L), iters = 1)
    }
    assert(e.getMessage.contains("distance bound"), e.getMessage)
    // In-contract magnitudes (the documented bound) still fit.
    assert(KMeans.maxSafeScaled(64) > 100L * KMeans.Scale,
      "normalized embeddings sit far inside the bound at typical dims")
    val ok = Seq((1L, Seq(100f, 0f)), (2L, Seq(0f, 100f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val r = KMeans.fit(ok, "embedding", "vec_id", initIds = Seq(1L, 2L), iters = 1)
    assert(r.centroids.size == 2)
  }
}
