package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.images.{ImageCodec, ImageGen}

class ImageCodecSpec extends AnyFunSuite {

  test("png roundtrip is lossless; jpg re-encode stays above the 40dB PSNR gate") {
    val rng = new Random(7)
    for (i <- 0 until 10) {
      val img = ImageGen.drawBase(64, 64, rng)
      val png = ImageCodec.encodePng(img)
      assert(ImageCodec.psnr(img, ImageCodec.decode(png)) == Double.PositiveInfinity)
      val jpg = ImageCodec.encodeJpg(img)
      val p = ImageCodec.psnr(img, ImageCodec.decode(jpg))
      assert(p >= 40.0, s"sample $i: jpg psnr $p below the 40dB invariant")
    }
  }

  test("phash is deterministic and invariant under lossless re-encode") {
    val rng = new Random(11)
    val img = ImageGen.drawBase(96, 48, rng)
    val png = ImageCodec.encodePng(img)
    assert(ImageCodec.phash(png) == ImageCodec.phash(ImageCodec.encodePng(ImageCodec.decode(png))))
  }

  test("near-duplicate perturbation keeps phash within a small hamming distance") {
    val rng = new Random(13)
    for (i <- 0 until 8) {
      val base = ImageGen.drawBase(64, 64, new Random(100 + i))
      val near = ImageGen.perturb(base, rng)
      val d = java.lang.Long.bitCount(
        ImageCodec.averageHash64(base) ^ ImageCodec.averageHash64(near))
      assert(d <= 4, s"cluster $i: perturbed hamming distance $d too large")
    }
  }

  test("generator manufactures hot phash buckets (skew fixture)") {
    val rows = (0L until 300L).map(i => ImageGen.row(i, seed = 42L))
    val hist = rows.groupBy(_._7).view.mapValues(_.size).values.toSeq.sorted.reverse
    assert(hist.head >= 10, s"expected a hot phash bucket, top=${hist.take(5)}")
  }

  test("generator rows are deterministic") {
    val a = ImageGen.row(17L, 42L)
    val b = ImageGen.row(17L, 42L)
    assert(a._1 == b._1 && a._7 == b._7 && java.util.Arrays.equals(a._2, b._2))
  }
}
