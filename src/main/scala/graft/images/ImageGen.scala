package graft.images

import java.awt.{Color, GradientPaint}
import java.awt.image.BufferedImage
import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.types._

/**
 * Deterministic synthetic image+caption generator (FIXTURES.md §1).
 *
 * Seeded per row index: procedurally drawn gradients + shapes; a fraction of
 * rows are near-duplicate perturbations of cluster base images, which gives
 * hot phash buckets (skew fixture for MERGE; analog of the reference's
 * deterministic mock extractor over a fixed corpus,
 * /root/reference/test/e2e.e2e.test.ts:64-180).
 *
 * Generation runs distributed: a range Dataset of row indices mapped to rows
 * on executors — no driver-side materialization, so fixture scale is bounded
 * by cluster, not driver, memory.
 */
object ImageGen {
  val Sizes: Array[Int] = Array(32, 48, 64, 96, 128)
  val CaptionWords: Array[String] = Array(
    "marley", "was", "dead", "to", "begin", "with", "scrooge", "knew", "he",
    "the", "ghost", "of", "christmas", "past", "bright", "clear", "jet",
    "light", "winter", "fog", "and", "frost", "old", "door", "knocker")

  /** Fraction of rows that belong to a near-duplicate cluster. */
  val DupFraction = 0.25
  /** Number of distinct near-duplicate cluster bases. */
  val DupClusters = 8

  case class Spec(i: Long, seed: Long) {
    val rng = new Random(seed * 6364136223846793005L + i * 1442695040888963407L)
  }

  def caption(i: Long, rng: Random, cluster: Option[Int]): String = {
    val base = cluster match {
      case Some(c) => new Random(9000L + c) // cluster rows share caption style
      case None    => rng
    }
    val n = 5 + base.nextInt(8)
    val words = Seq.fill(n)(CaptionWords(base.nextInt(CaptionWords.length)))
    s"${words.mkString(" ")} #$i"
  }

  def drawBase(w: Int, h: Int, rng: Random): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    val c1 = new Color(rng.nextInt(256), rng.nextInt(256), rng.nextInt(256))
    val c2 = new Color(rng.nextInt(256), rng.nextInt(256), rng.nextInt(256))
    g.setPaint(new GradientPaint(0, 0, c1, w.toFloat, h.toFloat, c2))
    g.fillRect(0, 0, w, h)
    val shapes = 2 + rng.nextInt(4)
    for (_ <- 0 until shapes) {
      g.setColor(new Color(rng.nextInt(256), rng.nextInt(256), rng.nextInt(256)))
      val x = rng.nextInt(w); val y = rng.nextInt(h)
      val sw = 4 + rng.nextInt(math.max(1, w / 2)); val sh = 4 + rng.nextInt(math.max(1, h / 2))
      if (rng.nextBoolean()) g.fillOval(x, y, sw, sh) else g.fillRect(x, y, sw, sh)
    }
    g.dispose()
    img
  }

  /** Tiny luminance perturbation that keeps the 8x8 average-hash identical
    * or within a few bits — a near-duplicate. */
  def perturb(img: BufferedImage, rng: Random): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
    val d = 1 + rng.nextInt(3)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        def ch(s: Int): Int = math.min(255, math.max(0, ((p >> s) & 0xff) + d))
        out.setRGB(x, y, (ch(16) << 16) | (ch(8) << 8) | ch(0))
        x += 1
      }
      y += 1
    }
    out
  }

  /** One deterministic row. `sizes` controls the drawn dimensions (bench
    * uses larger images so IO, not job overhead, dominates). */
  def row(i: Long, seed: Long, sizes: Array[Int] = Sizes): (String, Array[Byte], Int, Int, String, String, Long) = {
    val spec = Spec(i, seed)
    val rng = spec.rng
    val isDup = rng.nextDouble() < DupFraction
    val cluster = if (isDup) Some(rng.nextInt(DupClusters)) else None
    val (img, w, h) = cluster match {
      case Some(c) =>
        val crng = new Random(7777L + c)
        val w = sizes(crng.nextInt(sizes.length)); val h = sizes(crng.nextInt(sizes.length))
        val base = drawBase(w, h, new Random(8888L + c))
        (perturb(base, rng), w, h)
      case None =>
        val w = sizes(rng.nextInt(sizes.length)); val h = sizes(rng.nextInt(sizes.length))
        (drawBase(w, h, rng), w, h)
    }
    val fmt = if (rng.nextDouble() < 0.3) "jpg" else "png"
    val bytes = ImageCodec.encode(img, fmt)
    val cap = caption(i, rng, cluster)
    val ph = ImageCodec.phash(bytes)
    (f"img-$i%012d", bytes, w, h, fmt, cap, ph)
  }

  val schema: StructType = StructType(Seq(
    StructField("image_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("caption", StringType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** Distributed deterministic generation of `n` rows. */
  def df(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 32, sizes: Array[Int] = Sizes): DataFrame = {
    import spark.implicits._
    val ids = spark.range(0, n, 1, partitions)
    val rows = ids.map { i =>
      val (id, b, w, h, f, c, p) = row(i, seed, sizes)
      (id, b, w, h, f, c, p)
    }.toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    rows
  }
}
