package graft.images

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/**
 * JDK-only (javax.imageio) image encode/decode + pixel math. Plays the role
 * of the reference's pluggable DocumentParser / Embedder pair
 * (core/src/interfaces/parser.ts:8-12, embedder.ts:6-12): bytes -> decoded
 * representation -> deterministic signature (phash).
 *
 * All functions are pure and deterministic for a fixed JVM, which is what the
 * PSNR>=40dB re-encode invariant needs.
 */
object ImageCodec {

  /** Container format from magic bytes (png/jpg; "unknown" otherwise). */
  def detectFmt(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpg"
    else "unknown"

  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** High-quality JPEG (q=0.95) with chroma subsampling disabled (4:4:4 via
    * the sof componentSpec sampling factors). The JDK writer's default 4:2:0
    * caps PSNR near 31dB on sharp chroma edges regardless of quality; 4:4:4
    * at q=0.95 clears the 40dB invariant. JPEG needs an alpha-free raster. */
  def encodeJpg(img: BufferedImage, quality: Float = 0.95f): Array[Byte] = {
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = c.createGraphics()
        g.drawImage(img, 0, 0, null); g.dispose(); c
      }
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val typ = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(rgb)
    val md = writer.getDefaultImageMetadata(typ, param)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val root = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val sofs = root.getElementsByTagName("sof")
    if (sofs.getLength > 0) {
      val comps = sofs.item(0).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("componentSpec")
      var i = 0
      while (i < comps.getLength) {
        val c = comps.item(i).asInstanceOf[org.w3c.dom.Element]
        c.setAttribute("HsamplingFactor", "1")
        c.setAttribute("VsamplingFactor", "1")
        i += 1
      }
      md.setFromTree(fmt, root)
    }
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(rgb, null, md), param)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  def encode(img: BufferedImage, fmt: String): Array[Byte] = fmt match {
    case "png" => encodePng(img)
    case "jpg" | "jpeg" => encodeJpg(img)
    case other => throw new IllegalArgumentException(s"unsupported fmt: $other")
  }

  /** Luma (BT.601) of an ARGB int, 0..255. */
  @inline def luma(argb: Int): Double = {
    val r = (argb >> 16) & 0xff; val g = (argb >> 8) & 0xff; val b = argb & 0xff
    0.299 * r + 0.587 * g + 0.114 * b
  }

  /** 64-bit average hash: decode -> 8x8 box-downsampled grayscale -> bit i set
    * iff cell luma > mean. DCT-free per SURVEY.md §7.1; near-duplicate images
    * (the generator's perturbation clusters) collide, manufacturing the hot
    * phash buckets the MERGE skew path must handle. */
  def averageHash64(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val cells = new Array[Double](64)
    val counts = new Array[Int](64)
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val cx = math.min(7, x * 8 / w)
        val i = cy * 8 + cx
        cells(i) += luma(img.getRGB(x, y)); counts(i) += 1
        x += 1
      }
      y += 1
    }
    var i = 0; var mean = 0.0
    while (i < 64) { cells(i) = if (counts(i) > 0) cells(i) / counts(i) else 0.0; mean += cells(i); i += 1 }
    mean /= 64
    var bits = 0L; i = 0
    while (i < 64) { if (cells(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  def phash(bytes: Array[Byte]): Long = averageHash64(decode(bytes))

  /** PSNR in dB between two decoded images over RGB channels.
    * Double.PositiveInfinity for identical pixels. */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight,
      s"psnr dims mismatch: ${a.getWidth}x${a.getHeight} vs ${b.getWidth}x${b.getHeight}")
    var se = 0.0; var n = 0L
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var s = 16
        while (s >= 0) {
          val d = ((pa >> s) & 0xff) - ((pb >> s) & 0xff)
          se += d.toDouble * d; n += 1
          s -= 8
        }
        x += 1
      }
      y += 1
    }
    val mse = se / n
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  def psnrBytes(a: Array[Byte], b: Array[Byte]): Double = psnr(decode(a), decode(b))
}
