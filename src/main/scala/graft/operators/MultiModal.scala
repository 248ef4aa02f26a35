package graft.operators

import java.awt.image.BufferedImage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.images.ImageCodec

/**
 * Multimodal-column operators for a training-data pipeline: media as opaque
 * binary columns + typed metadata, with decode / feature-extract / resize /
 * frame-sample stages (re-grounding the reference's pluggable
 * DocumentParser, core/src/interfaces/parser.ts:8-12).
 *
 * Image ops are REAL (javax.imageio decode on executors), and audio is
 * REAL for the PCM containers the JDK ships codecs for (WAV/AIFF/AU via
 * javax.sound.sampled — [[audioFeatures]]). Compressed-audio and video
 * decoders are NOT available in this container, so those are
 * DETERMINISTIC STUBS (clearly marked): the Spark-side plumbing — schema,
 * batch shape, partition-parallel execution — is real and tested; only the
 * codec call is faked with a seeded transform of the payload bytes.
 *
 * Scale notes: every op is a scalar expression or UDF over one row's payload
 * — embarrassingly parallel, no shuffle; the decode cost dominates so these
 * stages should run on the most partitions available (repartition before if
 * upstream produced few large files).
 */
object MultiModal {

  // ------------------------------------------------------------- image (real)

  /** Decode image dims without materializing pixels in the row. */
  def imageMeta(bytes: Column): Column = graft.expr.functions.decode_wh(bytes)

  /** Re-encode at a new size (bilinear); stays png to remain lossless. */
  val imageResize = udf((b: Array[Byte], w: Int, h: Int) => {
    val img = ImageCodec.decode(b)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    ImageCodec.encodePng(out)
  })

  /** 16-bin luma histogram, L1-normalized — a real image feature vector. */
  val imageHistogram = udf((b: Array[Byte]) => {
    val img = ImageCodec.decode(b)
    val bins = new Array[Double](16)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        bins((ImageCodec.luma(img.getRGB(x, y)) / 16).toInt.min(15)) += 1
        x += 1
      }
      y += 1
    }
    val n = (img.getWidth * img.getHeight).toDouble
    bins.map(_ / n)
  })

  // ------------------------------------------- audio (REAL for PCM containers)

  /** REAL audio decode for the containers the JDK itself ships codecs for
    * (WAV / AIFF / AU, PCM or a-law/mu-law via conversion): duration,
    * RMS amplitude (normalized to [0,1]) and zero-crossing count over the
    * first channel, computed from the actual decoded samples via
    * `javax.sound.sampled` — no external codec needed. Compressed formats
    * (mp3/ogg/aac) have no JDK service provider in this container and
    * throw UnsupportedAudioFileException — route those to
    * [[audioFeaturesStub]] until a real codec is available. Scalar
    * per-payload work: embarrassingly parallel, no shuffle. */
  val audioFeatures = udf((b: Array[Byte]) => {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    // SQL null-in-null-out: a mixed-modality table's null audio payloads
    // must not NPE the task (None -> null struct).
    if (b == null) None
    else {
    val in = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val src = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
        src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      try {
        val buf = pcm.readAllBytes()
        val ch = target.getChannels
        val frameBytes = ch * 2
        val frames = buf.length / frameBytes
        var sumSq = 0.0
        var zc = 0L
        var prevNeg = false
        var f = 0
        while (f < frames) {
          val o = f * frameBytes // channel 0, little-endian 16-bit
          val s = ((buf(o + 1) << 8) | (buf(o) & 0xff)).toShort.toInt
          sumSq += s.toDouble * s
          val neg = s < 0
          if (f > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          f += 1
        }
        val durationMs = (frames * 1000.0 / target.getSampleRate).toLong
        val rms = if (frames == 0) 0.0 else math.sqrt(sumSq / frames) / 32768.0
        Some((durationMs, rms, zc))
      } finally pcm.close()
    } finally in.close()
    }
  })

  // ----------------------------------- audio (compressed) / video (STUBS)

  /** STUB for COMPRESSED audio (mp3/ogg/aac — no codec in this
    * container; WAV/AIFF/AU decode for real via [[audioFeatures]]). Emits
    * deterministic pseudo-PCM stats derived from the payload bytes so the
    * pipeline shape (binary -> fixed feature schema) is real end-to-end.
    * Replace the body with a real decoder (e.g. ffmpeg bindings) when
    * available. */
  val audioFeaturesStub = udf((b: Array[Byte]) =>
    if (b == null) None
    else {
      var h = 1125899906842597L
      var i = 0
      while (i < b.length) { h = 31 * h + b(i); i += 1 }
      val rng = new scala.util.Random(h)
      val durationMs = 1000L + (math.abs(h) % 9000L) // fake duration
      val rms = rng.nextDouble()
      val zeroCrossings = rng.nextInt(10000).toLong
      Some((durationMs, rms, zeroCrossings))
    })

  /** STUB video frame sampler: emits k deterministic per-frame signatures
    * (64-bit) derived from (payload, frameIdx). Real implementation would
    * decode container + keyframes; the explode/posexplode downstream shape
    * is the real one. */
  val videoFrameSigsStub = udf((b: Array[Byte], k: Int) =>
    if (b == null) None
    else {
      var h = 1125899906842597L
      var i = 0
      while (i < b.length) { h = 31 * h + b(i); i += 1 }
      Some((0 until k).map(f => h ^ (0x9e3779b97f4a7c15L * (f + 1))).toArray)
    })

  // --------------------------------------------------------------- pipelines

  /** Attach decoded metadata + features to an image table — the canonical
    * enrich stage. Single narrow pass: no shuffle, payload read once. */
  def enrichImages(df: DataFrame): DataFrame =
    df.withColumn("__meta", imageMeta(col("bytes")))
      .withColumn("decoded_w", col("__meta.w"))
      .withColumn("decoded_h", col("__meta.h"))
      .drop("__meta")
      .withColumn("luma_hist", imageHistogram(col("bytes")))

  /** Thumbnail stage: resize everything to at most `maxDim` preserving none
    * of the aspect (fixture images are synthetic); recomputes w/h/phash so
    * the table invariant (stats derivable from bytes) holds. */
  def thumbnails(df: DataFrame, maxDim: Int): DataFrame =
    df.withColumn("bytes", imageResize(col("bytes"),
        least(col("w"), lit(maxDim)), least(col("h"), lit(maxDim))))
      .withColumn("w", least(col("w"), lit(maxDim)))
      .withColumn("h", least(col("h"), lit(maxDim)))
      .withColumn("fmt", lit("png"))
      .withColumn("phash", graft.expr.functions.phash64(col("bytes")))
}
