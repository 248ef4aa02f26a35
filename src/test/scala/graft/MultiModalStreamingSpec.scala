package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.MultiModal
import graft.streaming.StreamingIngest
import graft.table.GraftTable

class MultiModalStreamingSpec extends GraftSuite {

  test("image enrich: decoded dims match stored w/h; histograms are normalized features") {
    val t = TestFixtures.baseTable
    val enriched = MultiModal.enrichImages(t.scan().limit(50)).cache()
    val bad = enriched.filter(col("decoded_w") =!= col("w") ||
      col("decoded_h") =!= col("h")).count()
    assert(bad == 0, "decoded dims must equal stored metadata")
    enriched.select("luma_hist").collect().foreach { r =>
      val h = r.getSeq[Double](0)
      assert(h.length == 16)
      assert(math.abs(h.sum - 1.0) < 1e-9)
    }
    enriched.unpersist()
  }

  test("thumbnails recompute w/h/phash from the new bytes (table invariant holds)") {
    val t = TestFixtures.baseTable
    val th = MultiModal.thumbnails(t.scan().limit(20), maxDim = 32)
    val rows = th.select("bytes", "w", "h", "phash").collect()
    rows.foreach { r =>
      val img = graft.images.ImageCodec.decode(r.getAs[Array[Byte]](0))
      assert(img.getWidth == r.getInt(1) && img.getHeight == r.getInt(2))
      assert(img.getWidth <= 32 && img.getHeight <= 32)
      assert(graft.images.ImageCodec.phash(r.getAs[Array[Byte]](0)) == r.getLong(3))
    }
  }

  test("audioFeatures REALLY decodes PCM WAV: duration, RMS and zero crossings match the synthesized signal") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // Synthesize WAVs in-memory: sineHz at 8 kHz mono 16-bit for `secs`.
    def wav(sineHz: Double, secs: Double, amp: Double): Array[Byte] = {
      val rate = 8000
      val n = (rate * secs).toInt
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = (math.sin(2 * math.Pi * sineHz * i / rate) * amp * 32767).toInt
        pcm(i * 2) = (s & 0xff).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
      val out = new java.io.ByteArrayOutputStream()
      val ain = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      AudioSystem.write(ain, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rows = Seq(
      ("a440", wav(440.0, 1.0, 0.8)),
      ("a100", wav(100.0, 2.0, 0.4)),
      ("silence", wav(440.0, 0.5, 0.0)))
      .toDF("id", "bytes")
      .withColumn("f", MultiModal.audioFeatures(col("bytes")))
      .select(col("id"), col("f._1").as("ms"), col("f._2").as("rms"), col("f._3").as("zc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // Duration from the DECODED frame count, not metadata guesswork.
    assert(rows("a440")._1 == 1000L && rows("a100")._1 == 2000L && rows("silence")._1 == 500L)
    // A sine's RMS is amp/sqrt(2); zero crossings = 2 per cycle.
    assert(math.abs(rows("a440")._2 - 0.8 / math.sqrt(2)) < 0.01, rows("a440").toString)
    assert(math.abs(rows("a100")._2 - 0.4 / math.sqrt(2)) < 0.01, rows("a100").toString)
    assert(rows("silence")._2 == 0.0 && rows("silence")._3 == 0L)
    assert(math.abs(rows("a440")._3 - 880L) <= 2, s"440 Hz x 2/cycle: ${rows("a440")._3}")
    assert(math.abs(rows("a100")._3 - 400L) <= 2, s"100 Hz x 2/cycle: ${rows("a100")._3}")
    // Non-audio bytes fail loudly (route compressed formats to the stub);
    // a NULL payload — the normal mixed-modality shape — is SQL null-out.
    intercept[Exception] {
      Seq(("bad", Array[Byte](1, 2, 3))).toDF("id", "bytes")
        .select(MultiModal.audioFeatures(col("bytes"))).collect()
    }
    val nul = Seq(("none", null.asInstanceOf[Array[Byte]])).toDF("id", "bytes")
      .select(MultiModal.audioFeatures(col("bytes"))).head()
    assert(nul.isNullAt(0), "null payload must yield a null feature struct")
  }

  test("audio/video stubs are deterministic and batch-shaped") {
    val t = TestFixtures.baseTable
    val df = t.scan().limit(10)
      .withColumn("audio", MultiModal.audioFeaturesStub(col("bytes")))
      .withColumn("frames", MultiModal.videoFrameSigsStub(col("bytes"), lit(4)))
    val a = df.select("image_id", "audio", "frames").collect()
    val b = df.select("image_id", "audio", "frames").collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    a.foreach(r => assert(r.getSeq[Long](2).length == 4))
    // posexplode of frame signatures: the downstream per-frame row shape.
    val frames = df.select(col("image_id"), posexplode(col("frames"))).count()
    assert(frames == 40)
  }

  test("streaming micro-batch append commits snapshots; windowed stats aggregate by event time") {
    // Ingest: stream the image fixture into a fresh table via AvailableNow.
    val work = TestFixtures.workRoot.resolve("stream-ingest")
    val srcDir = work.resolve("src").toString
    graft.images.ImageGen.df(spark, 60, seed = 7L, partitions = 3)
      .write.parquet(srcDir)
    val t = GraftTable.create(work.resolve("tbl").toString, spark)
    val stream = spark.readStream.schema(t.schema).parquet(srcDir)
    val q = StreamingIngest.appendStream(t, stream,
      work.resolve("ckpt").toString, Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(t.scan().count() == 60)
    assert(t.meta.snapshots.nonEmpty)
    assert(t.currentSnapshot.operation == "append")

    // Windowed stats over the driver events table via a bounded file stream
    // (file source needs a directory, so stage the parquet into one).
    val evDir = "/root/testdata/sf0.001"
    val evStage = work.resolve("events-src")
    java.nio.file.Files.createDirectories(evStage)
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$evDir/events.parquet"),
      evStage.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val evStream = spark.readStream
      .schema(spark.read.parquet(s"$evDir/events.parquet").schema)
      .parquet(evStage.toString)
      .withColumn("ts", col("ts").cast("timestamp")) // parquet NTZ -> event time
    val agg = StreamingIngest.windowedEventStats(evStream, "1 hour", "1 hour")
    val q2 = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ev_stats")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val got = spark.sql("select count(*) from ev_stats").collect().head.getLong(0)
    val want = spark.read.parquet(s"$evDir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type")).count().count()
    assert(got == want, s"windowed stream rows $got != batch equivalent $want")
  }
}
