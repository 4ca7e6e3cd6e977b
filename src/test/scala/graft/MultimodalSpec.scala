package graft

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{MediaFeatures, MediaRow}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("readMediaDir ingests raw files via binaryFile; glob prunes; blobs feed blobMeta") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_dir")
    val img = Array[Byte](-1, -40, -1, -32, 1, 2, 3) // jpeg-ish magic + payload
    val wav = "RIFFxxxxWAVE".getBytes("UTF-8")
    java.nio.file.Files.write(dir.resolve("a.jpg"), img)
    java.nio.file.Files.write(dir.resolve("b.wav"), wav)
    java.nio.file.Files.write(dir.resolve("notes.txt"), "skip me".getBytes("UTF-8"))

    val all = MultimodalOps.readMediaDir(spark, dir.toString)
    assert(all.count() == 3)
    // glob narrows to images without reading the rest
    val jpgs = MultimodalOps.readMediaDir(spark, dir.toString, Some("*.jpg"))
    val row = jpgs.select("path", "n_bytes", "blob").collect()
    assert(row.length == 1 && row(0).getString(0).endsWith("a.jpg"))
    assert(row(0).getLong(1) == img.length)
    assert(row(0).getAs[Array[Byte]](2).toSeq == img.toSeq)
    // the ingested blob column drives the standard metadata pass
    val meta = MultimodalOps.blobMeta(jpgs, "media_id", "blob")
      .select("n_bytes", "digest").collect()
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(img).map("%02x".format(_)).mkString
    assert(meta.length == 1 && meta(0).getLong(0) == img.length &&
      meta(0).getString(1) == expectedMd5)
  }

  test("ImageIoCodec decodes real PNG/JPEG bytes off the binaryFile ingestion path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_real_images")
    def imageBytes(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }
    // REAL image files, written by the JDK's own encoders
    java.nio.file.Files.write(dir.resolve("red.png"),
      imageBytes(20, 10, 0xff0000, "png"))
    java.nio.file.Files.write(dir.resolve("green.jpg"),
      imageBytes(8, 12, 0x00ff00, "jpg"))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "skip".getBytes("UTF-8"))

    val media = MultimodalOps.readMediaDir(spark, dir.toString, Some("*.{png,jpg}"))
      .select(col("media_id"), lit("image").as("kind"), col("blob"))
      .as(Encoders.product[MediaRow])
    val feats = MultimodalOps.decodeFeatures(spark, media, MultimodalOps.ImageIoCodec)
      .collect()
    assert(feats.map(f => (f.width, f.height)).toSet == Set((20, 10), (8, 12)))
    // solid red decodes to integer BT.601 luma (77*255)>>8 = 76 exactly;
    // the lossy JPEG's solid green comes back within codec tolerance of
    // (150*255)>>8 = 149
    val byDims = feats.map(f => (f.width, f.height) -> f.mean_intensity).toMap
    assert(byDims((20, 10)) == 76.0)
    assert(math.abs(byDims((8, 12)) - 149.0) <= 2.0)

    // header-only metadata: correct format + dims without a pixel decode
    val meta = MultimodalOps.imageMeta(spark, media).collect()
    assert(meta.map(m => (m.format, m.width, m.height)).toSet ==
      Set(("png", 20, 10), ("jpeg", 8, 12)))

    // corrupt bytes surface the failing media_id instead of a bare NPE
    val bad = spark.createDataset(Seq(
      MediaRow(99L, "image", "not an image".getBytes("UTF-8"))))(Encoders.product[MediaRow])
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.decodeFeatures(spark, bad, MultimodalOps.ImageIoCodec).collect()
    }
    assert(e.getMessage.contains("99") ||
      Option(e.getCause).exists(_.getMessage.contains("99")))
  }

  test("decodeFeatures preserves ids/kinds, computes deterministic features") {
    val rows = Seq(
      MediaRow(1L, "image", "hello pixels".getBytes("UTF-8")),
      MediaRow(2L, "video", "some video bytes here".getBytes("UTF-8")),
      MediaRow(3L, "audio", Array.emptyByteArray))
    val ds = spark.createDataset(rows)(Encoders.product[MediaRow]).repartition(2)
    val out = MultimodalOps.decodeFeatures(spark, ds).collect().sortBy(_.media_id)

    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.kind).toSeq == Seq("image", "video", "audio"))
    assert(out(0).n_bytes == 12L)
    assert(out.forall(f => f.width >= 16 && f.height >= 16))
    assert(out(1).n_frames >= 1 && out(0).n_frames == 1)
    assert(out(2).mean_intensity == 0.0) // empty blob guarded

    // determinism: same input -> identical features
    val again = MultimodalOps.decodeFeatures(spark, ds).collect().sortBy(_.media_id)
    assert(out.toSeq == again.toSeq)
  }

  test("decode runs distributed per partition (no driver collect)") {
    val ds = spark.range(100)
      .select(col("id").as("media_id"), lit("image").as("kind"),
        encode(concat(lit("blob"), col("id")), "UTF-8").as("blob"))
      .as(Encoders.product[MediaRow]).repartition(8)
    val out: Array[MediaFeatures] = MultimodalOps.decodeFeatures(spark, ds).collect()
    assert(out.length == 100)
    assert(out.map(_.media_id).toSet == (0L until 100L).toSet)
  }

  test("resizeImages emits target dims with bounded payload, distributed") {
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "image", Array.tabulate[Byte](4096)(_.toByte)),
      MediaRow(2L, "image", Array.tabulate[Byte](100)(_.toByte))))(Encoders.product[MediaRow])
      .repartition(2)
    val out = MultimodalOps.resizeImages(spark, ds, 64, 64)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(out.forall(r => r.width == 64 && r.height == 64))
    assert(out.forall(_.blob.length <= 64 * 64 / 64))
    // deterministic
    val again = MultimodalOps.resizeImages(spark, ds, 64, 64)
      .collect().sortBy(_.media_id)
    assert(out.zip(again).forall { case (a, b) => a.blob.sameElements(b.blob) })
  }

  test("sampleFrames is one-to-many with stride, only for decoded frame count") {
    val video = MediaRow(7L, "video", "some video payload bytes".getBytes("UTF-8"))
    val nFrames = MultimodalOps.FakeCodec.decode(video).n_frames
    val ds = spark.createDataset(Seq(video))(Encoders.product[MediaRow])
    val frames = MultimodalOps.sampleFrames(spark, ds, everyNth = 10).collect()
    assert(frames.length == (nFrames + 9) / 10)
    assert(frames.map(_.frame_idx).toSeq == (0 until nFrames by 10).toSeq)
    assert(frames.forall(_.media_id == 7L))
  }

  test("blobMeta byte length counts bytes, not chars (utf-8)") {
    val df = Seq((1L, "héllo")).toDF("id", "t")
    val meta = MultimodalOps.blobMeta(
      MultimodalOps.withBlob(df, "t"), "id", "blob").head()
    assert(meta.getLong(1) == 6L) // é is 2 bytes
  }

  test("pHash64 matches a naive reference, is edit-stable, and handles edges") {
    // independent reference: same chunk-mean-vs-global-mean definition,
    // written the slow obvious way
    def ref(blob: Array[Byte]): Long = {
      val n = blob.length
      if (n == 0) return 0L
      val tot = blob.map(_ & 0xff).map(_.toLong).sum
      (0 until 64).foldLeft(0L) { (acc, j) =>
        val lo = j * n / 64; val hi = (j + 1) * n / 64
        val cs = (lo until hi).map(i => (blob(i) & 0xff).toLong).sum
        if (hi > lo && cs * n > tot * (hi - lo)) acc | (1L << j) else acc
      }
    }
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val blob = Array.fill(1 + rnd.nextInt(500))(rnd.nextInt(256).toByte)
      assert(MultimodalOps.pHash64(blob) == ref(blob))
    }
    // edge cases: empty -> 0; shorter-than-64 blobs still defined
    assert(MultimodalOps.pHash64(Array.emptyByteArray) == 0L)
    val tiny = Array[Byte](1, 2, 3)
    assert(MultimodalOps.pHash64(tiny) == ref(tiny))
    // identical content -> identical hash (the dedup invariant)
    val base = Array.fill(256)(rnd.nextInt(256).toByte)
    assert(MultimodalOps.pHash64(base.clone()) == MultimodalOps.pHash64(base))
    // distributed via the batched plumbing matches the local function
    val rows = Seq(
      MediaRow(1L, "image", base),
      MediaRow(2L, "image", tiny))
    val ds = spark.createDataset(rows)(Encoders.product[MediaRow])
    val hashes = MultimodalOps.perceptualHashes(spark, ds)
      .collect().map(h => h.media_id -> h.phash).toMap
    assert(hashes == Map(1L -> ref(base), 2L -> ref(tiny)))
  }

  /** JDK-encoded WAV bytes: a sine at `freq` Hz, `amp` amplitude,
    * encoded through AudioSystem.write — so the decode test exercises a
    * REAL container produced by an independent encoder, not our own
    * byte layout.
    */
  private def sineWav(rate: Int, seconds: Double, freq: Double, amp: Double,
      channels: Int, bits: Int, signed: Boolean): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val nFrames = (rate * seconds).toInt
    val bytesPerSample = bits / 8
    val data = new Array[Byte](nFrames * channels * bytesPerSample)
    var f = 0
    while (f < nFrames) {
      val v = amp * math.sin(2 * math.Pi * freq * f / rate)
      var c = 0
      while (c < channels) {
        val off = (f * channels + c) * bytesPerSample
        if (bits == 16) {
          val s = math.round(v * 32767).toInt
          data(off) = (s & 0xff).toByte // little-endian
          data(off + 1) = ((s >> 8) & 0xff).toByte
        } else {
          val s = math.round(v * 127).toInt
          data(off) = (if (signed) s else s + 128).toByte
        }
        c += 1
      }
      f += 1
    }
    val fmt = new AudioFormat(rate.toFloat, bits, channels, signed, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavPcmCodec decodes real WAV bytes: stream facts + amplitude stats") {
    // mono 16-bit: a 0.5-amplitude sine has rms amp/sqrt(2), peak ~ amp
    val mono = sineWav(8000, 1.0, 440.0, 0.5, channels = 1, bits = 16, signed = true)
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "audio", mono),
      MediaRow(2L, "audio",
        sineWav(16000, 0.25, 440.0, 0.9, channels = 2, bits = 16, signed = true)),
      MediaRow(3L, "audio",
        sineWav(8000, 0.5, 200.0, 0.5, channels = 1, bits = 8, signed = false))))(
      Encoders.product[MediaRow])
    val got = MultimodalOps.audioFeatures(spark, ds)
      .collect().map(a => a.media_id -> a).toMap
    val m = got(1L)
    assert(m.sample_rate == 8000 && m.channels == 1 && m.bits == 16)
    assert(m.n_frames == 8000L && math.abs(m.duration_ms - 1000.0) < 1e-9)
    assert(math.abs(m.rms - 0.5 / math.sqrt(2.0)) < 1e-3, m.rms)
    assert(math.abs(m.peak - 0.5) < 0.01, m.peak)
    val st = got(2L) // stereo/16k: frames = samples / channels
    assert(st.sample_rate == 16000 && st.channels == 2 && st.n_frames == 4000L)
    assert(math.abs(st.duration_ms - 250.0) < 1e-9)
    assert(math.abs(st.rms - 0.9 / math.sqrt(2.0)) < 1e-3, st.rms)
    val u8 = got(3L) // 8-bit unsigned path
    assert(u8.bits == 8 && u8.n_frames == 4000L)
    assert(math.abs(u8.rms - 0.5 / math.sqrt(2.0)) < 0.01, u8.rms)
    // WAV written with headers by the JDK encoder: payload > raw PCM
    assert(m.n_bytes > 16000L)
  }

  test("pcmU8ToWav header is byte-identical to AudioSystem.write") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 1, 7, 1000, 4097); rate <- Seq(8000, 44100)) {
      val pcm = Array.fill(n)(rnd.nextInt(256).toByte)
      val ours = MultimodalOps.pcmU8ToWav(pcm, rate)
      val jdk = MultimodalOps.pcmU8ToWavViaAudioSystem(pcm, rate)
      assert(java.util.Arrays.equals(ours, jdk), s"n=$n rate=$rate")
    }
  }

  test("RIFF fast path agrees with the container facts AudioSystem reads") {
    // The hand-rolled header parse (the scale fast path — AudioSystem's
    // synchronized provider registry serialized mapPartitions threads,
    // 134x wall at the 100x smoke) must report the same stream facts
    // AudioSystem itself reads from identical bytes; the amplitude
    // stats are covered by the closed-form sine checks above, which
    // also travel the fast path now.
    val wavs = Seq(
      sineWav(8000, 0.3, 440.0, 0.5, channels = 1, bits = 8, signed = false),
      sineWav(8000, 0.3, 440.0, 0.7, channels = 1, bits = 16, signed = true),
      sineWav(16000, 0.2, 200.0, 0.4, channels = 2, bits = 16, signed = true),
      MultimodalOps.pcmU8ToWav("hello wav".getBytes("UTF-8"), 8000),
      MultimodalOps.pcmU8ToWav(Array.emptyByteArray, 8000))
    wavs.zipWithIndex.foreach { case (w, i) =>
      val fast = MultimodalOps.WavPcmCodec.decode(i.toLong, w)
      import javax.sound.sampled.AudioSystem
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(w))
      val fmt = ais.getFormat
      val nPcm = ais.readAllBytes().length
      ais.close()
      assert(fast.sample_rate == math.round(fmt.getSampleRate), s"wav $i")
      assert(fast.channels == fmt.getChannels, s"wav $i")
      assert(fast.bits == fmt.getSampleSizeInBits, s"wav $i")
      assert(fast.n_frames ==
        nPcm.toLong / (fmt.getSampleSizeInBits / 8) / fmt.getChannels, s"wav $i")
    }
  }

  test("non-WAV containers fall back to AudioSystem (AIFF, big-endian PCM)") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 16-bit big-endian signed mono sine in an AIFF container
    val rate = 8000
    val n = 2400
    val data = new Array[Byte](n * 2)
    var f = 0
    while (f < n) {
      val s = math.round(0.5 * math.sin(2 * math.Pi * 440.0 * f / rate) * 32767).toInt
      data(2 * f) = ((s >> 8) & 0xff).toByte // big-endian
      data(2 * f + 1) = (s & 0xff).toByte
      f += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, true)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    val a = MultimodalOps.WavPcmCodec.decode(7L, bos.toByteArray)
    assert(a.sample_rate == rate && a.channels == 1 && a.bits == 16)
    assert(a.n_frames == n.toLong)
    assert(math.abs(a.rms - 0.5 / math.sqrt(2.0)) < 1e-3, a.rms)
  }

  test("gifFrames decodes REAL animated-GIF frames: count, stride, dims, luma") {
    import javax.imageio.ImageIO
    import java.awt.image.BufferedImage
    // JDK-encoded 10-frame animated GIF: frame k is a flat gray level
    // g(k) = 20k (grayscale in an 8-bit palette survives GIF exactly),
    // so each sampled frame's BT.601 luma has a closed form
    def gray(k: Int): Int = 20 * k
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    (0 until 10).foreach { k =>
      val img = new BufferedImage(8, 6, BufferedImage.TYPE_INT_RGB)
      val g = gray(k)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, rgb)
      w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    w.endWriteSequence(); w.dispose(); ios.close()
    val rows = spark.createDataset(Seq(MediaRow(5L, "video", bos.toByteArray)))(
      Encoders.product[MultimodalOps.MediaRow])
    val frames = MultimodalOps.gifFrames(spark, rows, everyNth = 3)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 3, 6, 9))
    frames.foreach { f =>
      assert(f.n_frames == 10 && f.width == 8 && f.height == 6)
      // luma of flat gray g is (77g + 150g + 29g) >> 8 = g (256g >> 8)
      assert(f.mean_luma == gray(f.frame_idx).toDouble, f)
    }
  }

  test("aviFrames decodes REAL MJPEG/AVI video: count, stride, dims, luma parity") {
    import javax.imageio.ImageIO
    import java.awt.image.BufferedImage
    // 7 JPEG frames, 32x24, frame k = a left-right gradient shifted by
    // k (JPEG is lossy, so the parity check is against ImageIO's OWN
    // decode of the identical bytes, not a closed form)
    def jpegFrame(k: Int): Array[Byte] = {
      val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32) {
        val g = (8 * x + 10 * k) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val jpegs = (0 until 7).map(jpegFrame)
    val avi = MultimodalOps.jpegFramesToAvi(jpegs, width = 32, height = 24)
    // the container round-trips: the chunk index finds all 7 frames and
    // each chunk's bytes are EXACTLY the encoded JPEG
    val chunks = MultimodalOps.AviMjpegCodec.frameChunks(1L, avi)
    assert(chunks.length == 7)
    chunks.zip(jpegs).foreach { case ((off, len), j) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len), j))
    }
    val rows = spark.createDataset(Seq(MediaRow(11L, "video", avi)))(
      Encoders.product[MediaRow])
    val frames = MultimodalOps.aviFrames(spark, rows, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
    def lumaOf(jpeg: Array[Byte]): Double = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      var s = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        s += (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
          29 * (rgb & 0xff)) >> 8
      }
      s.toDouble / (img.getWidth.toLong * img.getHeight)
    }
    frames.foreach { f =>
      assert(f.n_frames == 7 && f.width == 32 && f.height == 24)
      assert(f.mean_luma == lumaOf(jpegs(f.frame_idx)),
        s"frame ${f.frame_idx} luma diverged from a direct decode")
    }
  }

  test("aviFrames decodes uncompressed DIB frames by exact byte math") {
    // 5x3 -> stride 16 (15 pixel bytes + 1 pad): a NON-flat pattern so
    // a stride/channel-order mistake cannot cancel out in the mean.
    // Frame bytes are bottom-up BGR; luma per pixel is the exact
    // (77R + 150G + 29B) >> 8 integer
    val (w, h) = (5, 3)
    val stride = ((w * 3 + 3) / 4) * 4
    def frame(seed: Int): Array[Byte] = {
      val f = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        f(y * stride + x * 3 + c) = ((seed + 31 * y + 7 * x + 13 * c) % 256).toByte
      f
    }
    val frames = Seq(frame(0), frame(100))
    def expectedLuma(f: Array[Byte]): Double = {
      var s = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val o = y * stride + x * 3
        s += (77 * (f(o + 2) & 0xff) + 150 * (f(o + 1) & 0xff) +
          29 * (f(o) & 0xff)) >> 8
      }
      s.toDouble / (w * h)
    }
    val avi = MultimodalOps.dibFramesToAvi(frames, w, h)
    val rows = spark.createDataset(Seq(MediaRow(21L, "video", avi)))(
      Encoders.product[MediaRow])
    val out = MultimodalOps.aviFrames(spark, rows, everyNth = 1)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 1))
    out.foreach { fr =>
      assert(fr.n_frames == 2 && fr.width == w && fr.height == h)
      assert(fr.mean_luma == expectedLuma(frames(fr.frame_idx)), fr)
    }
    // the fingerprint follows the frame-mean ordering exactly
    val (nBits, sig) = MultimodalOps.videoFingerprint(21L, avi)
    val expSig = if (expectedLuma(frames(0)) > expectedLuma(frames(1))) 1L else 0L
    assert(nBits == 1 && sig == expSig)
    // flat-gray convenience: luma == gray exactly, bits are the
    // greater-than-next fold
    val g = MultimodalOps.grayFramesToAviDib(Seq(200, 10, 10, 55), 8, 6)
    val lum = MultimodalOps.aviFrames(spark, spark.createDataset(
        Seq(MediaRow(22L, "video", g)))(Encoders.product[MediaRow]), 1)
      .collect().sortBy(_.frame_idx).map(_.mean_luma).toSeq
    assert(lum == Seq(200.0, 10.0, 10.0, 55.0))
    assert(MultimodalOps.videoFingerprint(22L, g) == ((3, 1L)))
  }

  test("AVI walk rejects wrapped chunk sizes and non-AVI bytes") {
    val b = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(16); b.put("AVI ".getBytes)
    b.put("00dc".getBytes); b.putInt(-1); b.putInt(0)
    val e = intercept[IllegalArgumentException] {
      MultimodalOps.AviMjpegCodec.frameChunks(3L, b.array())
    }
    assert(e.getMessage.contains("malformed RIFF chunk size") &&
      e.getMessage.contains("3"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      MultimodalOps.AviMjpegCodec.frameChunks(4L, "RIFFxxxxWAVE".getBytes)
    }
    assert(e2.getMessage.contains("not a RIFF/AVI") &&
      e2.getMessage.contains("4"), e2.getMessage)
  }

  test("audioFingerprint: known bits, uniform-gain invariance, short-clip zero") {
    // 3 frames of 4 samples with energies 40 > 20 < 60: bits (e0>e1)=1,
    // (e1>e2)=0 -> sig = 0b01 = 1 with 2 bits
    def frame(dev: Int) = Array.fill(4)((128 + dev).toByte)
    val samples = frame(10) ++ frame(5) ++ frame(15)
    assert(MultimodalOps.audioFingerprint(samples, frame = 4) == (2, 1L))
    // uniform gain (x2 around the 128 midpoint) scales every frame
    // energy equally -> identical signature
    val louder = samples.map(b => (128 + 2 * ((b & 0xff) - 128)).toByte)
    assert(MultimodalOps.audioFingerprint(louder, frame = 4) == (2, 1L))
    // fewer than two full frames -> no comparable pair -> (0, 0)
    assert(MultimodalOps.audioFingerprint(frame(10), frame = 4) == (0, 0L))
    assert(MultimodalOps.audioFingerprint(Array.emptyByteArray) == (0, 0L))
    // roundtrip: the WAV-encoded form recovers the same samples, so the
    // fingerprint survives the container
    val viaWav = MultimodalOps.WavPcmCodec.pcmU8Data(
      MultimodalOps.pcmU8ToWav(samples, 8000))
    assert(viaWav.toSeq == samples.toSeq)
  }

  test("RIFF walk rejects a wrapped (negative) chunk size instead of walking backward") {
    // valid RIFF/WAVE header, then a chunk whose size field is 0xFFFFFFFF
    // (-1 as Int) — an unguarded walk would decrement its offset forever
    val b = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(16); b.put("WAVE".getBytes)
    b.put("junk".getBytes); b.putInt(-1); b.putInt(0)
    val blob = b.array()
    val e1 = intercept[IllegalArgumentException] {
      MultimodalOps.WavPcmCodec.pcmU8Data(blob)
    }
    assert(e1.getMessage.contains("malformed RIFF chunk size"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      MultimodalOps.WavPcmCodec.decode(7L, blob)
    }
    assert(e2.getMessage.contains("malformed RIFF chunk size") &&
      e2.getMessage.contains("7"), e2.getMessage)
  }

  test("WavPcmCodec rejects non-audio bytes with the media_id in the error") {
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.audioFeatures(spark, spark.createDataset(Seq(
        MediaRow(99L, "audio", Array[Byte](1, 2, 3, 4))))(
        Encoders.product[MediaRow])).collect()
    }
    val msg = String.valueOf(e.getCause).concat(String.valueOf(e.getMessage))
    assert(msg.contains("99") || e.toString.contains("99"), e.toString)
  }
}
