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
}
